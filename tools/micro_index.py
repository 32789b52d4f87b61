"""Decompose the shortlist-index query cost on TPU (scan-amortized).

The round-2 profile showed index_closest ≈ 90 ms/step at B=2048 nearly flat
in query count (200 vs 400 queries) — fixed-cost bound.  This tool times the
stages separately to find it:

    coarse          coarse_nearest_pallas only
    +cand           + faces gather  cand[nv]            [B,P,K]
    +tri            + cand_tri row gather               [B,P,K*9]
    full            index_closest (cascade + winner)
    dense           surface_distances_pallas (no index) for comparison
    onehot          cand_tri gather as one-hot f32 MXU matmul

Usage: B=2048 P=400 python tools/micro_index.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702
import time

import jax
import jax.numpy as jnp
import numpy as np

from icp_proposal_tpu.apps.femur import load_femur_data
from icp_proposal_tpu.sampling.context import build_target_context

B = int(os.environ.get("B", "2048"))
P = int(os.environ.get("P", "400"))
N = int(os.environ.get("N", "50"))

data = load_femur_data(100)
ctx = build_target_context(data.target, data.target_boundary_mask, build_index=True)
index = ctx.index
assert index is not None
pts = np.asarray(data.target.points)
lo, hi = pts.min(0), pts.max(0)
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.uniform(lo, hi, size=(B, P, 3)).astype(np.float32))

cand = jnp.asarray(index.cand)
cand_tri = jnp.asarray(index.cand_tri)
tri = jnp.asarray(ctx.tri)
K = index.k


def scan_time(name, f):
    def body(c, _):
        return f(c), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N)[0])
    out = run(q0)
    float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    out = run(q0)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:14s} {dt:8.3f} ms/iter  (B={B}, P={P})", flush=True)
    return dt


def perturb(q, x):
    # tiny dependence on the previous output so the scan can't hoist
    return q + 1e-12 * x


from icp_proposal_tpu.ops.closest_point_pallas import (  # noqa: E402
    coarse_nearest_pallas,
    surface_distances_pallas,
)
from icp_proposal_tpu.ops.surface_index import index_closest  # noqa: E402


def f_coarse(q):
    nv = jax.vmap(lambda qi: coarse_nearest_pallas(qi, jnp.asarray(index.points)))(q)
    return perturb(q, jnp.sum(nv).astype(jnp.float32))


def f_cand(q):
    nv = jax.vmap(lambda qi: coarse_nearest_pallas(qi, jnp.asarray(index.points)))(q)
    faces = cand[nv]  # [B,P,K]
    return perturb(q, jnp.sum(faces).astype(jnp.float32))


def f_tri(q):
    nv = jax.vmap(lambda qi: coarse_nearest_pallas(qi, jnp.asarray(index.points)))(q)
    tk = cand_tri[nv]  # [B,P,K*9]
    return perturb(q, jnp.sum(tk))


def f_full(q):
    cp, d2, fi = jax.vmap(lambda qi: index_closest(index, qi))(q)
    return perturb(q, jnp.sum(d2))


def f_dense(q):
    d2, fi = jax.vmap(lambda qi: surface_distances_pallas(qi, tri))(q)
    return perturb(q, jnp.sum(d2))


def f_onehot(q):
    nv = jax.vmap(lambda qi: coarse_nearest_pallas(qi, jnp.asarray(index.points)))(q)
    v = cand_tri.shape[0]
    oh = (nv[..., None] == jnp.arange(v)).astype(jnp.float32)  # [B,P,V]
    tk = jax.lax.dot_general(
        oh, cand_tri, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B,P,K*9]
    return perturb(q, jnp.sum(tk))


scan_time("coarse", f_coarse)
scan_time("+cand", f_cand)
scan_time("+tri", f_tri)
scan_time("onehot-tri", f_onehot)
scan_time("full", f_full)
scan_time("dense", f_dense)


# finer stages of the new index_closest path
from icp_proposal_tpu.ops.closest_point_pallas import refine_shortlist_pallas  # noqa: E402
from icp_proposal_tpu.ops.closest_point import closest_point_on_triangle  # noqa: E402
from icp_proposal_tpu.ops.surface_index import _coarse_ids  # noqa: E402


def f_refine(q):
    def one(qi):
        nv = _coarse_ids(index, qi)
        faces = cand[nv]
        trik = cand_tri[nv]
        fidx, wtri = refine_shortlist_pallas(qi, trik, faces)
        return fidx
    fi = jax.vmap(one)(q)
    return perturb(q, jnp.sum(fi).astype(jnp.float32))


if os.environ.get("FINE", "0") == "1":
    scan_time("refine(fidx)", f_refine)
