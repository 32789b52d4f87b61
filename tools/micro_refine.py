"""Refine-kernel variants A/B on TPU (the measured hot spot of index_closest:
~47 of 73 ms at B=2048, P=400 — tools/micro_index.py FINE=1).

NOTE: the packed variant SHIPPED as the default `_refine_call` kernel
after this harness measured it (bit-identical, 65.3 → 57.6 ms/iter), so
`base` now times the packed kernel too; the local copies below preserve
the measured alternatives.

Variants:
    base     shipped refine_shortlist_pallas (now lane-paired)
    nodiv    same tiles, divides replaced by multiplies (timing-only, wrong
             math) — isolates the cost of the 5 VPU divides in the cascade
    packed   lane-paired: two queries' K-candidate rows side by side →
             [TP/2, 2K] = [64, 128] full-width tiles

Usage: B=2048 P=400 python tools/micro_refine.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_proposal_tpu.apps.femur import load_femur_data
from icp_proposal_tpu.sampling.context import build_target_context
from icp_proposal_tpu.ops.closest_point_pallas import (
    TP, _FAR, _tile_dist2, _refine_call, RGB,
)
from icp_proposal_tpu.ops.surface_index import _coarse_ids

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
K = index.k


# --------------------------------------------------------------------------
# packed variant: [64, 2K] tiles
# --------------------------------------------------------------------------

def _make_refine_packed_kernel(k: int, gb: int):
    h = TP // 2

    def kernel(q_ref, trik_ref, faces_ref, fidx_ref, wtri_ref):
        for g in range(gb):
            t = trik_ref[g]  # [TP, 9k]
            fc = faces_ref[g]  # [TP, k]
            q = q_ref[g]  # [TP, 3]

            def comp(i):
                return jnp.concatenate(
                    [t[:h, i * k:(i + 1) * k], t[h:, i * k:(i + 1) * k]],
                    axis=1)  # [h, 2k]

            corners = tuple(comp(i) for i in range(9))
            qc = tuple(
                jnp.concatenate([
                    jnp.broadcast_to(q[:h, i][:, None], (h, k)),
                    jnp.broadcast_to(q[h:, i][:, None], (h, k)),
                ], axis=1) for i in range(3))
            d2 = _tile_dist2(qc, corners[0:3], corners[3:6], corners[6:9])

            lane = jax.lax.broadcasted_iota(jnp.int32, (h, k), 1)
            for half, rows in ((0, slice(0, h)), (1, slice(h, TP))):
                d2h = d2[:, half * k:(half + 1) * k]  # [h, k]
                fh = fc[rows]  # [h, k]
                best = jnp.min(d2h, axis=1, keepdims=True)
                fid_tied = jnp.where(d2h == best, fh, jnp.int32(2**30))
                fmin = jnp.min(fid_tied, axis=1, keepdims=True)
                kidx = jnp.min(
                    jnp.where(fid_tied == fmin, lane, jnp.int32(2**30)),
                    axis=1, keepdims=True)
                onehot = lane == kidx
                fidx_ref[g, 0, rows, :] = jnp.min(
                    jnp.where(onehot, fh, jnp.int32(2**30)),
                    axis=1, keepdims=True)
                sel = onehot.astype(jnp.float32)
                for i in range(9):
                    ch = corners[i][:, half * k:(half + 1) * k]
                    wtri_ref[g, 0, rows, i:i + 1] = jnp.sum(
                        ch * sel, axis=1, keepdims=True)

    return kernel


def refine_packed_call(queries, trik, faces, k: int, interpret=False):
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    gb = min(RGB, bsz)
    bp = -(-bsz // gb) * gb
    qpad = jnp.pad(queries, ((0, bp - bsz), (0, pp - p), (0, 0)))
    tpad = jnp.pad(trik, ((0, bp - bsz), (0, pp - p), (0, 0)),
                   constant_values=_FAR)
    fpad = jnp.pad(faces, ((0, bp - bsz), (0, pp - p), (0, 0)))
    fidx, wtri = pl.pallas_call(
        _make_refine_packed_kernel(k, gb),
        grid=(bp // gb, pp // TP),
        in_specs=[
            pl.BlockSpec((gb, TP, 3), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, TP, 9 * k), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, TP, k), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1, TP, 9), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, pp // TP, TP, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, pp // TP, TP, 9), jnp.float32),
        ],
        interpret=interpret,
    )(qpad, tpad, fpad)
    return (
        fidx.reshape(bp, pp)[:bsz, :p],
        wtri.reshape(bp, pp, 9)[:bsz, :p],
    )


# --------------------------------------------------------------------------
# nodiv variant: timing-only — divides → multiplies inside the cascade
# --------------------------------------------------------------------------

def _tile_dist2_nodiv(q, a, b, c):
    import icp_proposal_tpu.ops.closest_point_pallas as cpp
    real = cpp._safe_div
    cpp._safe_div = lambda num, den: num * den  # WRONG math, same op mix
    try:
        return cpp._tile_dist2(q, a, b, c)
    finally:
        cpp._safe_div = real


def _make_refine_nodiv_kernel(k: int, gb: int):
    def kernel(q_ref, trik_ref, faces_ref, fidx_ref, wtri_ref):
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (TP, k), 1)
        for g in range(gb):
            q = tuple(q_ref[g, :, i][:, None] for i in range(3))

            def comp(i):
                return trik_ref[g, :, i * k:(i + 1) * k]

            corners = tuple(comp(i) for i in range(9))
            d2 = _tile_dist2_nodiv(q, corners[0:3], corners[3:6], corners[6:9])
            best = jnp.min(d2, axis=1, keepdims=True)
            fid_tied = jnp.where(d2 == best, faces_ref[g, :, :], jnp.int32(2**30))
            fmin = jnp.min(fid_tied, axis=1, keepdims=True)
            kidx = jnp.min(jnp.where(fid_tied == fmin, lane0, jnp.int32(2**30)),
                           axis=1, keepdims=True)
            onehot = lane0 == kidx
            fidx_ref[g, 0, :, :] = jnp.min(
                jnp.where(onehot, faces_ref[g, :, :], jnp.int32(2**30)),
                axis=1, keepdims=True)
            sel = onehot.astype(jnp.float32)
            for i in range(9):
                wtri_ref[g, 0, :, i:i + 1] = jnp.sum(
                    corners[i] * sel, axis=1, keepdims=True)

    return kernel


def refine_nodiv_call(queries, trik, faces, k: int, interpret=False):
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    gb = min(RGB, bsz)
    bp = -(-bsz // gb) * gb
    qpad = jnp.pad(queries, ((0, bp - bsz), (0, pp - p), (0, 0)))
    tpad = jnp.pad(trik, ((0, bp - bsz), (0, pp - p), (0, 0)),
                   constant_values=_FAR)
    fpad = jnp.pad(faces, ((0, bp - bsz), (0, pp - p), (0, 0)))
    fidx, _ = pl.pallas_call(
        _make_refine_nodiv_kernel(k, gb),
        grid=(bp // gb, pp // TP),
        in_specs=[
            pl.BlockSpec((gb, TP, 3), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, TP, 9 * k), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, TP, k), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1, TP, 9), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, pp // TP, TP, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, pp // TP, TP, 9), jnp.float32),
        ],
        interpret=interpret,
    )(qpad, tpad, fpad)
    return fidx.reshape(bp, pp)[:bsz, :p]


# --------------------------------------------------------------------------


def scan_time(name, f):
    def body(c, _):
        return f(c), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N)[0])
    out = run(q0)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(q0)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:14s} {dt:8.3f} ms/iter  (B={B}, P={P})", flush=True)
    return dt


def perturb(q, x):
    return q + 1e-12 * x


def gathered(q):
    nv = jax.vmap(lambda qi: _coarse_ids(index, qi))(q)
    return cand[nv], cand_tri[nv]


def f_base(q):
    faces, trik = gathered(q)
    fidx, wtri = _refine_call(q, trik, faces, K)
    return perturb(q, jnp.sum(wtri))


def f_nodiv(q):
    faces, trik = gathered(q)
    fidx = refine_nodiv_call(q, trik, faces, K)
    return perturb(q, jnp.sum(fidx).astype(jnp.float32))


def f_packed(q):
    faces, trik = gathered(q)
    fidx, wtri = refine_packed_call(q, trik, faces, K)
    return perturb(q, jnp.sum(wtri))


if __name__ == "__main__":
    interpret = jax.default_backend() != "tpu"
    # correctness: packed must reproduce base exactly (same math, same ties)
    qs = q0[:4]
    faces, trik = jax.jit(gathered)(qs)
    fb, wb = _refine_call(qs, trik, faces, K, interpret=interpret)
    fp, wp = refine_packed_call(qs, trik, faces, K, interpret=interpret)
    print("packed == base:",
          bool(jnp.all(fb == fp)), bool(jnp.all(wb == wp)), flush=True)
    scan_time("base", f_base)
    scan_time("nodiv", f_nodiv)
    scan_time("packed", f_packed)
