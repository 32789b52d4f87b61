"""A/B the coarse shortlist kernels on TPU: VPU subtractive vs MXU dot form.

Scan-amortized (see micro_index.py).  Usage: B=2048 P=400 python tools/micro_coarse.py
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
points = jnp.asarray(index.points)


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
    return q + 1e-12 * x


from icp_proposal_tpu.ops.closest_point_pallas import (  # noqa: E402
    coarse_nearest_mxu,
    nearest_vertices_pallas,
)
from icp_proposal_tpu.ops.surface_index import index_closest  # noqa: E402


def f_vpu(q):
    nv = jax.vmap(lambda qi: nearest_vertices_pallas(qi, points))(q)
    return perturb(q, jnp.sum(nv).astype(jnp.float32))


def f_mxu(q):
    nv = jax.vmap(lambda qi: coarse_nearest_mxu(qi, points))(q)
    return perturb(q, jnp.sum(nv).astype(jnp.float32))


def f_full(q):
    cp, d2, fi = jax.vmap(lambda qi: index_closest(index, qi))(q)
    return perturb(q, jnp.sum(d2))


def main():
    # anchor agreement on femur-scale coordinates (cancellation check)
    ids_v = jax.jit(jax.vmap(lambda qi: nearest_vertices_pallas(qi, points)))(q0[:8])
    ids_m = jax.jit(jax.vmap(lambda qi: coarse_nearest_mxu(qi, points)))(q0[:8])
    agree = float(jnp.mean((ids_v == ids_m).astype(jnp.float32)))
    d2v = jnp.sum((q0[:8, :, None] - points[None, None]) ** 2, -1)
    tv = jnp.take_along_axis(d2v, ids_v[..., None], 2)[..., 0]
    tm = jnp.take_along_axis(d2v, ids_m[..., None], 2)[..., 0]
    print(f"anchor id agreement: {agree:.6f}; max true-d2 gap: "
          f"{float(jnp.max(jnp.abs(tv - tm))):.3e} mm^2", flush=True)

    scan_time("coarse-vpu", f_vpu)
    scan_time("coarse-mxu", f_mxu)
    scan_time("full-index", f_full)


if __name__ == "__main__":
    main()
