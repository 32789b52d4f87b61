"""Pallas TPU kernel for batched point→surface distance queries.

The hot op of the whole framework (SURVEY §3.1: closest-point queries are
2 of the 4 per-step kernels).  The jnp brute force materializes a [P, F]
(or [B, P, F] under vmap) distance buffer before the min-reduction; this
kernel streams triangle tiles through VMEM with a running (min, argmin)
accumulator, so HBM traffic is O(P + F) per query batch instead of O(P·F).

Layout:
    queries  [B, Pp, 3]  f32, Pp padded to a multiple of the P-tile (8)
    tri_pack [9, Fp]     f32 SoA (ax ay az bx by bz cx cy cz), Fp padded to
                         a multiple of 128 with far-away dummy triangles
    grid     (B, Pp/TP, Fp/TF); the F axis is the minor (sequential) grid
             axis, revisiting the [1, TP] output blocks with a predicated
             min/argmin update.

The point→triangle math is the same branchless Ericson region cascade as
``closest_point.py``, in component (SoA) form on [TP, TF] tiles — pure VPU.
Exposed through ``surface_distances_tpu`` with a ``custom_vmap`` rule so the
chain samplers pick up the kernel transparently under ``vmap``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 128  # query tile (sublanes)
TF = 128  # triangle tile (lanes)
_FAR = 1e9  # padding triangle coordinate


def _culling_enabled() -> bool:
    import os

    return os.environ.get("ICP_TPU_CULLING") == "1"


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _where3(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _safe_div(num, den):
    return num / jnp.where(jnp.abs(den) < 1e-30, 1.0, den)


def _tile_dist2(q, a, b, c):
    """q, a, b, c: component triples broadcastable to [TP, TF] → d2 [TP, TF].

    Branchless Ericson point-in-triangle region cascade (see
    ``closest_point.closest_point_on_triangle``)."""
    ab = _sub3(b, a)
    ac = _sub3(c, a)
    ap = _sub3(q, a)
    bp = _sub3(q, b)
    cp = _sub3(q, c)

    d1 = _dot3(ab, ap)
    d2_ = _dot3(ac, ap)
    d3 = _dot3(ab, bp)
    d4 = _dot3(ac, bp)
    d5 = _dot3(ab, cp)
    d6 = _dot3(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    denom = _safe_div(1.0, va + vb + vc)
    v = vb * denom
    w = vc * denom

    in_bc = (va <= 0.0) & ((d4 - d3) >= 0.0) & ((d5 - d6) >= 0.0)
    w_bc = _safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    v = jnp.where(in_bc, 1.0 - w_bc, v)
    w = jnp.where(in_bc, w_bc, w)

    in_ac = (vb <= 0.0) & (d2_ >= 0.0) & (d6 <= 0.0)
    w_ac = _safe_div(d2_, d2_ - d6)
    v = jnp.where(in_ac, 0.0, v)
    w = jnp.where(in_ac, w_ac, w)

    in_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    v_ab = _safe_div(d1, d1 - d3)
    v = jnp.where(in_ab, v_ab, v)
    w = jnp.where(in_ab, 0.0, w)

    in_c = (d6 >= 0.0) & (d5 <= d6)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)

    in_b = (d3 >= 0.0) & (d4 <= d3)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)

    in_a = (d1 <= 0.0) & (d2_ <= 0.0)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    v = jnp.clip(v, 0.0, 1.0)
    w = jnp.clip(w, 0.0, 1.0)
    s = v + w
    scale = jnp.where(s > 1.0, 1.0 / jnp.maximum(s, 1e-30), 1.0)
    v = v * scale
    w = w * scale

    diff = tuple(qq - (aa + v * e1 + w * e2) for qq, aa, e1, e2 in zip(q, a, ab, ac))
    return _dot3(diff, diff)


def _make_kernel(tri_batched: bool, n_f_tiles: int):
    """Grid is (B, P-tiles); the whole padded triangle SoA sits in VMEM and
    the kernel loops F tiles sequentially with (min, argmin) accumulators
    carried as vectors — one program does [TP, Fp] work, so program count
    stays tiny (B · Pp/TP) and HBM sees each query/triangle once.

    Tile culling: each 128-triangle tile carries its AABB; a tile is skipped
    when no query in the block can beat its current best against the box
    lower bound.  With Morton-sorted faces and queries (``ops/morton.py``)
    this prunes most tiles — the dense-streaming answer to the reference's
    BVH."""

    def kernel(q_ref, tri_ref, bounds_ref, min_ref, idx_ref):
        q = tuple(q_ref[0, :, i][:, None] for i in range(3))  # [TP, 1] each

        def row(i, f):
            if tri_batched:
                return tri_ref[0, i, pl.ds(f * TF, TF)][None, :]
            return tri_ref[i, pl.ds(f * TF, TF)][None, :]

        def bound(i, f):
            if tri_batched:
                return bounds_ref[0, f, i]
            return bounds_ref[f, i]

        lane = jax.lax.broadcasted_iota(jnp.int32, (TP, TF), 1)

        def compute_tile(f, run_min, run_idx):
            a = (row(0, f), row(1, f), row(2, f))
            b = (row(3, f), row(4, f), row(5, f))
            c = (row(6, f), row(7, f), row(8, f))
            d2 = _tile_dist2(q, a, b, c)  # [TP, TF]
            chunk_min = jnp.min(d2, axis=1, keepdims=True)  # [TP, 1]
            arg_lane = jnp.min(
                jnp.where(d2 == chunk_min, lane, jnp.int32(2**30)),
                axis=1, keepdims=True,
            )
            chunk_idx = f * TF + arg_lane
            better = chunk_min < run_min
            return (
                jnp.where(better, chunk_min, run_min),
                jnp.where(better, chunk_idx, run_idx),
            )

        def body_culled(f, carry):
            run_min, run_idx = carry
            # squared distance from each query to the tile AABB
            dx = jnp.maximum(bound(0, f) - q[0], q[0] - bound(3, f))
            dy = jnp.maximum(bound(1, f) - q[1], q[1] - bound(4, f))
            dz = jnp.maximum(bound(2, f) - q[2], q[2] - bound(5, f))
            dx = jnp.maximum(dx, 0.0)
            dy = jnp.maximum(dy, 0.0)
            dz = jnp.maximum(dz, 0.0)
            lb2 = dx * dx + dy * dy + dz * dz  # [TP, 1]
            visit = jnp.any(lb2 < run_min)
            return jax.lax.cond(
                visit,
                lambda rm, ri: compute_tile(f, rm, ri),
                lambda rm, ri: (rm, ri),
                run_min, run_idx,
            )

        def body_dense(f, carry):
            return compute_tile(f, carry[0], carry[1])

        # Culling only pays off when each 128-query tile is spatially tight
        # relative to the surface; at reference workload sizes (≈200 queries
        # over the whole bone) the cond overhead exceeds the savings, so the
        # dense loop is the default (measured on v5e).  ICP_TPU_CULLING=1
        # enables the AABB path (profitable for large query sets).
        body = body_culled if _culling_enabled() else body_dense

        init = (
            jnp.full((TP, 1), jnp.inf, jnp.float32),
            jnp.zeros((TP, 1), jnp.int32),
        )
        run_min, run_idx = jax.lax.fori_loop(0, n_f_tiles, body, init)
        min_ref[0, 0, :, :] = run_min
        idx_ref[0, 0, :, :] = run_idx

    return kernel


def pack_triangles(triangles) -> jax.Array:
    """triangles [..., F, 3, 3] → padded SoA [..., 9, Fp] (cheap, jit-safe)."""
    f = triangles.shape[-3]
    fp = -(-f // TF) * TF
    soa = jnp.swapaxes(triangles.reshape(*triangles.shape[:-3], f, 9), -1, -2)
    pad = [(0, 0)] * (soa.ndim - 1) + [(0, fp - f)]
    return jnp.pad(soa, pad, constant_values=_FAR)


def tile_bounds(tri_pack) -> jax.Array:
    """Per-128-triangle-tile AABBs from a packed SoA [..., 9, Fp] →
    [..., n_tiles, 8] (lo_xyz, hi_xyz, 2 padding lanes).  Padding triangles
    sit at _FAR, so the last tile's box is huge and simply never culls."""
    fp = tri_pack.shape[-1]
    n_tiles = fp // TF
    tiles = tri_pack.reshape(*tri_pack.shape[:-2], 9, n_tiles, TF)
    xs = tiles[..., (0, 3, 6), :, :]
    ys = tiles[..., (1, 4, 7), :, :]
    zs = tiles[..., (2, 5, 8), :, :]
    lo = jnp.stack(
        [xs.min(axis=(-3, -1)), ys.min(axis=(-3, -1)), zs.min(axis=(-3, -1))],
        axis=-1,
    )
    hi = jnp.stack(
        [xs.max(axis=(-3, -1)), ys.max(axis=(-3, -1)), zs.max(axis=(-3, -1))],
        axis=-1,
    )
    out = jnp.concatenate([lo, hi], axis=-1)  # [..., n_tiles, 6]
    pad = [(0, 0)] * (out.ndim - 1) + [(0, 2)]
    return jnp.pad(out, pad)


def _dist2_call(queries, tri_pack, interpret=False):
    """queries [B, P, 3]; tri_pack [9, Fp] (shared) or [B, 9, Fp] (per-item)
    → (d2 [B, P], idx [B, P])."""
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    fp = tri_pack.shape[-1]
    qpad = jnp.pad(queries, ((0, 0), (0, pp - p), (0, 0)))
    tri_batched = tri_pack.ndim == 3
    bounds = tile_bounds(tri_pack)
    n_tiles = fp // TF

    if tri_batched:
        tri_spec = pl.BlockSpec((1, 9, fp), lambda b, pt: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec((1, n_tiles, 8), lambda b, pt: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        tri_spec = pl.BlockSpec((9, fp), lambda b, pt: (0, 0),
                                memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec((n_tiles, 8), lambda b, pt: (0, 0),
                                   memory_space=pltpu.VMEM)

    grid = (bsz, pp // TP)
    d2, idx = pl.pallas_call(
        _make_kernel(tri_batched, n_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TP, 3), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            tri_spec,
            bounds_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, pp // TP, TP, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, pp // TP, TP, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qpad, tri_pack, bounds)
    return (
        d2.reshape(bsz, pp)[:, :p],
        idx.reshape(bsz, pp)[:, :p],
    )


def _surface_distances_pallas_core(queries, triangles, interpret):
    """Unbatched core: queries [P,3], triangles [F,3,3]."""
    tri_pack = pack_triangles(triangles)
    d2, idx = _dist2_call(queries[None], tri_pack, interpret=interpret)
    return d2[0], idx[0]


@functools.partial(jax.custom_batching.custom_vmap)
def surface_distances_pallas(queries, triangles):
    """Pallas-backed drop-in for ``closest_point.surface_distances``:
    (queries [P,3], triangles [F,3,3]) → (dist2 [P], face_idx [P]).

    Under ``vmap`` the whole chain batch maps onto ONE kernel launch; the
    triangle argument may be shared (static target) or batched (per-chain
    current mesh).  Off-TPU the kernel runs in interpreter mode (tests).
    """
    interpret = jax.default_backend() != "tpu"
    return _surface_distances_pallas_core(queries, triangles, interpret)


@surface_distances_pallas.def_vmap
def _surface_distances_pallas_vmap(axis_size, in_batched, queries, triangles):
    q_batched, t_batched = in_batched
    interpret = jax.default_backend() != "tpu"
    if not q_batched:
        queries = jnp.broadcast_to(queries, (axis_size,) + queries.shape)
    tri_pack = pack_triangles(triangles)  # batched iff triangles batched
    d2, idx = _dist2_call(queries, tri_pack, interpret=interpret)
    return (d2, idx), (True, True)


# ---------------------------------------------------------------------------
# nearest-vertex kernel (point→point argmin; the findClosestPoint analog)
# ---------------------------------------------------------------------------
#
# Two overhead killers, measured on v5e:
#   * fat programs — each program handles GB batch elements (chains), since
#     per-program fixed cost dominates at a few hundred queries per chain;
#   * no inner loop — the whole [TP, Vp] distance block is computed with
#     static full-row loads and one min/argmin reduction, because per-
#     fori-iteration costs (dynamic slices, accumulator bookkeeping) are
#     comparable to the ~9 distance ops of a 128-lane tile.  Vp is chunked
#     statically only when the [TP, chunk] working set would stress VMEM.

GB = 8  # batch elements per program
NV_CHUNK = 4096  # lanes per static chunk (working set [TP, NV_CHUNK] ≈ 2 MB)


def _make_nv_kernel(pts_batched: bool, gb: int, vp: int):
    n_chunks = -(-vp // NV_CHUNK)

    def kernel(q_ref, v_ref, idx_ref):
        for g in range(gb):
            q = tuple(q_ref[g, :, i][:, None] for i in range(3))  # [TP, 1]
            best_min = None
            best_idx = None
            for c in range(n_chunks):
                lo = c * NV_CHUNK
                w = min(NV_CHUNK, vp - lo)

                def row(i):
                    if pts_batched:
                        return v_ref[g, i, lo:lo + w][None, :]
                    return v_ref[i, lo:lo + w][None, :]

                dx = q[0] - row(0)
                dy = q[1] - row(1)
                dz = q[2] - row(2)
                d2 = dx * dx + dy * dy + dz * dz  # [TP, w]
                lane = jax.lax.broadcasted_iota(jnp.int32, (TP, w), 1) + lo
                chunk_min = jnp.min(d2, axis=1, keepdims=True)
                chunk_idx = jnp.min(
                    jnp.where(d2 == chunk_min, lane, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                if best_min is None:
                    best_min, best_idx = chunk_min, chunk_idx
                else:
                    better = chunk_min < best_min
                    best_min = jnp.where(better, chunk_min, best_min)
                    best_idx = jnp.where(better, chunk_idx, best_idx)
            idx_ref[g, 0, :, :] = best_idx

    return kernel


def pack_points(points) -> jax.Array:
    """points [..., V, 3] → padded SoA [..., 3, Vp]."""
    v = points.shape[-2]
    vp = -(-v // TF) * TF
    soa = jnp.swapaxes(points, -1, -2)  # [..., 3, V]
    pad = [(0, 0)] * (soa.ndim - 1) + [(0, vp - v)]
    return jnp.pad(soa, pad, constant_values=_FAR)


def _nv_call(queries, pts_pack, interpret=False):
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    vp = pts_pack.shape[-1]
    pts_batched = pts_pack.ndim == 3
    gb = min(GB, bsz)
    bp = -(-bsz // gb) * gb
    qpad = jnp.pad(queries, ((0, bp - bsz), (0, pp - p), (0, 0)))
    if pts_batched and bp != bsz:
        pts_pack = jnp.pad(pts_pack, ((0, bp - bsz), (0, 0), (0, 0)))

    if pts_batched:
        pts_spec = pl.BlockSpec((gb, 3, vp), lambda b, pt: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        pts_spec = pl.BlockSpec((3, vp), lambda b, pt: (0, 0),
                                memory_space=pltpu.VMEM)

    idx = pl.pallas_call(
        _make_nv_kernel(pts_batched, gb, vp),
        grid=(bp // gb, pp // TP),
        in_specs=[
            pl.BlockSpec((gb, TP, 3), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pts_spec,
        ],
        out_specs=pl.BlockSpec((gb, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, pp // TP, TP, 1), jnp.int32),
        interpret=interpret,
    )(qpad, pts_pack)
    return idx.reshape(bp, pp)[:bsz, :p]


@functools.partial(jax.custom_batching.custom_vmap)
def nearest_vertices_pallas(queries, points):
    """Pallas-backed drop-in for ``closest_point.nearest_vertices``:
    (queries [P,3], points [V,3]) → ids [P]."""
    interpret = jax.default_backend() != "tpu"
    return _nv_call(queries[None], pack_points(points), interpret=interpret)[0]


@nearest_vertices_pallas.def_vmap
def _nearest_vertices_pallas_vmap(axis_size, in_batched, queries, points):
    q_batched, p_batched = in_batched
    interpret = jax.default_backend() != "tpu"
    if not q_batched:
        queries = jnp.broadcast_to(queries, (axis_size,) + queries.shape)
    idx = _nv_call(queries, pack_points(points), interpret=interpret)
    return idx, True


# ---------------------------------------------------------------------------
# MXU coarse nearest-vertex kernel (shortlist stage 1)
# ---------------------------------------------------------------------------
#
# The coarse pass only has to pick a *shortlist anchor* vertex; stage 2
# (refine over that vertex's K pregathered faces) is exact.  That licenses
# the dot-product distance form
#
#     argmin_v ‖q − v‖²  ==  argmin_v (‖v‖² − 2·q·v)            (exact arith)
#
# which turns the whole distance block into ONE matmul: augment queries to
# qa = (qx, qy, qz, 1, 0·4) and vertices to va = (−2vx, −2vy, −2vz, ‖v‖²,
# 0·4), then qa·va = ‖v‖² − 2 q·v and the [TP, chunk] block comes off the
# MXU instead of ~8 VPU ops/element (the subtractive form above).
#
# MEASURED NEGATIVE RESULT (v5e, B=2048, P=400, femur target — keep for the
# record; tools/micro_coarse.py reproduces it):
#   * DEFAULT matmul precision truncates f32 inputs to bf16 on the MXU:
#     6.5 ms/iter (2× the VPU kernel's 12.5 ms) but anchor true-distance
#     errors up to 2.3e2 mm² at femur coordinate scale — breaks the index's
#     near-surface-exactness contract.  Unusable.
#   * Precision.HIGHEST (3-pass bf16 decomposition) restores exactness
#     (≤3.3e-3 mm² gap, pure f32 cancellation) but costs 17.8 ms/iter —
#     slower than the subtractive VPU kernel.
# So the VPU kernel stays the default; ICP_TPU_COARSE_MXU=1 opts in to the
# HIGHEST-precision MXU form (it may win on hardware with a faster f32
# matmul path or larger V).  Exact ``findClosestPoint`` semantics
# (target-direction correspondences, reference NonRigidIcpProposal.scala:118)
# always use the subtractive ``nearest_vertices_pallas`` above.


def _make_coarse_mxu_kernel(gb: int, vp: int):
    n_chunks = -(-vp // NV_CHUNK)

    def kernel(q_ref, va_ref, idx_ref):
        for g in range(gb):
            qa = q_ref[g]  # [TP, 8]
            best_min = None
            best_idx = None
            for c in range(n_chunks):
                lo = c * NV_CHUNK
                w = min(NV_CHUNK, vp - lo)
                # HIGHEST precision: TPU DEFAULT truncates f32 matmul inputs
                # to bf16 (one MXU pass) — measured 2.3e2 mm² anchor-distance
                # error at femur scale; the 3-pass f32 form restores ~2⁻²⁴
                # relative error and still beats the VPU subtractive kernel
                s = jnp.dot(
                    qa, va_ref[:, lo:lo + w],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [TP, w] — MXU
                lane = jax.lax.broadcasted_iota(jnp.int32, (TP, w), 1) + lo
                chunk_min = jnp.min(s, axis=1, keepdims=True)
                chunk_idx = jnp.min(
                    jnp.where(s == chunk_min, lane, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                if best_min is None:
                    best_min, best_idx = chunk_min, chunk_idx
                else:
                    better = chunk_min < best_min
                    best_min = jnp.where(better, chunk_min, best_min)
                    best_idx = jnp.where(better, chunk_idx, best_idx)
            idx_ref[g, 0, :, :] = best_idx

    return kernel


def pack_points_aug(points) -> jax.Array:
    """points [V, 3] → augmented SoA [8, Vp] for the MXU coarse kernel:
    rows (−2x, −2y, −2z, ‖v‖², 0, 0, 0, 0); padding lanes carry ‖v‖² = 1e30
    so they never win the argmin."""
    pts = jnp.asarray(points, jnp.float32)
    v = pts.shape[-2]
    vp = -(-v // TF) * TF
    n2 = jnp.sum(pts * pts, axis=-1)[None, :]  # [1, V]
    rows = jnp.concatenate(
        [jnp.swapaxes(-2.0 * pts, -1, -2), n2,
         jnp.zeros((4, v), jnp.float32)], axis=0)  # [8, V]
    pad = jnp.zeros((8, vp - v), jnp.float32).at[3, :].set(1e30)
    return jnp.concatenate([rows, pad], axis=1)


def _augment_queries(queries) -> jax.Array:
    """[..., P, 3] → [..., P, 8]: (x, y, z, 1, 0·4)."""
    shp = queries.shape[:-1]
    return jnp.concatenate(
        [queries,
         jnp.ones(shp + (1,), jnp.float32),
         jnp.zeros(shp + (4,), jnp.float32)], axis=-1)


def _coarse_mxu_call(queries, va, interpret=False):
    """queries [B, P, 3]; va [8, Vp] (shared static surface) → ids [B, P]."""
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    vp = va.shape[-1]
    gb = min(GB, bsz)
    bp = -(-bsz // gb) * gb
    qa = _augment_queries(queries)
    qpad = jnp.pad(qa, ((0, bp - bsz), (0, pp - p), (0, 0)))
    idx = pl.pallas_call(
        _make_coarse_mxu_kernel(gb, vp),
        grid=(bp // gb, pp // TP),
        in_specs=[
            pl.BlockSpec((gb, TP, 8), lambda b, pt: (b, pt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, vp), lambda b, pt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, 1, TP, 1), lambda b, pt: (b, pt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, pp // TP, TP, 1), jnp.int32),
        interpret=interpret,
    )(qpad, va)
    return idx.reshape(bp, pp)[:bsz, :p]


@functools.partial(jax.custom_batching.custom_vmap)
def coarse_nearest_mxu(queries, points):
    """MXU-form coarse nearest vertex: (queries [P,3], points [V,3]) → ids [P].
    Shortlist stage 1 only — near-tied anchors may swap (see block comment)."""
    interpret = jax.default_backend() != "tpu"
    return _coarse_mxu_call(queries[None], pack_points_aug(points),
                            interpret=interpret)[0]


@coarse_nearest_mxu.def_vmap
def _coarse_nearest_mxu_vmap(axis_size, in_batched, queries, points):
    q_batched, p_batched = in_batched
    if p_batched:
        # batched surfaces: no shared augmented table — take the exact kernel
        ids = _nearest_vertices_pallas_vmap(
            axis_size, in_batched, queries, points)[0]
        return ids, True
    interpret = jax.default_backend() != "tpu"
    if not q_batched:
        queries = jnp.broadcast_to(queries, (axis_size,) + queries.shape)
    ids = _coarse_mxu_call(queries, pack_points_aug(points),
                           interpret=interpret)
    return ids, True


def coarse_nearest_pallas(queries, points):
    """Shortlist coarse stage: exact subtractive VPU kernel (measured
    fastest at exactness — see the MXU block comment above);
    ICP_TPU_COARSE_MXU=1 opts in to the HIGHEST-precision MXU form.

    NOTE trace-time semantics (same hazard class as ICP_TPU_CULLING): the
    env var is read when the enclosing jit first traces, so flipping it
    after compilation caches are warm has no effect on already-compiled
    programs — set it before the first call of the process.  The MXU form
    also only covers shared (unbatched) surfaces: vmap over the points
    argument falls back to the exact VPU kernel
    (``_coarse_nearest_mxu_vmap``, p_batched branch)."""
    import os

    if os.environ.get("ICP_TPU_COARSE_MXU") == "1":
        return coarse_nearest_mxu(queries, points)
    return nearest_vertices_pallas(queries, points)


# ---------------------------------------------------------------------------
# shortlist refine kernel (exact point→triangle over K pregathered candidates)
# ---------------------------------------------------------------------------
#
# The jnp [B, P, K] cascade was the measured hot spot of the whole MH step
# (~77 of 96 ms at B=2048, P=400 — tools/micro_index.py): XLA materializes
# the cascade temporaries ([B,P,K] each, ~10 of them) through HBM.  Here the
# cascade runs on [TP, K] tiles entirely in VMEM.  Candidate triangles come
# in COMPONENT-MAJOR rows (``SurfaceIndex.cand_tri``: [P, 9·K] with layout
# ax[K] ay[K] az[K] bx[K] ... cz[K]) so the nine in-kernel component slices
# are lane-contiguous.


RGB = 8  # batch elements per refine program (fat programs: DMA-bound, not
#          program-overhead-bound)


def _make_refine_kernel(k: int, gb: int):
    """Lane-paired cascade: at the K=64 default a [TP, K] tile fills only
    half the 128-lane VPU width — every op pads the other half away.
    Packing TWO queries' candidate rows side by side runs the cascade on
    full-width [TP/2, 2K] tiles (measured 65.3 → 57.6 ms/iter for the whole
    index chain at B=2048, P=400 — tools/micro_refine.py; bit-identical
    output).  The per-half reductions after the cascade are cheap (~10 of
    ~85 ops).  A nodiv variant measured the cascade's 5 VPU divides at
    ~zero marginal cost; the residual gap to the ALU roofline is
    per-program fixed cost, bounded by VMEM: the [gb, TP, 9K] block is
    2.4 MB at gb=8, so fatter programs don't fit (~16 MB/core)."""
    h = TP // 2

    def kernel(q_ref, trik_ref, faces_ref, fidx_ref, wtri_ref):
        for g in range(gb):
            t = trik_ref[g]  # [TP, 9k]
            fc = faces_ref[g]  # [TP, k]
            q = q_ref[g]  # [TP, 3]

            def comp(i):
                return jnp.concatenate(
                    [t[:h, i * k:(i + 1) * k], t[h:, i * k:(i + 1) * k]],
                    axis=1)  # [h, 2k]: [query row r | query row r+h]

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
                # tie-break on the SMALLEST FACE ID among distance-tied
                # lanes — matching the dense kernel's argmin order, so
                # fidx-based correspondences are reproducible across the
                # index and dense paths (ADVICE r2 item 3); then pick one
                # lane of that face (shortlists may pad with duplicate
                # faces) so face id and coords come from the SAME lane
                fid_tied = jnp.where(d2h == best, fh, jnp.int32(2**30))
                fmin = jnp.min(fid_tied, axis=1, keepdims=True)
                kidx = jnp.min(
                    jnp.where(fid_tied == fmin, lane, jnp.int32(2**30)),
                    axis=1, keepdims=True)
                onehot = lane == kidx  # [h, k], exactly one lane set
                # winner FACE id selected in-lane (a take_along_axis outside
                # the kernel measured 13 ms at B=2048 — XLA lowers batched
                # along-axis gathers catastrophically)
                fidx_ref[g, 0, rows, :] = jnp.min(
                    jnp.where(onehot, fh, jnp.int32(2**30)),
                    axis=1, keepdims=True)
                sel = onehot.astype(jnp.float32)
                for i in range(9):
                    ch = corners[i][:, half * k:(half + 1) * k]
                    wtri_ref[g, 0, rows, i:i + 1] = jnp.sum(
                        ch * sel, axis=1, keepdims=True)

    return kernel


def _refine_call(queries, trik, faces, k: int, interpret=False):
    """queries [B, P, 3], trik [B, P, 9·k] component-major, faces [B, P, k]
    → (fidx [B, P] i32, wtri [B, P, 9] f32 winner coords)."""
    bsz, p, _ = queries.shape
    pp = -(-p // TP) * TP
    gb = min(RGB, bsz)
    bp = -(-bsz // gb) * gb
    qpad = jnp.pad(queries, ((0, bp - bsz), (0, pp - p), (0, 0)))
    tpad = jnp.pad(trik, ((0, bp - bsz), (0, pp - p), (0, 0)),
                   constant_values=_FAR)
    fpad = jnp.pad(faces, ((0, bp - bsz), (0, pp - p), (0, 0)))
    fidx, wtri = pl.pallas_call(
        _make_refine_kernel(k, gb),
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


@functools.partial(jax.custom_batching.custom_vmap)
def refine_shortlist_pallas(queries, trik, faces):
    """(queries [P,3], trik [P, 9·K] component-major, faces [P, K]) →
    (winner face id [P] i32, winner triangle coords [P, 9] f32).  Exact
    (same cascade as the dense kernel); the caller recomputes the winner's
    closest point/d2 once in jnp so gradients flow through a single
    differentiable evaluation."""
    k = trik.shape[-1] // 9
    interpret = jax.default_backend() != "tpu"
    fidx, wtri = _refine_call(queries[None], trik[None], faces[None], k,
                              interpret=interpret)
    return fidx[0], wtri[0]


@refine_shortlist_pallas.def_vmap
def _refine_shortlist_vmap(axis_size, in_batched, queries, trik, faces):
    q_batched, t_batched, f_batched = in_batched
    if not q_batched:
        queries = jnp.broadcast_to(queries, (axis_size,) + queries.shape)
    if not t_batched:
        trik = jnp.broadcast_to(trik, (axis_size,) + trik.shape)
    if not f_batched:
        faces = jnp.broadcast_to(faces, (axis_size,) + faces.shape)
    k = trik.shape[-1] // 9
    interpret = jax.default_backend() != "tpu"
    return (
        _refine_call(queries, trik, faces, k, interpret=interpret),
        (True, True),
    )
