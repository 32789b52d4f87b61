"""Batch-in-lanes Cholesky factor/solve Pallas kernels.

The MH step factors one r×r GP-posterior precision per ICP component per
step (SURVEY §3.1 hot loop, ``NonRigidIcpProposal.scala:152``).  XLA's
batched ``cholesky``/``triangular_solve`` at [2048, 100, 100] cost ~27 ms /
~8 ms per call on a v5e chip — they are blocked panel algorithms designed
for large matrices, serialized over the small batch.  These kernels instead
put the BATCH dimension in the vector lanes: the matrix lives as
[r, r, BL] in VMEM and the classic scalar right-looking Cholesky /
substitution loops become fully vectorized over BL chains per program, with
zero inter-chain communication.

Numerical form (in-place, masked-column update): at step j

    d      = A[j,j]                      (Schur-complement diagonal)
    l_col  = A[:,j] / √d                 (column j of L)
    A     -= l_col · (A[j,:] / √d ⊙ [col>j])   (live block stays symmetric)
    A[:,j] = l_col ⊙ [row≥j]             (finalize; upper triangle → 0)

Flop count is 3× the triangular-update optimum (full-width vector ops) but
runs at VPU rate with unit stride; at r=100, BL=64 the whole
factor+solve+logdet costs ~r·r·r·B·3 ≈ 6 GFLOP per 2048-chain step-pair.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30


def _pick_bl(r: int) -> int | None:
    """Lanes-batch per program for the MONOLITHIC kernel (whole [r,r,BL]
    working set resident in VMEM).  Mosaic requires the lane (last) block
    dim to be a multiple of 128; the two [r,r,BL] f32 buffers (input block +
    L output) dominate VMEM.  Returns None when even BL=128 would not fit
    (r ≳ 140) — callers then use the BLOCKED left-looking kernel below."""
    budget = 11 * 2 ** 20 / (2 * 4 * r * r)
    bl = 128 * int(budget // 128)
    if bl < 128:
        return None
    return int(min(512, bl))


def _pick_nb(r: int, bl: int = 128) -> int | None:
    """Column-panel width for the BLOCKED left-looking kernel (rank-200 path,
    VERDICT r2 item 4).  VMEM = two [rp, NB, BL] panels + one [NB, NB, BL]
    diagonal block + four [rp, BL] vectors; pick the widest NB (multiple of
    the 8-row sublane tile) that fits ~12 MB, preferring small rp padding."""
    best = None
    for nb in (64, 56, 48, 40, 32, 24, 16, 8):
        rp = -(-r // nb) * nb
        vmem = (2 * rp * nb + nb * nb) * bl * 4 + 4 * rp * bl * 4
        if vmem > 12 * 2 ** 20:
            continue
        waste = rp - r
        if best is None or waste < best[1]:
            best = (nb, waste)
    return best[0] if best else None


def pallas_chol_supported(r: int) -> bool:
    """True when either the monolithic or the blocked kernel can run."""
    rp = -(-r // 8) * 8
    return _pick_bl(rp) is not None or _pick_nb(rp) is not None


def _chol_kernel(r: int, rp: int, bl: int):
    """M and L stay in HBM (``pltpu.ANY``) and move through ONE [rp,rp,BL]
    VMEM scratch via explicit DMA: two pipelined block windows would need
    4·r²·BL·4 B ≈ 21 MB at r≈100 — over the ~16 MB/core VMEM budget — and
    at ~40 flops/byte the kernel is compute-bound, so the lost DMA/compute
    overlap is noise.  ``rp`` is r rounded up to the sublane tile (8); the
    caller zero-pads rows/cols r..rp, which stay exactly zero through the
    in-place factor loop (their columns are never pivoted)."""

    def kernel(m_hbm, rhs_ref, l_hbm, x_ref, ld_ref, l_ref, y_ref, ild_ref,
               sem_in, sem_out):
        i = pl.program_id(0)
        cp_in = pltpu.make_async_copy(
            m_hbm.at[:, :, pl.ds(i * bl, bl)], l_ref, sem_in
        )
        cp_in.start()
        cp_in.wait()
        ld_ref[:, :] = jnp.zeros_like(ld_ref)
        y_ref[:, :] = jnp.zeros_like(y_ref)
        x_ref[:, :] = jnp.zeros_like(x_ref)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rp, 1, 1), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, rp, 1), 1)

        def factor_step(j, _):
            d_raw = l_ref[pl.ds(j, 1), pl.ds(j, 1), :]  # [1,1,BL]
            # Non-SPD pivot → NaN, so the Pallas path fails the same way as
            # jnp.linalg.cholesky (MH rejects NaN states) instead of silently
            # producing finite garbage factors.  Padded lanes (all-zero M) go
            # NaN too; they are sliced away by the caller.
            d = jnp.where(d_raw > 0.0, d_raw, jnp.float32(jnp.nan))
            inv = jax.lax.rsqrt(d)
            l_col = l_ref[:, pl.ds(j, 1), :] * inv  # [r,1,BL]
            l_row = l_ref[pl.ds(j, 1), :, :] * inv * (col_iota > j)  # [1,r,BL]
            l_ref[:, :, :] = l_ref[:, :, :] - l_col * l_row
            l_ref[:, pl.ds(j, 1), :] = l_col * (row_iota >= j)
            ild_ref[pl.ds(j, 1), :] = inv[0]
            ld_ref[:, :] = ld_ref[:, :] + jnp.log(d[0])
            return 0

        jax.lax.fori_loop(0, r, factor_step, 0)

        def fwd_step(j, _):
            lrow = l_ref[pl.ds(j, 1), :, :][0]  # [r,BL]; zeros right of diag
            s = jnp.sum(lrow * y_ref[:, :], axis=0, keepdims=True)  # [1,BL]
            # y[j] is still 0, but lrow[j] = √d ≠ 0 ⇒ s already excludes it
            yj = (rhs_ref[pl.ds(j, 1), :] - s) * ild_ref[pl.ds(j, 1), :]
            y_ref[pl.ds(j, 1), :] = yj
            return 0

        jax.lax.fori_loop(0, r, fwd_step, 0)

        def bwd_step(jj, _):
            j = r - 1 - jj
            lcol = l_ref[:, pl.ds(j, 1), :][:, 0, :]  # [r,BL]; zeros above diag
            s = jnp.sum(lcol * x_ref[:, :], axis=0, keepdims=True)
            # lcol[j]·x[j] term: x[j] still 0; diag handled via ild
            xj = (y_ref[pl.ds(j, 1), :] - s) * ild_ref[pl.ds(j, 1), :]
            x_ref[pl.ds(j, 1), :] = xj
            return 0

        jax.lax.fori_loop(0, r, bwd_step, 0)

        cp_out = pltpu.make_async_copy(
            l_ref, l_hbm.at[:, :, pl.ds(i * bl, bl)], sem_out
        )
        cp_out.start()
        cp_out.wait()

    return kernel


def _chol_blocked_kernel(rp: int, nb: int, bl: int):
    """Blocked LEFT-LOOKING batch-in-lanes Cholesky + solve for ranks whose
    full [rp,rp,BL] working set exceeds VMEM (r ≳ 140; the GPMM-200 harness,
    ``StdIcpVsChainICPrandomInitComparisonAll.scala:88``).

    M and L live in HBM (aliased — classic in-place blocked factorization);
    one [rp,NB,BL] column panel streams through VMEM per block step:

      for k in blocks:                       (nblk = rp/NB)
        P ← M[:, k·NB:(k+1)·NB]                              (DMA in)
        for jb < k:  P -= L[:, jb] · L[kb rows, jb]ᵀ          (left-looking)
        factor diagonal block + panel columns (scalar loop, lanes vectorized)
        L[:, k·NB:(k+1)·NB] ← P                               (DMA out)

    The correction is organized column-wise (P[:,c] -= Σ_t prev[:,t]·R[c,t])
    so no sublane transposes are needed; R = L[kb rows, jb cols] is a small
    [NB,NB,BL] block DMA'd separately.  In exact arithmetic the corrected
    panel is zero above the diagonal block (L is lower triangular), so the
    scalar factor loop matches the monolithic kernel's masked updates.

    The caller pads M with IDENTITY rows/cols r..rp (not zeros): padded
    pivots factor to 1, contribute log 1 = 0 to the logdet, and never NaN.
    Forward/backward substitutions stream the panels once more each.
    """
    nblk = rp // nb

    def kernel(m_hbm, rhs_ref, l_hbm, x_ref, ld_ref, panel, prev, rblk,
               y_ref, ild_ref, sem_p, sem_prev, sem_r, sem_out):
        i = pl.program_id(0)
        lanes = pl.ds(i * bl, bl)
        ld_ref[:, :] = jnp.zeros_like(ld_ref)
        y_ref[:, :] = jnp.zeros_like(y_ref)
        x_ref[:, :] = jnp.zeros_like(x_ref)
        ild_ref[:, :] = jnp.zeros_like(ild_ref)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rp, 1, 1), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)

        def col_block(k, _):
            cp = pltpu.make_async_copy(
                m_hbm.at[:, pl.ds(k * nb, nb), lanes], panel, sem_p
            )
            cp.start()
            cp.wait()

            def prev_block(jb, _):
                cpp = pltpu.make_async_copy(
                    l_hbm.at[:, pl.ds(jb * nb, nb), lanes], prev, sem_prev
                )
                cpp.start()
                cpr = pltpu.make_async_copy(
                    l_hbm.at[pl.ds(k * nb, nb), pl.ds(jb * nb, nb), lanes],
                    rblk, sem_r,
                )
                cpr.start()
                cpp.wait()
                cpr.wait()

                def c_step(c, _):
                    corr = jnp.sum(
                        prev[:, :, :] * rblk[pl.ds(c, 1), :, :],
                        axis=1, keepdims=True,
                    )  # [rp, 1, bl]
                    panel[:, pl.ds(c, 1), :] = panel[:, pl.ds(c, 1), :] - corr
                    return 0

                jax.lax.fori_loop(0, nb, c_step, 0)
                return 0

            jax.lax.fori_loop(0, k, prev_block, 0)

            def factor_step(j, _):
                jg = k * nb + j
                d_raw = panel[pl.ds(jg, 1), pl.ds(j, 1), :]  # [1,1,bl]
                # non-SPD pivot → NaN (MH rejects NaN states); padded lanes
                # (all-zero M) go NaN too and are sliced away by the caller
                d = jnp.where(d_raw > 0.0, d_raw, jnp.float32(jnp.nan))
                inv = jax.lax.rsqrt(d)
                l_col = panel[:, pl.ds(j, 1), :] * inv  # [rp,1,bl]
                l_row = panel[pl.ds(jg, 1), :, :] * inv * (col_iota > j)
                panel[:, :, :] = panel[:, :, :] - l_col * l_row
                panel[:, pl.ds(j, 1), :] = l_col * (row_iota >= jg)
                ild_ref[pl.ds(jg, 1), :] = inv[0]
                ld_ref[:, :] = ld_ref[:, :] + jnp.log(d[0])
                return 0

            jax.lax.fori_loop(0, nb, factor_step, 0)

            cp_out = pltpu.make_async_copy(
                panel, l_hbm.at[:, pl.ds(k * nb, nb), lanes], sem_out
            )
            cp_out.start()
            cp_out.wait()
            return 0

        jax.lax.fori_loop(0, nblk, col_block, 0)

        # forward substitution L y = rhs with a running residual in y_ref:
        # y_ref starts as rhs; after pivot jg is solved, subtract its column
        y_ref[:, :] = rhs_ref[:, :]

        def fwd_block(kb, _):
            cp = pltpu.make_async_copy(
                l_hbm.at[:, pl.ds(kb * nb, nb), lanes], panel, sem_p
            )
            cp.start()
            cp.wait()

            def fwd_step(j, _):
                jg = kb * nb + j
                yj = y_ref[pl.ds(jg, 1), :] * ild_ref[pl.ds(jg, 1), :]  # [1,bl]
                lcol = panel[:, pl.ds(j, 1), :][:, 0, :]  # [rp,bl]
                mask = (row_iota[:, 0, :] > jg).astype(lcol.dtype)  # keep y[jg]
                y_ref[:, :] = y_ref[:, :] - lcol * mask * yj
                y_ref[pl.ds(jg, 1), :] = yj
                return 0

            jax.lax.fori_loop(0, nb, fwd_step, 0)
            return 0

        jax.lax.fori_loop(0, nblk, fwd_block, 0)

        # backward substitution Lᵀ x = y, streaming panels in reverse
        def bwd_block(kk, _):
            kb = nblk - 1 - kk
            cp = pltpu.make_async_copy(
                l_hbm.at[:, pl.ds(kb * nb, nb), lanes], panel, sem_p
            )
            cp.start()
            cp.wait()

            def bwd_step(jj, _):
                j = nb - 1 - jj
                jg = kb * nb + j
                lcol = panel[:, pl.ds(j, 1), :][:, 0, :]  # [rp,bl]
                s = jnp.sum(lcol * x_ref[:, :], axis=0, keepdims=True)
                # x[jg] still 0 ⇒ the diagonal term is excluded from s
                xj = (y_ref[pl.ds(jg, 1), :] - s) * ild_ref[pl.ds(jg, 1), :]
                x_ref[pl.ds(jg, 1), :] = xj
                return 0

            jax.lax.fori_loop(0, nb, bwd_step, 0)
            return 0

        jax.lax.fori_loop(0, nblk, bwd_block, 0)

    return kernel


def _tri_lt_blocked_kernel(rp: int, nb: int, bl: int):
    """Blocked Lᵀx = z solve (posterior sampling at large rank): stream
    [rp,NB,BL] panels of an already-factored L in reverse column order."""
    nblk = rp // nb

    def kernel(l_hbm, z_ref, x_ref, panel, sem_p):
        i = pl.program_id(0)
        lanes = pl.ds(i * bl, bl)
        x_ref[:, :] = jnp.zeros_like(x_ref)

        def bwd_block(kk, _):
            kb = nblk - 1 - kk
            cp = pltpu.make_async_copy(
                l_hbm.at[:, pl.ds(kb * nb, nb), lanes], panel, sem_p
            )
            cp.start()
            cp.wait()

            def bwd_step(jj, _):
                j = nb - 1 - jj
                jg = kb * nb + j
                lcol = panel[:, pl.ds(j, 1), :][:, 0, :]
                d = panel[pl.ds(jg, 1), pl.ds(j, 1), :][0]  # [1,bl]
                s = jnp.sum(lcol * x_ref[:, :], axis=0, keepdims=True)
                xj = (z_ref[pl.ds(jg, 1), :] - s) / jnp.maximum(d, _TINY)
                x_ref[pl.ds(jg, 1), :] = xj
                return 0

            jax.lax.fori_loop(0, nb, bwd_step, 0)
            return 0

        jax.lax.fori_loop(0, nblk, bwd_block, 0)

    return kernel


def _tri_lt_kernel(r: int, rp: int):
    """Solve Lᵀ x = z given an already-factored lower L (batch in lanes).
    ``rp`` = r rounded to the sublane tile; padded rows of L/z are zero and
    contribute nothing to the dot products."""

    def kernel(l_ref, z_ref, x_ref):
        x_ref[:, :] = jnp.zeros_like(x_ref)

        def bwd_step(jj, _):
            j = r - 1 - jj
            lcol = l_ref[:, pl.ds(j, 1), :][:, 0, :]  # [r,BL]
            d = l_ref[pl.ds(j, 1), pl.ds(j, 1), :][0]  # [1,BL]
            s = jnp.sum(lcol * x_ref[:, :], axis=0, keepdims=True)
            xj = (z_ref[pl.ds(j, 1), :] - s) / jnp.maximum(d, _TINY)
            x_ref[pl.ds(j, 1), :] = xj
            return 0

        jax.lax.fori_loop(0, r, bwd_step, 0)

    return kernel


def _chol_blocked_call(m_t, rhs_t, interpret=False):
    """Blocked-kernel variant of ``_chol_call`` (rank too large for the
    monolithic VMEM working set).  Identity-pads rows/cols r..rp so padded
    pivots factor cleanly (see kernel docstring)."""
    r, _, b = m_t.shape
    bl = 128
    nb = _pick_nb(-(-r // 8) * 8, bl)
    rp = -(-r // nb) * nb
    bp = -(-b // bl) * bl
    m_t = jnp.pad(m_t, ((0, rp - r), (0, rp - r), (0, bp - b)))
    if rp > r:
        eye_pad = jnp.zeros((rp, rp, 1), m_t.dtype).at[
            jnp.arange(r, rp), jnp.arange(r, rp), 0
        ].set(1.0)
        m_t = m_t + eye_pad
    rhs_t = jnp.pad(rhs_t, ((0, rp - r), (0, bp - b)))
    grid = (bp // bl,)
    l_t, x_t, ld = pl.pallas_call(
        _chol_blocked_kernel(rp, nb, bl),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # M stays in HBM
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # L stays in HBM
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, rp, bp), jnp.float32),
            jax.ShapeDtypeStruct((rp, bp), jnp.float32),
            jax.ShapeDtypeStruct((1, bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rp, nb, bl), jnp.float32),  # panel
            pltpu.VMEM((rp, nb, bl), jnp.float32),  # prev L panel
            pltpu.VMEM((nb, nb, bl), jnp.float32),  # R = L[kb rows, jb cols]
            pltpu.VMEM((rp, bl), jnp.float32),  # y: fwd-subst running state
            pltpu.VMEM((rp, bl), jnp.float32),  # ild: 1/√d per pivot
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # in-place blocked factorization: panel k reads M cols ≥ k (not yet
        # overwritten) and L cols < k (already finalized) from one buffer
        input_output_aliases={0: 0},
        interpret=interpret,
    )(m_t, rhs_t)
    return l_t[:r, :r, :b], x_t[:r, :b], ld[0, :b]


def _chol_call(m_t, rhs_t, interpret=False):
    """m_t [r,r,B], rhs_t [r,B] → (L [r,r,B], x [r,B], logdet [B])."""
    r, _, b = m_t.shape
    rp = -(-r // 8) * 8  # Mosaic sublane tile: DMA slices need dim-1 % 8 == 0
    bl = _pick_bl(rp)
    if bl is None:
        return _chol_blocked_call(m_t, rhs_t, interpret=interpret)
    bp = -(-b // bl) * bl
    m_t = jnp.pad(m_t, ((0, rp - r), (0, rp - r), (0, bp - b)))
    rhs_t = jnp.pad(rhs_t, ((0, rp - r), (0, bp - b)))
    grid = (bp // bl,)
    l_t, x_t, ld = pl.pallas_call(
        _chol_kernel(r, rp, bl),
        grid=grid,
        in_specs=[
            # M stays in HBM; the kernel DMAs one [rp,rp,BL] lane-slice into
            # the single VMEM working block.  A VMEM block pipeline would need
            # 4·r²·BL·4 B (double-buffered in + out) ≈ 21 MB at r≈100 — over
            # the ~16 MB/core budget.
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, rp, bp), jnp.float32),
            jax.ShapeDtypeStruct((rp, bp), jnp.float32),
            jax.ShapeDtypeStruct((1, bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rp, rp, bl), jnp.float32),  # l_ref: in-place factor
            pltpu.VMEM((rp, bl), jnp.float32),  # y_ref: forward-subst solution
            pltpu.VMEM((rp, bl), jnp.float32),  # ild_ref: 1/√d per pivot
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # M is factored in place (the kernel DMAs m→l_ref once and never
        # reads m again; each program owns a disjoint lane slice), so the
        # HBM buffers can alias.
        input_output_aliases={0: 0},
        interpret=interpret,
    )(m_t, rhs_t)
    return l_t[:r, :r, :b], x_t[:r, :b], ld[0, :b]


def _tri_lt_blocked_call(l_t, z_t, interpret=False):
    r, _, b = l_t.shape
    bl = 128
    nb = _pick_nb(-(-r // 8) * 8, bl)
    rp = -(-r // nb) * nb
    bp = -(-b // bl) * bl
    l_t = jnp.pad(l_t, ((0, rp - r), (0, rp - r), (0, bp - b)))
    if rp > r:
        # unit diagonal on the padding keeps the blocked backward loop's
        # padded pivots finite (their z rows are zero → x rows zero)
        eye_pad = jnp.zeros((rp, rp, 1), l_t.dtype).at[
            jnp.arange(r, rp), jnp.arange(r, rp), 0
        ].set(1.0)
        l_t = l_t + eye_pad
    z_t = jnp.pad(z_t, ((0, rp - r), (0, bp - b)))
    x_t = pl.pallas_call(
        _tri_lt_blocked_kernel(rp, nb, bl),
        grid=(bp // bl,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rp, nb, bl), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(l_t, z_t)
    return x_t[:r, :b]


def _tri_lt_call(l_t, z_t, interpret=False):
    r, _, b = l_t.shape
    rp = -(-r // 8) * 8
    bl = _pick_bl(rp)
    if bl is None:
        return _tri_lt_blocked_call(l_t, z_t, interpret=interpret)
    bp = -(-b // bl) * bl
    l_t = jnp.pad(l_t, ((0, rp - r), (0, rp - r), (0, bp - b)))
    z_t = jnp.pad(z_t, ((0, rp - r), (0, bp - b)))
    x_t = pl.pallas_call(
        _tri_lt_kernel(r, rp),
        grid=(bp // bl,),
        in_specs=[
            pl.BlockSpec((rp, rp, bl), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, bl), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, bp), jnp.float32),
        interpret=interpret,
    )(l_t, z_t)
    return x_t[:r, :b]


def chol_pallas_enabled() -> bool:
    import os

    if os.environ.get("ICP_TPU_FORCE_CHOL_PALLAS") == "1":
        return True
    if os.environ.get("ICP_TPU_NO_CHOL_PALLAS") == "1":
        return False
    return jax.default_backend() == "tpu"


def _chol_solve_ref(m, rhs):
    chol = jnp.linalg.cholesky(m)
    x = jax.scipy.linalg.cho_solve((chol, True), rhs)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return chol, x, logdet


@functools.partial(jax.custom_batching.custom_vmap)
def chol_solve(m, rhs):
    """(chol(M), M⁻¹rhs, log det M) for one SPD [r,r] system.

    Under vmap over chains this dispatches to the batch-in-lanes Pallas
    kernel on TPU; unbatched (and off-TPU) it falls back to XLA's
    cholesky/cho_solve.
    """
    return _chol_solve_ref(m, rhs)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, m, rhs):
    m_b, rhs_b = in_batched
    if not m_b:
        m = jnp.broadcast_to(m, (axis_size,) + m.shape)
    if not rhs_b:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    if not chol_pallas_enabled() or not pallas_chol_supported(m.shape[-1]):
        return _chol_solve_ref(m, rhs), (True, True, True)
    interpret = jax.default_backend() != "tpu"
    l_t, x_t, ld = _chol_call(
        jnp.moveaxis(m, 0, 2), jnp.moveaxis(rhs, 0, 1), interpret=interpret
    )
    return (jnp.moveaxis(l_t, 2, 0), jnp.moveaxis(x_t, 1, 0), ld), (True, True, True)


@functools.partial(jax.custom_batching.custom_vmap)
def tri_solve_lt(chol, z):
    """Solve Lᵀ x = z for one lower-triangular [r,r] L (posterior sampling:
    α* = α̂ + L⁻ᵀz).  Batch-in-lanes Pallas kernel under vmap on TPU."""
    return jax.scipy.linalg.solve_triangular(chol, z, lower=True, trans=1)


@tri_solve_lt.def_vmap
def _tri_solve_lt_vmap(axis_size, in_batched, chol, z):
    c_b, z_b = in_batched
    if not c_b:
        chol = jnp.broadcast_to(chol, (axis_size,) + chol.shape)
    if not z_b:
        z = jnp.broadcast_to(z, (axis_size,) + z.shape)
    if not chol_pallas_enabled() or not pallas_chol_supported(chol.shape[-1]):
        out = jax.vmap(
            lambda c, zz: jax.scipy.linalg.solve_triangular(c, zz, lower=True, trans=1)
        )(chol, z)
        return out, True
    interpret = jax.default_backend() != "tpu"
    x_t = _tri_lt_call(
        jnp.moveaxis(chol, 0, 2), jnp.moveaxis(z, 0, 1), interpret=interpret
    )
    return jnp.moveaxis(x_t, 1, 0), True
