"""Batch-in-lanes Cholesky/solve kernels vs XLA reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _spd_batch(rng, b, r):
    a = rng.randn(b, r, r).astype(np.float32) * 0.2
    return jnp.asarray(np.einsum("bij,bkj->bik", a, a) + np.eye(r, dtype=np.float32))


@pytest.mark.parametrize("r", [16, 50])
def test_chol_solve_batched_matches_xla(rng, r, monkeypatch):
    monkeypatch.setenv("ICP_TPU_FORCE_CHOL_PALLAS", "1")
    from icp_proposal_tpu.ops.chol_pallas import chol_solve

    b = 5  # non-multiple of the lane block → exercises padding
    m = _spd_batch(rng, b, r)
    rhs = jnp.asarray(rng.randn(b, r).astype(np.float32))
    chol_p, x_p, ld_p = jax.vmap(chol_solve)(m, rhs)

    chol_r = jnp.linalg.cholesky(m)
    x_r = jax.vmap(lambda c, y: jax.scipy.linalg.cho_solve((c, True), y))(chol_r, rhs)
    ld_r = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_r, axis1=-2, axis2=-1)), axis=-1)

    np.testing.assert_allclose(np.asarray(chol_p), np.asarray(chol_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ld_p), np.asarray(ld_r), rtol=2e-4, atol=2e-4)


def test_tri_solve_lt_matches_xla(rng, monkeypatch):
    monkeypatch.setenv("ICP_TPU_FORCE_CHOL_PALLAS", "1")
    from icp_proposal_tpu.ops.chol_pallas import tri_solve_lt

    b, r = 3, 24
    m = _spd_batch(rng, b, r)
    chol = jnp.linalg.cholesky(m)
    z = jnp.asarray(rng.randn(b, r).astype(np.float32))
    x_p = jax.vmap(tri_solve_lt)(chol, z)
    x_r = jax.vmap(
        lambda c, zz: jax.scipy.linalg.solve_triangular(c, zz, lower=True, trans=1)
    )(chol, z)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_r), rtol=2e-3, atol=2e-3)


def test_chol_solve_unbatched_fallback(rng):
    from icp_proposal_tpu.ops.chol_pallas import chol_solve

    r = 12
    m = _spd_batch(rng, 1, r)[0]
    rhs = jnp.asarray(rng.randn(r).astype(np.float32))
    chol, x, ld = chol_solve(m, rhs)
    np.testing.assert_allclose(
        np.asarray(m @ x), np.asarray(rhs), rtol=1e-4, atol=1e-4
    )
    assert chol.shape == (r, r) and np.isfinite(float(ld))


def test_chol_blocked_matches_xla(rng, monkeypatch):
    """Blocked left-looking kernel (rank-200 path, VERDICT r2 item 4):
    multi-block shapes with rank not a multiple of the panel width must
    reproduce XLA's cholesky/solve/logdet.  nb is pinned small so the test
    exercises nblk=3 with identity padding (r=44 → rp=48)."""
    import icp_proposal_tpu.ops.chol_pallas as cp

    monkeypatch.setattr(cp, "_pick_nb", lambda r, bl=128: 16)
    r, b = 44, 5
    a = rng.randn(b, r, r).astype(np.float32)
    m = np.einsum("bij,bkj->bik", a, a) + 3 * np.eye(r, dtype=np.float32)
    rhs = rng.randn(b, r).astype(np.float32)
    l_t, x_t, ld = cp._chol_blocked_call(
        jnp.moveaxis(jnp.asarray(m), 0, 2),
        jnp.moveaxis(jnp.asarray(rhs), 0, 1),
        interpret=True,
    )
    l_got = np.moveaxis(np.asarray(l_t), 2, 0)
    x_got = np.moveaxis(np.asarray(x_t), 1, 0)
    l_ref = np.linalg.cholesky(m)
    x_ref = np.linalg.solve(m, rhs[..., None])[..., 0]
    ld_ref = 2 * np.log(np.diagonal(l_ref, axis1=1, axis2=2)).sum(1)
    np.testing.assert_allclose(l_got, l_ref, atol=5e-5)
    np.testing.assert_allclose(x_got, x_ref, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=1e-3, rtol=1e-5)

    # blocked L^T solve on the same factor
    z = rng.randn(b, r).astype(np.float32)
    x_tri = cp._tri_lt_blocked_call(
        jnp.moveaxis(jnp.asarray(l_ref.astype(np.float32)), 0, 2),
        jnp.moveaxis(jnp.asarray(z), 0, 1),
        interpret=True,
    )
    import scipy.linalg as sla

    x_tri_ref = np.stack([
        sla.solve_triangular(l_ref[i], z[i], lower=True, trans=1)
        for i in range(b)
    ])
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(x_tri), 1, 0), x_tri_ref, atol=1e-4, rtol=1e-3
    )


def test_pallas_chol_supported_covers_rank200():
    from icp_proposal_tpu.ops.chol_pallas import (
        _pick_bl,
        _pick_nb,
        pallas_chol_supported,
    )

    assert _pick_bl(200) is None  # monolithic working set exceeds VMEM
    assert _pick_nb(200) is not None  # blocked path takes over
    assert pallas_chol_supported(200)
    assert pallas_chol_supported(100)
