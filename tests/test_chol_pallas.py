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
