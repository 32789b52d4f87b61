"""Pallas closest-point kernel vs the jnp reference implementation.

On the CPU test platform the kernel runs in interpreter mode — slow but
bit-faithful to the kernel logic, so these tests validate the tiling,
padding, accumulator updates, and the custom_vmap batching rules.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_proposal_tpu.models.synthetic import make_icosphere
from icp_proposal_tpu.ops.closest_point import surface_distances
from icp_proposal_tpu.ops.closest_point_pallas import surface_distances_pallas


@pytest.fixture(scope="module")
def sphere():
    points, cells = make_icosphere(subdivisions=2, radius=10.0)
    tri = jnp.asarray(points)[jnp.asarray(cells)]
    return tri


def test_pallas_matches_jnp(sphere, rng):
    queries = jnp.asarray(rng.randn(37, 3) * 12, jnp.float32)  # non-multiple of 8
    d2_ref, idx_ref = surface_distances(queries, sphere)
    d2_pal, idx_pal = surface_distances_pallas(queries, sphere)
    np.testing.assert_allclose(np.asarray(d2_pal), np.asarray(d2_ref), rtol=1e-5, atol=1e-5)
    # faces may differ on exact ties; distances must agree regardless
    tri = np.asarray(sphere)
    np.testing.assert_array_equal(np.asarray(idx_pal) >= 0, True)
    assert (np.asarray(idx_pal) < tri.shape[0]).all()


def test_pallas_vmap_shared_triangles(sphere, rng):
    queries = jnp.asarray(rng.randn(4, 16, 3) * 12, jnp.float32)
    d2_pal, idx_pal = jax.vmap(
        lambda q: surface_distances_pallas(q, sphere)
    )(queries)
    d2_ref = jnp.stack([surface_distances(q, sphere)[0] for q in queries])
    np.testing.assert_allclose(np.asarray(d2_pal), np.asarray(d2_ref), rtol=1e-5, atol=1e-5)
    assert d2_pal.shape == (4, 16)


def test_pallas_vmap_batched_triangles(sphere, rng):
    """Per-chain current-mesh soups (the t2m evaluator path)."""
    tris = jnp.stack([sphere, sphere + 1.0, sphere * 1.1])
    queries = jnp.asarray(rng.randn(3, 9, 3) * 12, jnp.float32)
    d2_pal, _ = jax.vmap(surface_distances_pallas)(queries, tris)
    d2_ref = jnp.stack(
        [surface_distances(q, t)[0] for q, t in zip(queries, tris)]
    )
    np.testing.assert_allclose(np.asarray(d2_pal), np.asarray(d2_ref), rtol=1e-5, atol=1e-5)


def test_auto_dispatch_forced(sphere, rng, monkeypatch):
    from icp_proposal_tpu.ops import closest_point

    monkeypatch.setenv("ICP_TPU_FORCE_PALLAS", "1")
    queries = jnp.asarray(rng.randn(10, 3) * 12, jnp.float32)
    d2_auto, _ = closest_point.surface_distances_auto(queries, sphere)
    d2_ref, _ = surface_distances(queries, sphere)
    np.testing.assert_allclose(np.asarray(d2_auto), np.asarray(d2_ref), rtol=1e-5, atol=1e-5)
