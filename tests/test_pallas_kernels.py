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


def test_nearest_vertices_pallas(sphere, rng):
    from icp_proposal_tpu.ops.closest_point_pallas import nearest_vertices_pallas

    pts = jnp.asarray(np.asarray(sphere)[:, 0, :])  # vertex cloud
    queries = jnp.asarray(rng.randn(21, 3) * 12, jnp.float32)
    ids_pal = nearest_vertices_pallas(queries, pts)
    d2 = jnp.sum((queries[:, None] - pts[None]) ** 2, axis=-1)
    ids_ref = jnp.argmin(d2, axis=1)
    # distances must match (ids may differ on exact ties)
    d_pal = d2[jnp.arange(21), ids_pal]
    d_ref = d2[jnp.arange(21), ids_ref]
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref), rtol=1e-6)

    # vmapped, batched queries over shared points
    qb = jnp.asarray(rng.randn(3, 10, 3) * 12, jnp.float32)
    ids_b = jax.vmap(lambda q: nearest_vertices_pallas(q, pts))(qb)
    assert ids_b.shape == (3, 10)

    # vmapped with batched points (current-mesh case)
    ptsb = jnp.stack([pts, pts + 0.5])
    qb2 = jnp.asarray(rng.randn(2, 10, 3) * 12, jnp.float32)
    ids_b2 = jax.vmap(nearest_vertices_pallas)(qb2, ptsb)
    for i in range(2):
        d2i = jnp.sum((qb2[i][:, None] - ptsb[i][None]) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(d2i[jnp.arange(10), ids_b2[i]]),
            np.asarray(jnp.min(d2i, axis=1)),
            rtol=1e-6,
        )


def test_coarse_nearest_mxu(sphere, rng):
    """MXU dot-product coarse kernel: anchors must be near-optimal — the
    shifted metric (‖v‖² − 2q·v) may swap exact-arithmetic ties, but the
    chosen vertex's true distance must match the optimum to f32
    cancellation error (~‖v‖²·2⁻²⁴)."""
    from icp_proposal_tpu.ops.closest_point_pallas import coarse_nearest_mxu

    pts = jnp.asarray(np.asarray(sphere)[:, 0, :])  # vertex cloud, |v|~10
    queries = jnp.asarray(rng.randn(37, 3) * 12, jnp.float32)
    ids = coarse_nearest_mxu(queries, pts)
    d2 = jnp.sum((queries[:, None] - pts[None]) ** 2, axis=-1)
    chosen = d2[jnp.arange(queries.shape[0]), ids]
    best = jnp.min(d2, axis=1)
    np.testing.assert_allclose(np.asarray(chosen), np.asarray(best),
                               rtol=1e-4, atol=1e-4)

    # vmapped batched queries over a shared surface (the hot-path shape)
    qb = jnp.asarray(rng.randn(3, 10, 3) * 12, jnp.float32)
    ids_b = jax.vmap(lambda q: coarse_nearest_mxu(q, pts))(qb)
    assert ids_b.shape == (3, 10)
    for i in range(3):
        d2i = jnp.sum((qb[i][:, None] - pts[None]) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(d2i[jnp.arange(10), ids_b[i]]),
            np.asarray(jnp.min(d2i, axis=1)), rtol=1e-4, atol=1e-4)

    # batched points fall back to the exact subtractive kernel
    ptsb = jnp.stack([pts, pts + 0.5])
    qb2 = jnp.asarray(rng.randn(2, 10, 3) * 12, jnp.float32)
    ids_b2 = jax.vmap(coarse_nearest_mxu)(qb2, ptsb)
    for i in range(2):
        d2i = jnp.sum((qb2[i][:, None] - ptsb[i][None]) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(d2i[jnp.arange(10), ids_b2[i]]),
            np.asarray(jnp.min(d2i, axis=1)), rtol=1e-6)
