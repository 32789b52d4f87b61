"""Native C++ host kernels vs the numpy reference implementations."""
import numpy as np
import pytest

from icp_proposal_tpu import native
from icp_proposal_tpu.models.synthetic import make_icosphere
from icp_proposal_tpu.ops.surface_index import _np_point_tri_dist2


@pytest.fixture(scope="module")
def sphere():
    points, cells = make_icosphere(subdivisions=2, radius=10.0)
    points = np.asarray(points, np.float32)
    tri = points[np.asarray(cells)]
    return points, tri


def test_point_tri_d2_matches_numpy(sphere, rng):
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    points, tri = sphere
    q = rng.randn(37, 3).astype(np.float64) * 12
    d2_native = native.point_tri_d2(q, tri)
    d2_np = _np_point_tri_dist2(q, tri.astype(np.float64))
    np.testing.assert_allclose(d2_native, d2_np, rtol=1e-10, atol=1e-10)


def test_shortlist_topk_matches_numpy(sphere, rng):
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    points, tri = sphere
    q = np.concatenate([points[::7], rng.randn(11, 3) * 15]).astype(np.float64)
    k = 16
    idx, d2 = native.shortlist_topk(q, tri, k)
    d2_full = _np_point_tri_dist2(q, tri.astype(np.float64))
    # ascending, distances consistent with the numpy evaluation of the same
    # faces, and genuinely the k smallest (near-ties may permute between the
    # two arithmetics, so compare distances, not index identity)
    assert np.all(np.diff(d2, axis=1) >= 0)
    np.testing.assert_allclose(
        d2, np.take_along_axis(d2_full, idx.astype(np.int64), axis=1),
        rtol=1e-9, atol=1e-12,
    )
    kth_true = np.sort(d2_full, axis=1)[:, :k]
    np.testing.assert_allclose(d2, kth_true, rtol=1e-9, atol=1e-12)


def test_build_surface_index_native_equals_fallback(sphere, monkeypatch, rng):
    """Functional equivalence of the two index builds: identical query
    answers (near-tie shortlist ordering may differ between arithmetics)."""
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    import jax.numpy as jnp

    from icp_proposal_tpu.ops import surface_index as si

    points, cells = make_icosphere(subdivisions=2, radius=10.0)
    idx_native = si.build_surface_index(points, cells, k=16)

    monkeypatch.setattr(native, "shortlist_topk", lambda *a, **kw: None)
    idx_np = si.build_surface_index(points, cells, k=16)
    assert idx_native.cand.shape == idx_np.cand.shape
    q = jnp.asarray(rng.randn(33, 3) * 11, jnp.float32)
    d2_a, _ = si.index_distances(idx_native, q)
    d2_b, _ = si.index_distances(idx_np, q)
    np.testing.assert_allclose(np.asarray(d2_a), np.asarray(d2_b),
                               rtol=1e-6, atol=1e-6)
