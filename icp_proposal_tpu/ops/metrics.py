"""Mesh comparison metrics.

TPU-native equivalents of scalismo's ``MeshMetrics`` (call sites: reference
``api/other/RegistrationComparison.scala:24-48``,
``apps/femur/StdIcpVsChainICPrandomInitComparisonAll.scala:43-48``).
All metrics are reductions over the same batched closest-point kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from icp_proposal_tpu.mesh import TriangleMesh
from icp_proposal_tpu.ops.closest_point import (
    surface_distances_auto,
    closest_points_on_surface,
    nearest_vertex_of_faces,
    surface_distances,
)


def directed_distances(points, target: TriangleMesh):
    """Point→surface distances [P] from points to the target mesh."""
    d2, _ = surface_distances_auto(points, target.triangles())
    return jnp.sqrt(d2)


def avg_distance(mesh_a: TriangleMesh, mesh_b: TriangleMesh):
    """Mean distance from mesh_a's vertices to mesh_b's surface
    (scalismo ``MeshMetrics.avgDistance`` convention: one-directional,
    averaged over mesh_a vertices)."""
    return jnp.mean(directed_distances(mesh_a.points, mesh_b))


def hausdorff_distance(mesh_a: TriangleMesh, mesh_b: TriangleMesh):
    """max of the two directed max point→surface distances
    (scalismo ``MeshMetrics.hausdorffDistance``)."""
    d_ab = jnp.max(directed_distances(mesh_a.points, mesh_b))
    d_ba = jnp.max(directed_distances(mesh_b.points, mesh_a))
    return jnp.maximum(d_ab, d_ba)


def dice_coefficient(mesh_a: TriangleMesh, mesh_b: TriangleMesh, key=None,
                     n_samples: int = 20000):
    """Volumetric Dice overlap 2·|A∩B| / (|A|+|B|), Monte-Carlo estimated with
    winding-number inside tests over the joint bounding box (scalismo
    voxelizes instead — ``MeshMetrics.diceCoefficient``; same quantity up to
    discretization)."""
    import jax

    from icp_proposal_tpu.ops.inside import points_inside

    key = key if key is not None else jax.random.PRNGKey(0)
    lo = jnp.minimum(jnp.min(mesh_a.points, axis=0), jnp.min(mesh_b.points, axis=0))
    hi = jnp.maximum(jnp.max(mesh_a.points, axis=0), jnp.max(mesh_b.points, axis=0))
    pts = lo + (hi - lo) * jax.random.uniform(key, (n_samples, 3))
    in_a = points_inside(pts, mesh_a.triangles())
    in_b = points_inside(pts, mesh_b.triangles())
    inter = jnp.sum(in_a & in_b)
    total = jnp.sum(in_a) + jnp.sum(in_b)
    return 2.0 * inter / jnp.maximum(total, 1)


def avg_and_max_distance_boundary_aware(
    mesh_a: TriangleMesh, mesh_b: TriangleMesh, boundary_mask_b
):
    """(avg, max) distance from mesh_a vertices to mesh_b's surface, excluding
    correspondences whose nearest mesh_b vertex is on the boundary.

    Masked-reduction formulation of reference
    ``RegistrationComparison.scala:31-48`` (which filters a variable-length
    list): excluded entries contribute 0 weight to the mean and -inf to the
    max, keeping shapes static under jit.
    """
    tri = mesh_b.triangles()
    cp, d2, face_idx = closest_points_on_surface(mesh_a.points, tri)
    near_ids = nearest_vertex_of_faces(mesh_b.cells, face_idx, cp, mesh_b.points)
    keep = ~boundary_mask_b[near_ids]
    d = jnp.sqrt(d2)
    wsum = jnp.maximum(jnp.sum(keep), 1)
    avg = jnp.sum(jnp.where(keep, d, 0.0)) / wsum
    mx = jnp.max(jnp.where(keep, d, -jnp.inf))
    return avg, mx
