"""Posterior-variability maps over mesh vertices from thinned chain samples.

Equivalent of reference ``apps/util/PosteriorVariability.scala:30-73``:
  * total map: trace of the per-vertex 3×3 sample covariance;
  * normal map: variance of the displacement projected on the (mean or
    reference) vertex normal.

Inputs are batched vertex arrays (samples stacked on the leading axis), i.e.
the decoded meshes of thinned accepted samples
(``LogHelper.logSamples2shapes`` ≙ ``loggers.samples_from_log`` + decode).
Outputs are per-vertex scalar fields for color-mapped export
(``io/scalar_field.py``).
"""
from __future__ import annotations

import jax.numpy as jnp

from icp_proposal_tpu.mesh import vertex_normals


def variability_map_total(sample_points: jnp.ndarray) -> jnp.ndarray:
    """sample_points [S, V, 3] → [V] trace of per-vertex sample covariance
    (reference ``computeDistanceMapFromMeshesTotal``, :30-50)."""
    mean = jnp.mean(sample_points, axis=0, keepdims=True)
    centered = sample_points - mean
    # trace of covariance = mean squared deviation summed over xyz
    return jnp.mean(jnp.sum(centered * centered, axis=-1), axis=0)


def variability_map_normal(
    sample_points: jnp.ndarray, cells, use_mean_normals: bool = True,
    reference_points=None,
) -> jnp.ndarray:
    """sample_points [S, V, 3] → [V] variance of displacement along the
    vertex normal (reference ``computeDistanceMapFromMeshesNormal``, :52-73).

    Normals are taken from the mean mesh (default) or a supplied reference.
    """
    mean_pts = jnp.mean(sample_points, axis=0)
    normal_src = mean_pts if use_mean_normals else reference_points
    normals = vertex_normals(normal_src, cells)  # [V, 3]
    centered = sample_points - mean_pts[None]
    proj = jnp.einsum("svi,vi->sv", centered, normals)
    return jnp.var(proj, axis=0)
