"""Precomputed, static-shape context shared by proposals and evaluators."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_proposal_tpu.mesh import TriangleMesh, boundary_vertex_mask


class TargetContext(NamedTuple):
    """Everything the samplers need to know about the (static) target mesh."""

    points: jax.Array  # [Vt, 3]
    cells: jax.Array  # [Ft, 3]
    tri: jax.Array  # [Ft, 3, 3]
    boundary: jax.Array  # [Vt] bool


def build_target_context(target: TriangleMesh, boundary_mask=None) -> TargetContext:
    if boundary_mask is None:
        boundary_mask = boundary_vertex_mask(
            np.asarray(target.cells), target.num_points
        )
    return TargetContext(
        points=target.points,
        cells=target.cells,
        tri=target.triangles(),
        boundary=jnp.asarray(boundary_mask),
    )
