"""Registration quality reporting.

Equivalent of reference ``api/other/RegistrationComparison.scala:24-49``.
"""
from __future__ import annotations

from icp_proposal_tpu.mesh import TriangleMesh
from icp_proposal_tpu.ops.metrics import (
    avg_and_max_distance_boundary_aware,
    avg_distance,
    hausdorff_distance,
)


def evaluate_reconstruction(tag: str, reconstruction: TriangleMesh,
                            ground_truth: TriangleMesh, verbose=True):
    """avg + Hausdorff vs ground truth (reference :24-29)."""
    avg = float(avg_distance(reconstruction, ground_truth))
    hd = float(hausdorff_distance(reconstruction, ground_truth))
    if verbose:
        print(f"ID: {tag} average2surface: {avg} hausdorff: {hd}")
    return avg, hd


def evaluate_reconstruction_boundary_aware(tag: str, reconstruction: TriangleMesh,
                                           ground_truth: TriangleMesh,
                                           gt_boundary_mask, verbose=True):
    """Boundary-aware (avg, max) variant (reference :31-48)."""
    avg, mx = avg_and_max_distance_boundary_aware(
        reconstruction, ground_truth, gt_boundary_mask
    )
    avg, mx = float(avg), float(mx)
    if verbose:
        print(f"ID: {tag} average2surface: {avg} max: {mx}")
    return avg, mx
