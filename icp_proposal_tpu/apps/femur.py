"""Femur workload: data loading and experiment configurations.

Equivalent of the reference's ``apps/femur`` package: ``Paths.scala``,
``LoadTestData.scala`` (model + target, landmark-aligned at load time), and
the entry-point configurations of ``IcpProposalRegistration.scala`` /
``IcpRegistration.scala``.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict

import numpy as np

from icp_proposal_tpu.io.landmarks import common_landmarks, read_landmarks
from icp_proposal_tpu.io.statismo import read_statismo_gpmm
from icp_proposal_tpu.io.stl import read_stl
from icp_proposal_tpu.mesh import TriangleMesh, boundary_vertex_mask, make_mesh
from icp_proposal_tpu.models.gpmm import Gpmm
from icp_proposal_tpu.ops.rigid import rigid_landmark_alignment

FEMUR_DATA_DIR = os.environ.get("ICP_TPU_FEMUR_DATA", "/root/reference/data/femur")


@dataclass
class FemurData:
    model: Gpmm
    target: TriangleMesh
    model_landmarks: Dict[str, np.ndarray]
    target_landmarks: Dict[str, np.ndarray]
    target_boundary_mask: np.ndarray = field(default=None)
    model_boundary_mask: np.ndarray = field(default=None)


def load_femur_data(model_components: int = 50, data_dir: str | None = None) -> FemurData:
    """Load the femur GPMM + synthetic target, rigidly aligning the target to
    the model frame via the shared landmarks (reference
    ``LoadTestData.scala:32-50``: transform computed target→model landmarks
    with rotation center at the origin)."""
    data_dir = data_dir or FEMUR_DATA_DIR
    model = read_statismo_gpmm(
        os.path.join(data_dir, f"femur_gp_model_{model_components}-components.h5")
    )
    model_lms = read_landmarks(os.path.join(data_dir, "femur_reference.json"))
    points, cells = read_stl(os.path.join(data_dir, "femur_target.stl"))
    target_lms = read_landmarks(os.path.join(data_dir, "femur_target.json"))

    src, dst, names = common_landmarks(target_lms, model_lms)
    transform = rigid_landmark_alignment(src, dst, center=np.zeros(3))
    aligned_points = np.asarray(transform.apply(points.astype(np.float32)))
    aligned_lms = {n: np.asarray(transform.apply(target_lms[n][None, :]))[0] for n in target_lms}

    target = make_mesh(aligned_points, cells)
    return FemurData(
        model=model,
        target=target,
        model_landmarks=model_lms,
        target_landmarks=aligned_lms,
        target_boundary_mask=boundary_vertex_mask(cells, len(points)),
        model_boundary_mask=boundary_vertex_mask(
            np.asarray(model.cells), model.num_points
        ),
    )
