"""Dataset preparation: rigid alignment of scan meshes to a reference.

Equivalent of reference ``apps/femur/AlignShapes.scala:27-56`` (align all
SMIR femur meshes + landmarks to the model reference landmarks and write an
``aligned/`` tree) and the alignment half of ``apps/bfm/AlignShapes.scala``.
Runs on any directory of (mesh, landmark-json) pairs.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from icp_proposal_tpu.io.landmarks import common_landmarks, read_landmarks, write_landmarks
from icp_proposal_tpu.ops.rigid import rigid_landmark_alignment


def _read_mesh_any(path):
    from icp_proposal_tpu.io.ply import read_ply
    from icp_proposal_tpu.io.stl import read_stl

    if path.lower().endswith(".ply"):
        return read_ply(path)
    return read_stl(path)


def align_shapes(
    mesh_dir: str,
    landmark_dir: str,
    reference_landmarks_path: str,
    out_dir: str,
    scale: float = 1.0,
    verbose: bool = True,
) -> int:
    """Align every mesh in ``mesh_dir`` (by its landmarks in ``landmark_dir``,
    matched by basename) to the reference landmarks; write aligned meshes and
    landmarks under ``out_dir/{meshes,landmarks}``.  Returns #processed."""
    from icp_proposal_tpu.io.stl import write_stl

    model_lms = read_landmarks(reference_landmarks_path)
    meshes_out = os.path.join(out_dir, "meshes")
    lms_out = os.path.join(out_dir, "landmarks")
    os.makedirs(meshes_out, exist_ok=True)
    os.makedirs(lms_out, exist_ok=True)

    count = 0
    for fname in sorted(os.listdir(mesh_dir)):
        if not fname.lower().endswith((".stl", ".ply")):
            continue
        base = os.path.splitext(fname)[0]
        lm_path = os.path.join(landmark_dir, base + ".json")
        if not os.path.exists(lm_path):
            if verbose:
                print(f"skipping {fname}: no landmarks at {lm_path}")
            continue
        points, cells = _read_mesh_any(os.path.join(mesh_dir, fname))
        lms = read_landmarks(lm_path)
        if scale != 1.0:
            points = points * scale
            lms = {k: v * scale for k, v in lms.items()}
        src, dst, _ = common_landmarks(lms, model_lms)
        t = rigid_landmark_alignment(src, dst, center=np.zeros(3))
        aligned = np.asarray(t.apply(points.astype(np.float32)))
        aligned_lms = {
            k: np.asarray(t.apply(v[None, :].astype(np.float32)))[0]
            for k, v in lms.items()
        }
        write_stl(os.path.join(meshes_out, base + ".stl"), aligned, cells)
        write_landmarks(os.path.join(lms_out, base + ".json"), aligned_lms)
        count += 1
        if verbose:
            print(f"aligned {fname}")
    return count


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Rigid landmark alignment of a dataset")
    p.add_argument("mesh_dir")
    p.add_argument("landmark_dir")
    p.add_argument("reference_landmarks")
    p.add_argument("out_dir")
    p.add_argument("--scale", type=float, default=1.0)
    args = p.parse_args()
    align_shapes(
        args.mesh_dir, args.landmark_dir, args.reference_landmarks,
        args.out_dir, scale=args.scale,
    )
