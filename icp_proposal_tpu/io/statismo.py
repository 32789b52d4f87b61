"""Statismo-format HDF5 GPMM IO.

Replaces scalismo's ``StatisticalModelIO.readStatisticalMeshModel`` (reference
call site ``apps/femur/LoadTestData.scala:35``).  Layout (verified against
``data/femur/femur_gp_model_50-components.h5``):

    representer/points   [3, V] f32   reference mesh vertices
    representer/cells    [3, F] i32   triangle indices
    model/mean           [3V]   f32   mean *shape* points, xyz-interleaved
    model/pcaBasis       [3V, r] f32  basis functions at vertices (NOT
                                      orthonormal — raw Nyström basis)
    model/pcaVariance    [r]    f32   per-component variance λ
    model/noiseVariance  [1]    f32

The GP is over displacement fields: mean displacement = mean − points, and an
instance is  x(α) = ref + μ + Φ (√λ ⊙ α).
"""
from __future__ import annotations

import numpy as np


def read_statismo_arrays(path):
    import h5py

    with h5py.File(path, "r") as f:
        points = np.asarray(f["representer/points"], dtype=np.float32).T  # [V,3]
        cells = np.asarray(f["representer/cells"], dtype=np.int32).T  # [F,3]
        mean_shape = np.asarray(f["model/mean"], dtype=np.float32).reshape(-1, 3)
        basis = np.asarray(f["model/pcaBasis"], dtype=np.float32)  # [3V, r]
        variance = np.asarray(f["model/pcaVariance"], dtype=np.float32)
        noise = float(np.asarray(f["model/noiseVariance"]).ravel()[0])
    v = points.shape[0]
    r = basis.shape[1]
    return {
        "points": points,
        "cells": cells,
        "mean_disp": mean_shape - points,
        "basis": basis.reshape(v, 3, r),
        "variance": variance,
        "noise_variance": noise,
    }


def read_statismo_gpmm(path):
    from icp_proposal_tpu.models.gpmm import make_gpmm

    arr = read_statismo_arrays(path)
    return make_gpmm(
        ref_points=arr["points"],
        cells=arr["cells"],
        mean_disp=arr["mean_disp"],
        basis=arr["basis"],
        variance=arr["variance"],
        noise_variance=arr["noise_variance"],
    )


def write_statismo_gpmm(path, gpmm) -> None:
    """Write a model in the statismo layout (round-trippable with our reader
    and with scalismo's)."""
    import h5py

    points = np.asarray(gpmm.ref_points, dtype=np.float32)
    cells = np.asarray(gpmm.cells, dtype=np.int32)
    mean_shape = points + np.asarray(gpmm.mean_disp, dtype=np.float32)
    v, _, r = gpmm.basis.shape
    with h5py.File(path, "w") as f:
        f.create_dataset("representer/points", data=points.T)
        f.create_dataset("representer/cells", data=cells.T)
        f["representer"].attrs["datasetType"] = np.bytes_("POLYGON_MESH")
        f.create_dataset("model/mean", data=mean_shape.reshape(-1))
        f.create_dataset(
            "model/pcaBasis",
            data=np.asarray(gpmm.basis, dtype=np.float32).reshape(3 * v, r),
        )
        f.create_dataset(
            "model/pcaVariance", data=np.asarray(gpmm.variance, dtype=np.float32)
        )
        f.create_dataset(
            "model/noiseVariance",
            data=np.asarray([gpmm.noise_variance], dtype=np.float32),
        )
        f.create_dataset("version/majorVersion", data=np.int32(0))
        f.create_dataset("version/minorVersion", data=np.int32(9))
