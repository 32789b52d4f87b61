"""Chain replay and posterior re-analysis from JSON logs.

Headless equivalents of reference ``apps/femur/ReplayFittingFromLog.scala``
and ``apps/femur/PosteriorVariabilityToMeshColor.scala`` (and the BFM
variants): the UI rendering is replaced by artifact export (mesh snapshots +
per-vertex scalar fields), per SURVEY §2.4 (UI row).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icp_proposal_tpu.models import gpmm as gp
from icp_proposal_tpu.sampling import loggers
from icp_proposal_tpu.sampling.state import transformed_points


def replay_states(json_records: List[dict], stride: int = 10) -> List:
    """Walk the log with the given stride, backing up to the nearest accepted
    record, and reconstruct the chain states (reference
    ``ReplayFittingFromLog.scala:54-66``)."""
    states = []
    for i in range(0, len(json_records), stride):
        j = i
        while j > 0 and not json_records[j]["status"]:
            j -= 1
        if json_records[j]["status"]:
            states.append(loggers.sample_to_state(json_records[j]))
    return states


def replay_meshes(gpmm, json_records: List[dict], stride: int = 10):
    """Decoded (posed) mesh snapshots along the chain."""
    states = replay_states(json_records, stride)
    return [np.asarray(transformed_points(gpmm, s)) for s in states]


def posterior_analysis(
    gpmm,
    json_records: List[dict],
    burn_in: int = 200,
    take_every_n: int = 50,
    out_dir: Optional[str] = None,
):
    """Posterior variability pipeline (reference
    ``PosteriorVariabilityToMeshColor.scala:30-65``): thin the log, decode
    sample meshes, compute MAP + total/normal variability maps; optionally
    export artifacts."""
    from icp_proposal_tpu.analysis.posterior_variability import (
        variability_map_normal,
        variability_map_total,
    )

    thinned = loggers.samples_from_log(
        json_records, take_every_n=take_every_n, burn_in=burn_in
    )
    if not thinned:
        raise ValueError("no accepted samples after burn-in/thinning")
    states = [loggers.sample_to_state(r) for r in thinned]
    sample_points = jnp.stack(
        [transformed_points(gpmm, s) for s in states]
    )  # [S, V, 3]

    best = loggers.best_fitting_record(json_records)
    map_state = loggers.sample_to_state(best)
    map_points = transformed_points(gpmm, map_state)

    total_map = variability_map_total(sample_points)
    normal_map = variability_map_normal(sample_points, gpmm.cells)

    result = {
        "num_samples": len(states),
        "map_points": np.asarray(map_points),
        "mean_points": np.asarray(jnp.mean(sample_points, axis=0)),
        "variability_total": np.asarray(total_map),
        "variability_normal": np.asarray(normal_map),
    }
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        from icp_proposal_tpu.io.scalar_field import write_scalar_field_ply
        from icp_proposal_tpu.io.stl import write_stl

        cells = np.asarray(gpmm.cells)
        write_stl(os.path.join(out_dir, "map.stl"), result["map_points"], cells)
        write_stl(os.path.join(out_dir, "mean.stl"), result["mean_points"], cells)
        write_scalar_field_ply(
            os.path.join(out_dir, "variability_total.ply"),
            result["mean_points"], cells, result["variability_total"],
        )
        write_scalar_field_ply(
            os.path.join(out_dir, "variability_normal.ply"),
            result["mean_points"], cells, result["variability_normal"],
        )
    return result
