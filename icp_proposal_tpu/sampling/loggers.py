"""Chain trace logging in the reference's JSON record schema.

The log IS the checkpoint/replay format (SURVEY §5.4): each record carries
index, proposal name, all named evaluator values, accept status, the full
pose (9 rigid params) + shape coefficients for accepted samples, and a
timestamp — byte-compatible with the reference's
``JSONAcceptRejectLogger.jsonLogFormat``
(``api/sampling/loggers/JSONAcceptRejectLogger.scala:35,93-106``): rejected
records carry empty parameter arrays.

Device→host path: the jitted chain produces stacked ``ChainRecord`` arrays
(one device→host transfer per run segment, not per step); this module
converts them to/from the JSON schema and provides the log-derived utilities
(best sample, state reconstruction, thinning for posterior analysis).
"""
from __future__ import annotations

import json
from datetime import datetime
from typing import Dict, List, Optional, Sequence

import numpy as np

from icp_proposal_tpu.sampling.state import FitState


def records_to_json_list(
    records,
    named_keys: Sequence[str],
    proposal_names: Sequence[str],
    start_index: int = 0,
) -> List[dict]:
    """Convert one chain's stacked ChainRecord (leading axis = steps) to the
    reference's record list.  Accepted records carry
    rigid = [t(3), rot(3), center(3)] and coeff; rejected carry empty arrays
    (reference behavior)."""
    acc = np.asarray(records.accepted)
    idx = np.asarray(records.proposal_idx)
    named = np.asarray(records.named, dtype=np.float64)
    coeffs = None if records.coeffs is None else np.asarray(records.coeffs, np.float64)
    pose = None if records.pose is None else np.asarray(records.pose, np.float64)
    now = datetime.now().strftime("%Y-%m-%d %H:%M:%S")

    out = []
    for t in range(acc.shape[0]):
        logvalue = {k: float(named[t, j]) for j, k in enumerate(named_keys)}
        accepted = bool(acc[t])
        rec = {
            "index": start_index + t,
            "name": proposal_names[int(idx[t])],
            "logvalue": logvalue,
            "status": accepted,
            "rigid": (
                [float(x) for x in pose[t]] if (accepted and pose is not None) else []
            ),
            "coeff": (
                [float(x) for x in coeffs[t]] if (accepted and coeffs is not None) else []
            ),
            "datetime": now,
        }
        out.append(rec)
    return out


def write_log(path, json_records: List[dict]) -> None:
    with open(path, "w") as f:
        json.dump(json_records, f, indent=2)


def load_log(path) -> List[dict]:
    with open(path) as f:
        return json.load(f)


def sample_to_state(record: dict, center_default=None) -> FitState:
    """Reconstruct a FitState from an accepted record
    (reference ``sampleToModelParameters``, :133-140)."""
    import jax.numpy as jnp

    r = record["rigid"]
    coeffs = jnp.asarray(record["coeff"], jnp.float32)
    return FitState(
        scale=jnp.asarray(1.0, jnp.float32),
        trans=jnp.asarray(r[0:3], jnp.float32),
        rot=jnp.asarray(r[3:6], jnp.float32),
        center=jnp.asarray(r[6:9], jnp.float32),
        coeffs=coeffs,
    )


def best_fitting_record(json_records: List[dict]) -> dict:
    """Argmax of logvalue["product"] over accepted records
    (reference ``getBestFittingParsFromJSON``, :142-146)."""
    accepted = [r for r in json_records if r["status"]]
    if not accepted:
        raise ValueError("no accepted samples in log")
    return max(accepted, key=lambda r: r["logvalue"]["product"])


def state_from_log(json_records: List[dict], mode: str = "best") -> FitState:
    """Reconstruct a resume/restart state from a chain log.

    mode="best": the MAP-under-product accepted record (the reference seeds
    further runs this way, ``getBestFittingParsFromJSON``,
    ``JSONAcceptRejectLogger.scala:142-146``).
    mode="last": the last accepted record — exact chain continuation
    (rejected records carry empty parameter arrays, so the chain state at
    the end of the log IS its last accepted record; reference
    ``LogHelper.samplesFromLog`` back-stepping semantics).
    """
    if mode == "best":
        return sample_to_state(best_fitting_record(json_records))
    if mode == "last":
        accepted = [r for r in json_records if r["status"]]
        if not accepted:
            raise ValueError("no accepted samples in log")
        return sample_to_state(accepted[-1])
    raise ValueError(f"unknown resume mode {mode!r} (want 'best' or 'last')")


def samples_from_log(
    json_records: List[dict], take_every_n: int = 50, total: Optional[int] = None,
    burn_in: int = 100
) -> List[dict]:
    """Thinning for posterior analysis: stride backwards to the nearest
    *accepted* record (reference ``LogHelper.samplesFromLog``,
    ``apps/util/LogHelper.scala:28-36``)."""
    total = total if total is not None else len(json_records)
    picked = []
    for i in range(burn_in, min(total, len(json_records)), take_every_n):
        j = i
        while j > 0 and not json_records[j]["status"]:
            j -= 1
        if json_records[j]["status"]:
            picked.append(json_records[j])
    return picked


# ------------------------------------------------------------------ stats

def acceptance_summary(
    records, proposal_names: Sequence[str], window: int = 100
) -> Dict[str, float]:
    """Acceptance rates: overall, per-proposal, and over the trailing window
    (reference ``printAcceptInfo``, :148-170).  Works on a single chain's
    stacked records."""
    acc = np.asarray(records.accepted, dtype=np.float64)
    idx = np.asarray(records.proposal_idx)
    out = {"overall": float(acc.mean())}
    for i, name in enumerate(proposal_names):
        sel = idx == i
        out[name] = float(acc[sel].mean()) if sel.any() else float("nan")
    tail_acc = acc[-window:]
    tail_idx = idx[-window:]
    out[f"last{window}"] = float(tail_acc.mean())
    for i, name in enumerate(proposal_names):
        sel = tail_idx == i
        if sel.any():
            out[f"last{window}/{name}"] = float(tail_acc[sel].mean())
    return out
