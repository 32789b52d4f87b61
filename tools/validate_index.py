"""Shortlist-index exactness sweep (VERDICT r1 item 7).

Validates ``ops/surface_index.index_closest`` against the dense exact kernel
in the regime that matters for random-init chains: queries from model
instances with coefficients ~ N(0, s²·I) AND perturbed poses (translation,
rotation), for a range of shortlist sizes K.  Writes the max absolute
distance error and mismatch fraction per (K, regime) to an artifact, so the
K=64 default's error bound is documented evidence rather than folklore.

Usage:
    python tools/validate_index.py [--components 50]
        [--out artifacts/index_validation.json]
"""
from __future__ import annotations

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import argparse
import json

import numpy as np


def perturbed_queries(data, key, coeff_scale, trans_mm, rot_rad, n_states=8,
                      stride=4):
    """Sampled chain-like states: coeffs ~ N(0, s²I), pose ~ U(±trans, ±rot)."""
    import jax
    import jax.numpy as jnp

    from icp_proposal_tpu.sampling.state import init_state, transformed_points

    out = []
    base = init_state(data.model)
    for i in range(n_states):
        k1, k2, k3, key = jax.random.split(jax.random.fold_in(key, i), 4)
        st = base._replace(
            coeffs=coeff_scale * jax.random.normal(k1, (data.model.rank,)),
            trans=trans_mm * jax.random.uniform(k2, (3,), minval=-1, maxval=1),
            rot=rot_rad * jax.random.uniform(k3, (3,), minval=-1, maxval=1),
        )
        pts = transformed_points(data.model, st)
        out.append(np.asarray(pts)[::stride])
    return np.concatenate(out, axis=0).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--components", type=int, default=50)
    ap.add_argument("--ks", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--out", default="artifacts/index_validation.json")
    args = ap.parse_args()

    import jax

    from icp_proposal_tpu.apps.femur import load_femur_data
    from icp_proposal_tpu.ops.surface_index import build_surface_index, validate_index

    data = load_femur_data(model_components=args.components)
    pts = np.asarray(data.target.points, np.float32)
    cells = np.asarray(data.target.cells)

    regimes = {
        "prior-s1.0": dict(coeff_scale=1.0, trans_mm=0.0, rot_rad=0.0),
        "prior-s2.5": dict(coeff_scale=2.5, trans_mm=0.0, rot_rad=0.0),
        "random-init": dict(coeff_scale=1.0, trans_mm=20.0, rot_rad=0.2),
        "far-init": dict(coeff_scale=2.0, trans_mm=50.0, rot_rad=0.5),
    }
    key = jax.random.PRNGKey(1024)
    queries = {name: perturbed_queries(data, key, **kw) for name, kw in regimes.items()}

    rows = []
    for k in args.ks:
        index = build_surface_index(pts, cells, k=k)
        for name, q in queries.items():
            max_err, max_rel, frac = validate_index(index, q, with_rel=True)
            rows.append({"k": k, "regime": name, "n_queries": int(q.shape[0]),
                         "max_abs_err_mm": max_err, "max_rel_err": max_rel,
                         "frac_mismatched": frac})
            print(f"K={k:4d} {name:12s} n={q.shape[0]:5d} "
                  f"max_err={max_err:.2e} mm rel={max_rel:.2e} "
                  f"frac>{1e-4:.0e}={frac:.4f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[validate_index] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
