import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Quality-parity evidence run: femur flagship, 10k samples, multi-chain.

Writes artifacts/quality_femur.json with final metrics + acceptance rates,
the chain log (reference schema), and posterior-variability artifacts.
"""
import json
import time

import jax
import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")


def main():
    from icp_proposal_tpu.apps.femur import load_femur_data, make_icp_proposal_setup
    from icp_proposal_tpu.analysis.replay import posterior_analysis
    from icp_proposal_tpu.ops.metrics import avg_distance, hausdorff_distance
    from icp_proposal_tpu.registration.sampling_registration import SamplingRegistration
    from icp_proposal_tpu.sampling.state import transformed_mesh

    os.makedirs(OUT_DIR, exist_ok=True)
    n_samples = int(os.environ.get("QUALITY_SAMPLES", "10000"))
    n_chains = int(os.environ.get("QUALITY_CHAINS", "16"))
    components = int(os.environ.get("QUALITY_COMPONENTS", "50"))

    data = load_femur_data(components)
    ctx, mixture, evaluator = make_icp_proposal_setup(data)

    # shortlist-index exactness guard (ADVICE r1): every quality run records
    # the index-vs-dense error on prior-draw states before trusting the chain
    index_check = None
    if ctx.index is not None:
        from icp_proposal_tpu.models import gpmm as gp
        from icp_proposal_tpu.ops.surface_index import validate_index

        key = jax.random.PRNGKey(7)
        pts = gp.instance_points(
            data.model, jax.random.normal(key, (data.model.rank,))
        )
        max_err, max_rel, frac = validate_index(
            ctx.index, np.asarray(pts)[::4], with_rel=True
        )
        index_check = {"max_abs_err_mm": max_err, "max_rel_err": max_rel,
                       "frac_mismatched": frac}
        print(f"[quality] index check: {index_check}")
    reg = SamplingRegistration(
        data.model, data.target, mixture, evaluator,
        accept_info_interval=2000, verbose=True,
    )
    t0 = time.time()
    res = reg.runfitting(
        n_samples, n_chains=n_chains,
        json_path=os.path.join(OUT_DIR, "quality_femur_chain.json"),
    )
    elapsed = time.time() - t0

    best_mesh = transformed_mesh(data.model, res.best_state)
    avg = float(avg_distance(best_mesh, data.target))
    hd = float(hausdorff_distance(best_mesh, data.target))

    # posterior-mean coefficients over the second half of all chains
    acc = np.asarray(res.records.accepted)
    coeffs = np.asarray(res.records.coeffs)
    # build chain-state traces (candidate coeffs where accepted, ffill)
    states = np.empty_like(coeffs)
    cur = np.zeros_like(coeffs[:, 0])
    for t in range(coeffs.shape[1]):
        cur = np.where(acc[:, t][:, None], coeffs[:, t], cur)
        states[:, t] = cur
    posterior_mean = states[:, n_samples // 2:, :].reshape(-1, coeffs.shape[-1]).mean(axis=0)
    posterior_sd = states[:, n_samples // 2:, :].reshape(-1, coeffs.shape[-1]).std(axis=0)

    post = posterior_analysis(
        data.model, res.json_records, burn_in=min(200, n_samples // 5),
        take_every_n=50, out_dir=os.path.join(OUT_DIR, "posterior"),
    )

    summary = {
        "samples": n_samples,
        "chains": n_chains,
        "components": components,
        "elapsed_s": elapsed,
        "samples_per_sec": n_samples * n_chains / elapsed,
        "map_avg_distance_mm": avg,
        "map_hausdorff_mm": hd,
        "best_log_product": res.best_log_value,
        "acceptance": res.acceptance,
        "posterior_mean_coeffs_norm": float(np.linalg.norm(posterior_mean)),
        "posterior_mean_coeffs_first8": posterior_mean[:8].tolist(),
        "posterior_sd_mean": float(posterior_sd.mean()),
        "posterior_num_thinned": post["num_samples"],
        "variability_total_max": float(post["variability_total"].max()),
        "index_check": index_check,
    }
    with open(os.path.join(OUT_DIR, "quality_femur.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
