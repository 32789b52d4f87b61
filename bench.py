"""Benchmark: samples/s/chip on the femur GPMM-100 ICP-proposal chain.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor: the reference publishes no numbers (SURVEY §6) and the Scala
toolchain cannot be built in this environment (sbt needs network), so the
anchor is a **measured** single-core CPU port of the reference hot loop
(``tools/reference_baseline_port.py`` — same per-step algorithm: full-mesh
decode, KD-tree+exact closest-point correspondences both directions, two
r×r GP-posterior assemblies, compensated-projection transition densities,
4·rank-point evaluator; BLAS pinned to one thread).  Measured 38.15
samples/s on this machine (femur GPMM-100, 500 steps —
``artifacts/cpu_baseline.json``); the port is deliberately generous to the
JVM reference (vectorized numpy + KD-tree vs boxed-object BVH), so
``vs_baseline`` = value / 38.15 is a LOWER bound on the true speedup.
The north-star target (≥50×) corresponds to vs_baseline ≥ 50.
"""
import json
import time

CPU_SINGLE_CORE_BASELINE_MEASURED = 38.15  # samples/s (see module docstring)


def main():
    import os
    import sys

    import jax
    import jax.numpy as jnp

    from icp_proposal_tpu.apps.femur import load_femur_data, make_icp_proposal_setup
    from icp_proposal_tpu.sampling import mh
    from icp_proposal_tpu.sampling.state import init_state

    verbose = os.environ.get("BENCH_VERBOSE", "1") == "1"

    def log(msg):
        if verbose:
            print(f"[bench] {msg}", file=sys.stderr, flush=True)

    t = time.perf_counter()
    log(f"devices: {jax.devices()}")
    log(f"device init took {time.perf_counter() - t:.1f}s")

    n_chains = int(os.environ.get("BENCH_CHAINS", "2048"))
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))
    n_components = int(os.environ.get("BENCH_COMPONENTS", "100"))

    t = time.perf_counter()
    data = load_femur_data(model_components=n_components)
    log(f"load_femur_data took {time.perf_counter() - t:.1f}s")
    t = time.perf_counter()
    ctx, mixture, evaluator = make_icp_proposal_setup(data)
    step = mh.make_mh_step(data.model, mixture, evaluator, store_params=False)
    log(f"setup took {time.perf_counter() - t:.1f}s")

    t = time.perf_counter()

    @jax.jit
    def make_carries(s):
        c0 = mh.init_carry(data.model, evaluator, s, mixture)
        carries = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_chains,) + x.shape), c0
        )
        return carries, jax.random.split(jax.random.PRNGKey(0), n_chains)

    carries, keys = make_carries(init_state(data.model))
    jax.block_until_ready(carries)
    log(f"init carries (jit) took {time.perf_counter() - t:.1f}s")

    run = jax.jit(
        lambda c, k: jax.vmap(lambda ci, ki: mh.run_chain(step, ci, ki, n_steps))(c, k)
    )

    # NOTE: jax.block_until_ready alone is NOT sufficient on the tunneled
    # axon platform — it can return before the computation has actually run,
    # which silently inflated earlier measurements ~50×.  Fetching a scalar
    # derived from the result forces real completion.
    def force(x):
        return float(jnp.sum(x.log_post))

    # compile + warmup
    t = time.perf_counter()
    final, records = run(carries, keys)
    force(final)
    log(f"compile+first-run ({n_chains} chains x {n_steps} steps) took "
        f"{time.perf_counter() - t:.1f}s")

    t0 = time.perf_counter()
    final, records = run(final, jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys))
    force(final)
    dt = time.perf_counter() - t0

    samples_per_sec = n_chains * n_steps / dt
    print(
        json.dumps(
            {
                "metric": f"samples_per_sec_per_chip_femur_gpmm{n_components}_icp_proposal",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(
                    samples_per_sec / CPU_SINGLE_CORE_BASELINE_MEASURED, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
