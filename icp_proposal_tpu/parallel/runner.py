"""Pod-scale chain sharding over a device mesh.

The reference's only parallelism is embarrassingly-parallel multi-chain
execution on JVM threads (``RunMHRandomInitComparison.scala:66-86``,
``StdIcp...scala:106-122``; SURVEY §2.4/§5.8).  TPU-native mapping:

    chains = batch dim  →  vmap within a chip, shard_map over the mesh
    collectives         →  only for pooled diagnostics (acceptance, R-hat/ESS
                           moments) and final gathers — chains never
                           communicate during stepping, so scaling is
                           embarrassingly efficient by construction.

Model/target arrays are replicated (they are MBs); chain state is sharded
along the ``chains`` axis.  Works identically on a virtual
``--xla_force_host_platform_device_count`` CPU mesh (tests, driver dryrun)
and a real TPU slice (``jax.distributed`` initialization is the caller's
responsibility on multi-host).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icp_proposal_tpu.sampling import mh
from icp_proposal_tpu.sampling.diagnostics import pooled_ess, pooled_split_rhat


class PooledStats(NamedTuple):
    """Cross-chain pooled diagnostics, computed with psum collectives."""

    acceptance: jax.Array  # [] pooled mean acceptance
    coeff_mean: jax.Array  # [r] pooled posterior mean of coefficients
    coeff_var: jax.Array  # [r] pooled posterior variance (between+within)
    log_post_mean: jax.Array  # []
    # convergence diagnostics over the post-burn-in coefficient traces,
    # pooled via psum moment sums (present only when the step records
    # coefficients, i.e. store_params=True)
    rhat: jax.Array | None = None  # [k] split-R̂ of first k coefficients
    ess: jax.Array | None = None  # [] ESS of coefficient 0


def make_chain_mesh(devices=None, axis_name: str = "chains") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def run_sharded_chains(step, carries, keys, n_steps: int, mesh: Mesh,
                       axis_name: str = "chains", burn_in: int = 0,
                       diag_coeffs: int = 8, segment_steps: int | None = None,
                       diag_max_lag: int = 100):
    """Run vmapped chains sharded over the mesh; returns (final carries,
    records, PooledStats).  Per-shard: scan over steps inside one program;
    diagnostics pooled with ``psum`` over the chain axis (rides ICI on a real
    slice — SURVEY §5.8 north-star mapping).

    When the step records coefficients (store_params=True), split-R̂ over the
    first ``diag_coeffs`` coefficients and ESS of coefficient 0 are pooled
    inside the shard via psum moment sums — the [C, T, r] traces never leave
    their shard for diagnostics.  ``records.coeffs`` is the post-step chain
    STATE trace (``ChainRecord`` docstring; VERDICT r3 item 1), so these are
    true MCMC convergence diagnostics of the held Markov chain, matching the
    reference's state-reconstruction semantics
    (``LogHelper.scala:28-36``).

    segment_steps: split the run into host-looped scan segments of at most
    this many steps (each ONE compiled program, reused across segments) and
    pool diagnostics once at the end over the concatenated device-resident
    records.  Identical math to the single-shot path when per-segment keys
    are folded the same way; needed on runtimes that kill executions running
    longer than ~a minute (the tunneled axon worker) and useful generally to
    bound program runtime at large step counts.
    """

    n_chains = jax.tree.leaves(carries)[0].shape[0]
    single_dev = mesh.devices.size == 1

    def _diag(records, axis):
        if records.coeffs is None:
            return None, None
        tail = records.coeffs[:, burn_in:, :diag_coeffs]
        return (
            pooled_split_rhat(tail, axis),
            pooled_ess(tail[..., 0], axis, max_lag=diag_max_lag),
        )

    def _stats(final, records, axis):
        if axis is not None:
            n_local = jnp.asarray(records.accepted.shape[0], jnp.float32)
            n_total = jax.lax.psum(n_local, axis)
            w = n_local / n_total
            psum = lambda x: jax.lax.psum(w * x, axis)  # noqa: E731
        else:
            psum = lambda x: x  # noqa: E731
        acc = psum(jnp.mean(records.accepted[:, burn_in:].astype(jnp.float32)))
        coeffs = final.state.coeffs  # [local_chains, r]
        mean = psum(jnp.mean(coeffs, axis=0))
        sq = psum(jnp.mean(coeffs * coeffs, axis=0))
        var = sq - mean * mean
        lp = psum(jnp.mean(final.log_post))
        rhat, ess = _diag(records, axis)
        return PooledStats(acc, mean, var, lp, rhat, ess)

    def _run(carries, keys, steps):
        """One scan segment + stats (single-shot path uses steps=n_steps)."""

        def shard_fn(carries, keys):
            final, records = jax.vmap(
                lambda c, k: mh.run_chain(step, c, k, steps)
            )(carries, keys)
            return final, records

        if single_dev:
            # single-device fast path: collectives are identities, and
            # shard_map hangs on some experimental single-chip platforms
            return jax.jit(shard_fn)(carries, keys)
        spec = P(axis_name)
        sharded = shard_map(
            shard_fn, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, spec), check_vma=False,
        )
        with mesh:
            return jax.jit(sharded)(carries, keys)

    def _pool(final, records):
        """Diagnostics-only program over the (possibly concatenated) records."""
        if single_dev:
            return jax.jit(lambda f, r: _stats(f, r, None))(final, records)
        spec = P(axis_name)
        sharded = shard_map(
            lambda f, r: _stats(f, r, axis_name),
            mesh=mesh, in_specs=(spec, spec), out_specs=P(),
            check_vma=False,
        )
        with mesh:
            return jax.jit(sharded)(final, records)

    if segment_steps is None or segment_steps >= n_steps:
        final, records = _run(carries, keys, n_steps)
        return final, records, _pool(final, records)

    # segmented host loop: same compiled segment reused (mh.run_chain caches
    # by (step, steps)); records stay device-resident and sharded
    carry = carries
    parts = []
    done = 0
    s_idx = 0
    while done < n_steps:
        n = min(segment_steps, n_steps - done)
        seg_keys = jax.vmap(lambda k: jax.random.fold_in(k, s_idx))(keys)
        carry, rec = _run(carry, seg_keys, n)
        parts.append(rec)
        done += n
        s_idx += 1
    records = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *parts)
    return carry, records, _pool(carry, records)
