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
                       diag_coeffs: int = 8):
    """Run vmapped chains sharded over the mesh; returns (final carries,
    records, PooledStats).  Per-shard: scan over steps inside one program;
    diagnostics pooled with ``psum`` over the chain axis (rides ICI on a real
    slice — SURVEY §5.8 north-star mapping).

    When the step records coefficients (store_params=True), split-R̂ over the
    first ``diag_coeffs`` coefficients and ESS of coefficient 0 are pooled
    inside the shard via psum moment sums — the [C, T, r] traces never leave
    their shard for diagnostics.
    """

    n_chains = jax.tree.leaves(carries)[0].shape[0]

    def _diag(records, axis):
        if records.coeffs is None:
            return None, None
        tail = records.coeffs[:, burn_in:, :diag_coeffs]
        return (
            pooled_split_rhat(tail, axis),
            pooled_ess(tail[..., 0], axis),
        )

    def shard_fn(carries, keys):
        final, records = jax.vmap(
            lambda c, k: mh.run_chain(step, c, k, n_steps)
        )(carries, keys)

        # pooled diagnostics over ALL chains (local mean + psum)
        n_local = jnp.asarray(records.accepted.shape[0], jnp.float32)
        n_total = jax.lax.psum(n_local, axis_name)
        w = n_local / n_total

        acc = jax.lax.psum(
            w * jnp.mean(records.accepted[:, burn_in:].astype(jnp.float32)),
            axis_name,
        )
        coeffs = final.state.coeffs  # [local_chains, r]
        mean_local = jnp.mean(coeffs, axis=0)
        mean = jax.lax.psum(w * mean_local, axis_name)
        sq = jax.lax.psum(w * jnp.mean(coeffs * coeffs, axis=0), axis_name)
        var = sq - mean * mean
        lp = jax.lax.psum(w * jnp.mean(final.log_post), axis_name)
        rhat, ess = _diag(records, axis_name)
        return final, records, PooledStats(acc, mean, var, lp, rhat, ess)

    if mesh.devices.size == 1:
        # single-device fast path: collectives are identities, and shard_map
        # hangs on some experimental single-chip platforms (tunneled axon)
        @jax.jit
        def single(carries, keys):
            final, records = jax.vmap(
                lambda c, k: mh.run_chain(step, c, k, n_steps)
            )(carries, keys)
            acc = jnp.mean(records.accepted[:, burn_in:].astype(jnp.float32))
            coeffs = final.state.coeffs
            mean = jnp.mean(coeffs, axis=0)
            var = jnp.mean(coeffs * coeffs, axis=0) - mean * mean
            lp = jnp.mean(final.log_post)
            rhat, ess = _diag(records, None)
            return final, records, PooledStats(acc, mean, var, lp, rhat, ess)

        return single(carries, keys)

    spec = P(axis_name)
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        check_vma=False,
    )
    with mesh:
        return jax.jit(sharded)(carries, keys)
