"""Convergence diagnostics: split R-hat and effective sample size.

Not present in the reference (SURVEY §5.5 notes their absence); part of this
framework's north star (BASELINE.json): pooled R-hat/ESS over sharded chains
via collectives.  The functions here are pure jnp reductions, usable directly
inside ``shard_map`` with ``psum``-based pooling (see ``parallel/runner.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def split_rhat(chains: jnp.ndarray) -> jnp.ndarray:
    """Split-R̂ (Gelman et al.): chains [C, T, ...] → R̂ [...].

    Each chain is split in half, giving 2C sequences; R̂ = sqrt(V̂/W) with
    between/within-variance decomposition.
    """
    c, t = chains.shape[0], chains.shape[1]
    t2 = t // 2
    halves = jnp.concatenate([chains[:, :t2], chains[:, t2 : 2 * t2]], axis=0)
    m = halves.shape[0]
    n = t2
    chain_means = jnp.mean(halves, axis=1)  # [2C, ...]
    chain_vars = jnp.var(halves, axis=1, ddof=1)  # [2C, ...]
    w = jnp.mean(chain_vars, axis=0)
    b = n * jnp.var(chain_means, axis=0, ddof=1)
    var_hat = (n - 1) / n * w + b / n
    return jnp.sqrt(var_hat / jnp.maximum(w, 1e-20))


def ess(chains: jnp.ndarray, max_lag: int = 100) -> jnp.ndarray:
    """Effective sample size via initial-positive-sequence autocorrelation
    (Geyer): chains [C, T, ...] → ESS [...]."""
    c, t = chains.shape[0], chains.shape[1]
    x = chains - jnp.mean(chains, axis=1, keepdims=True)
    var = jnp.mean(jnp.var(chains, axis=1, ddof=1), axis=0)

    max_lag = min(max_lag, t - 1)
    # autocovariance per lag, averaged over chains
    def rho(lag):
        prod = x[:, : t - lag] * x[:, lag:]
        return jnp.mean(jnp.mean(prod, axis=1), axis=0) / jnp.maximum(var, 1e-20)

    rhos = jnp.stack([rho(k) for k in range(1, max_lag + 1)])  # [L, ...]
    # truncate at first negative (approximate initial positive sequence)
    positive = jnp.cumprod(rhos > 0, axis=0).astype(rhos.dtype)
    tau = 1.0 + 2.0 * jnp.sum(rhos * positive, axis=0)
    return c * t / jnp.maximum(tau, 1.0)


def pooled_acceptance(accepted: jnp.ndarray) -> jnp.ndarray:
    """Mean acceptance over all chains/steps (use inside shard_map with psum
    for cross-host pooling)."""
    return jnp.mean(accepted.astype(jnp.float32))


# ---------------------------------------------------------------------------
# collective-pooled variants: identical quantities computed from per-shard
# moment sums + psum, so shard_map never gathers the [C, T, r] traces
# (the north-star mapping of SURVEY §5.8: diagnostics ride ICI collectives;
# the reference's analog is the host-side aggregation over its `.par`
# multi-chain fan-out, ``RunMHRandomInitComparison.scala:66-86``).
# With ``axis_name=None`` these reduce to exactly ``split_rhat`` / ``ess``
# on the local chains (used on the single-device fast path and in tests).
# ---------------------------------------------------------------------------


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def pooled_split_rhat(chains: jnp.ndarray, axis_name: str | None = None) -> jnp.ndarray:
    """Split-R̂ pooled over all shards: chains [C_local, T, ...] → R̂ [...].

    Equals ``split_rhat`` applied to the globally-gathered chains, but needs
    only O(r) psums of per-shard moment sums (chain-mean sums/squares and
    within-chain variances), never the traces themselves.
    """
    t = chains.shape[1]
    t2 = t // 2
    halves = jnp.concatenate([chains[:, :t2], chains[:, t2 : 2 * t2]], axis=0)
    n = t2
    chain_means = jnp.mean(halves, axis=1)  # [2C_local, ...]
    chain_vars = jnp.var(halves, axis=1, ddof=1)  # [2C_local, ...]
    m = _psum(jnp.asarray(halves.shape[0], jnp.float32), axis_name)
    s1 = _psum(jnp.sum(chain_means, axis=0), axis_name)
    s2 = _psum(jnp.sum(chain_means * chain_means, axis=0), axis_name)
    w = _psum(jnp.sum(chain_vars, axis=0), axis_name) / m
    gmean = s1 / m
    b = n * (s2 - m * gmean * gmean) / (m - 1.0)
    var_hat = (n - 1) / n * w + b / n
    return jnp.sqrt(var_hat / jnp.maximum(w, 1e-20))


def pooled_ess(chains: jnp.ndarray, axis_name: str | None = None,
               max_lag: int = 100) -> jnp.ndarray:
    """Geyer initial-positive-sequence ESS pooled over all shards:
    chains [C_local, T, ...] → ESS [...].  Equals ``ess`` on the gathered
    chains; psums only the [max_lag]-vector of autocovariance sums and the
    within-chain variance sum."""
    c_local, t = chains.shape[0], chains.shape[1]
    x = chains - jnp.mean(chains, axis=1, keepdims=True)
    c_total = _psum(jnp.asarray(c_local, jnp.float32), axis_name)
    var = _psum(jnp.sum(jnp.var(chains, axis=1, ddof=1), axis=0), axis_name) / c_total

    max_lag = min(max_lag, t - 1)

    def rho_sum(lag):
        prod = x[:, : t - lag] * x[:, lag:]
        return jnp.sum(jnp.mean(prod, axis=1), axis=0)

    sums = jnp.stack([rho_sum(k) for k in range(1, max_lag + 1)])  # [L, ...]
    rhos = _psum(sums, axis_name) / c_total / jnp.maximum(var, 1e-20)
    positive = jnp.cumprod(rhos > 0, axis=0).astype(rhos.dtype)
    tau = 1.0 + 2.0 * jnp.sum(rhos * positive, axis=0)
    return c_total * t / jnp.maximum(tau, 1.0)
