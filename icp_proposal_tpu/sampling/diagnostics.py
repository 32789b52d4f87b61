"""Convergence diagnostics: split R-hat and effective sample size.

Not present in the reference (SURVEY §5.5 notes their absence); part of this
framework's north star (BASELINE.json): pooled R-hat/ESS over sharded chains
via collectives.  The functions here are pure jnp reductions, usable directly
inside ``shard_map`` with ``psum``-based pooling (see ``parallel/runner.py``).
"""
from __future__ import annotations

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
