"""MCMC convergence diagnostics: split-R̂ and effective sample size.

No reference counterpart (SURVEY.md §5: no metrics/observability beyond
rendering) — production chain batches need convergence monitoring. All
diagnostics are pure reductions over the (chains, draws) axes, so they
compile to ICI collectives when the chain axis is sharded.
"""

from __future__ import annotations

import jax.numpy as jnp


def split_rhat(draws) -> jnp.ndarray:
    """Split-chain potential scale reduction factor (Gelman et al., BDA3 /
    Vehtari et al. 2021). ``draws``: (n_chains, n_draws[, ...]). Values
    near 1 indicate convergence."""
    n_chains, n_draws = draws.shape[0], draws.shape[1]
    half = n_draws // 2
    split = jnp.concatenate(
        [draws[:, :half], draws[:, half : 2 * half]], axis=0
    )
    m, n = split.shape[0], split.shape[1]
    chain_means = jnp.mean(split, axis=1)
    chain_vars = jnp.var(split, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b = n * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def ess(draws, max_lag: int | None = None) -> jnp.ndarray:
    """Bulk effective sample size via autocorrelation (Geyer initial
    positive sequence, vectorized with a fixed lag budget).
    ``draws``: (n_chains, n_draws)."""
    n_chains, n_draws = draws.shape[0], draws.shape[1]
    if max_lag is None:
        max_lag = min(n_draws - 1, 256)
    if max_lag < 1:
        # a single draw per chain carries no autocorrelation information:
        # tau = 1 (jnp.stack on zero lags would crash)
        return jnp.asarray(float(n_chains * n_draws))
    centered = draws - jnp.mean(draws, axis=1, keepdims=True)
    var = jnp.mean(centered**2, axis=1) + 1e-12

    def acf(lag):
        a = centered[:, : n_draws - lag]
        b = centered[:, lag:]
        return jnp.mean(jnp.mean(a * b, axis=1) / var)

    rhos = jnp.stack([acf(int(l)) for l in range(1, max_lag + 1)])
    # Geyer: sum consecutive pairs while positive
    pair_sums = rhos[0::2][: max_lag // 2] + rhos[1::2][: max_lag // 2]
    positive = jnp.cumprod(pair_sums > 0)
    tau = 1.0 + 2.0 * jnp.sum(jnp.where(positive, pair_sums, 0.0))
    return n_chains * n_draws / tau


__all__ = ["ess", "split_rhat"]
