"""Model comparison: WAIC and PSIS-LOO (Vehtari, Gelman & Gabry 2017).

No reference counterpart (the reference has no model-evaluation layer —
its closest notion is test-side tolerance checks,
`/root/reference/tests/inference/test_smc.py:31-57`).
Given a matrix of pointwise log-likelihoods ``log p(y_i | θ_s)`` over
posterior draws ``s`` and observations ``i`` — obtainable from any
framework posterior via one vmapped ``assess`` — these estimate expected
log pointwise predictive density (elpd):

- **WAIC**: lppd − p_waic with p_waic the posterior variance of the
  pointwise log-likelihood.
- **PSIS-LOO**: importance-sampled leave-one-out, the raw 1/p(y_i|θ)
  ratios stabilized by Pareto-smoothing the tail; the fitted shape k̂ per
  observation is the reliability diagnostic (k̂ > 0.7 ⇒ unreliable).

Everything is dense matrix math over (S, N) arrays — one jit, no host
loops; the Pareto fit is the closed-form Zhang & Stephens (2009)
profile-likelihood estimator, vectorized over observations.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..core.pytree import Pytree


@Pytree.dataclass
class ELPDResult(Pytree):
    """``elpd`` (sum over observations), its standard error, the
    effective-parameter count, the pointwise elpd contributions, and (LOO
    only) the per-observation Pareto k̂ diagnostics."""

    elpd: Any
    se: Any
    p_eff: Any
    pointwise: Any
    pareto_k: Any


def waic(log_lik) -> ELPDResult:
    """WAIC from pointwise log-likelihood draws ``(S, N)``."""
    log_lik = jnp.asarray(log_lik)
    s = log_lik.shape[0]
    lppd_i = logsumexp(log_lik, axis=0) - jnp.log(s)
    p_i = jnp.var(log_lik, axis=0, ddof=1)
    elpd_i = lppd_i - p_i
    n = log_lik.shape[1]
    return ELPDResult(
        elpd=jnp.sum(elpd_i),
        se=jnp.sqrt(n * jnp.var(elpd_i, ddof=1)),
        p_eff=jnp.sum(p_i),
        pointwise=elpd_i,
        pareto_k=None,
    )


def _gpd_fit(x):
    """Zhang & Stephens (2009) profile-likelihood fit of the generalized
    Pareto shape k and scale σ to exceedances ``x (M,)`` (sorted
    ascending, all > 0). Returns ``(k, sigma)``. Vectorize with vmap."""
    m_pts = 80  # fixed grid: jit-static, matches the loo package's accuracy
    n = x.shape[0]
    x_star = x[(n + 1) // 4 - 1]  # lower quartile
    jj = jnp.arange(1, m_pts + 1)
    theta = 1.0 / x[-1] + (
        1.0 - jnp.sqrt(m_pts / (jj - 0.5))
    ) / (3.0 * x_star)

    def prof_loglik(t):
        k = -jnp.mean(jnp.log1p(-t * x))
        return n * (jnp.log(t / k) + k - 1.0)

    lw = jax.vmap(prof_loglik)(theta)
    w = jax.nn.softmax(lw)
    theta_hat = jnp.sum(w * theta)
    k_zs = -jnp.mean(jnp.log1p(-theta_hat * x))
    sigma = k_zs / theta_hat
    # Zhang & Stephens' k is the NEGATIVE of the standard GPD shape ξ
    # (scipy's `c`, Vehtari's k̂) — return the ξ convention
    return -k_zs, sigma


def _psis_smooth_column(lw, s):
    """Pareto-smooth ONE observation's log importance ratios ``lw (S,)``
    (Vehtari et al. 2017 §3.2). Returns ``(smoothed lw, k_hat)``."""
    import math

    # s is the static draw count (an array-shape Python int) — keep the
    # tail size static so the slice below stays jit-compatible
    m = min(int(math.ceil(3.0 * math.sqrt(s))), s // 5)
    order = jnp.argsort(lw)
    sorted_lw = lw[order]
    cutoff_idx = s - m - 1
    cutoff = sorted_lw[cutoff_idx]
    tail = sorted_lw[cutoff_idx + 1 :]  # (m,) largest
    exceed = jnp.exp(tail) - jnp.exp(cutoff)
    k, sigma = _gpd_fit(jnp.maximum(exceed, 1e-30))
    # replace the tail by expected order statistics of the fitted GPD
    p = (jnp.arange(1, m + 1) - 0.5) / m
    quantiles = jnp.where(
        jnp.abs(k) < 1e-6,
        -sigma * jnp.log1p(-p),
        sigma * (jnp.power(1.0 - p, -k) - 1.0) / k,
    )
    smoothed_tail = jnp.log(jnp.exp(cutoff) + quantiles)
    # truncate at the max raw weight (per the paper)
    smoothed_tail = jnp.minimum(smoothed_tail, sorted_lw[-1])
    new_sorted = sorted_lw.at[cutoff_idx + 1 :].set(smoothed_tail)
    out = jnp.zeros_like(lw).at[order].set(new_sorted)
    return out, k


def psis_loo(log_lik) -> ELPDResult:
    """PSIS-LOO from pointwise log-likelihood draws ``(S, N)``. The raw
    LOO importance ratios are ``−log_lik``; each observation's tail is
    Pareto-smoothed and the fitted k̂ reported (``pareto_k[i] > 0.7``
    flags an unreliable contribution)."""
    log_lik = jnp.asarray(log_lik)
    s, n = log_lik.shape
    if s < 25:
        # the Pareto tail needs ≥ ceil(3·√S) ≥ 5 exceedances to fit; with
        # fewer draws the smoothed estimate is meaningless — fail loudly
        # (under jit an empty-tail gather would silently produce garbage)
        raise ValueError(
            f"psis_loo needs at least 25 posterior draws, got {s}; use "
            "waic() or draw more samples"
        )
    raw_lw = -log_lik  # ∝ 1 / p(y_i | θ_s)
    raw_lw = raw_lw - jnp.max(raw_lw, axis=0, keepdims=True)
    lw, ks = jax.vmap(
        lambda col: _psis_smooth_column(col, s), in_axes=1, out_axes=(1, 0)
    )(raw_lw)
    lw = lw - logsumexp(lw, axis=0, keepdims=True)
    elpd_i = logsumexp(lw + log_lik, axis=0)
    lppd_i = logsumexp(log_lik, axis=0) - jnp.log(s)
    return ELPDResult(
        elpd=jnp.sum(elpd_i),
        se=jnp.sqrt(n * jnp.var(elpd_i, ddof=1)),
        p_eff=jnp.sum(lppd_i - elpd_i),
        pointwise=elpd_i,
        pareto_k=ks,
    )


def compare(results: dict) -> list:
    """Rank models by elpd: returns ``[(name, elpd, d_elpd, d_se), ...]``
    best first, with each row's elpd difference to the best and the SE of
    that difference (computed from the pointwise contributions)."""
    import numpy as np

    items = sorted(
        results.items(), key=lambda kv: float(kv[1].elpd), reverse=True
    )
    best = items[0][1]
    rows = []
    for name, res in items:
        # ArviZ convention: elpd_diff = model − best (≤ 0; 0 for the best)
        diff = np.asarray(res.pointwise) - np.asarray(best.pointwise)
        rows.append(
            (
                name,
                float(res.elpd),
                float(diff.sum()),
                float(np.sqrt(len(diff) * diff.var(ddof=1)))
                if len(diff) > 1
                else 0.0,
            )
        )
    return rows
