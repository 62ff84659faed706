"""Convergence diagnostics: split-R̂ and bulk ESS against known regimes.

The bulk-ESS definition follows Vehtari et al. 2021 (split chains, pooled
``var_plus`` normalization): between-chain disagreement must DEFLATE the
estimate even when each chain looks locally well-mixed.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from genjax_tpu.inference.diagnostics import ess, split_rhat

jax.config.update("jax_platforms", "cpu")


def test_ess_iid_chains_near_total():
    draws = jr.normal(jr.key(0), (4, 500))
    e = float(ess(draws))
    assert 0.5 * 2000 < e <= 2000


def test_ess_autocorrelated_chain_matches_theory():
    # AR(1) with coefficient rho: ESS/N -> (1-rho)/(1+rho)
    rho = 0.9
    n = 4000
    eps = jr.normal(jr.key(1), (4, n))

    def chain(carry, e):
        x = rho * carry + jnp.sqrt(1 - rho**2) * e
        return x, x

    _, draws = jax.lax.scan(chain, jnp.zeros(4), eps.T)
    draws = draws.T
    expected = 4 * n * (1 - rho) / (1 + rho)
    e = float(ess(draws, max_lag=512))
    assert e == pytest.approx(expected, rel=0.5)


def test_ess_deflated_by_stuck_modes():
    """Chains stuck at different modes: per-chain autocorrelation is ~0,
    but cross-chain information is nil — bulk ESS must be tiny, not
    maximal (the within-chain-only normalization returned ~n_chains *
    n_draws here)."""
    noise = 0.05 * jr.normal(jr.key(2), (4, 400))
    modes = jnp.asarray([-10.0, -10.0, 10.0, 10.0])[:, None]
    draws = modes + noise
    total = 4 * 400
    assert float(ess(draws)) < 0.02 * total
    assert float(split_rhat(draws)) > 5.0


def test_ess_within_chain_drift_registers():
    """A slow trend inside each chain (unconverged) deflates ESS via the
    split-chain construction even with a single mode."""
    t = jnp.linspace(0.0, 4.0, 600)
    draws = t[None, :] + 0.05 * jr.normal(jr.key(3), (4, 600))
    assert float(ess(draws)) < 0.05 * (4 * 600)


def test_single_draw_degenerate():
    assert float(ess(jnp.ones((3, 1)))) == 3.0
