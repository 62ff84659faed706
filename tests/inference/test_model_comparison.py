"""WAIC / PSIS-LOO vs closed forms: WAIC against the direct numpy
formula, the GPD fit against scipy ground truth, PSIS-LOO against the
EXACT analytic leave-one-out predictive of a conjugate Gaussian model,
and compare() ordering on a well- vs mis-specified pair."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from scipy.stats import genpareto, norm

from genjax_tpu.inference.model_comparison import (
    _gpd_fit,
    compare,
    psis_loo,
    waic,
)

rng = np.random.RandomState(0)


class TestWAIC:
    def test_matches_direct_formula(self):
        ll = rng.randn(200, 7).astype(np.float32) * 0.3 - 1.0
        res = waic(jnp.asarray(ll))
        lppd = np.log(np.exp(ll).mean(axis=0))
        p = ll.var(axis=0, ddof=1)
        elpd_i = lppd - p
        np.testing.assert_allclose(float(res.elpd), elpd_i.sum(), rtol=1e-4)
        np.testing.assert_allclose(float(res.p_eff), p.sum(), rtol=1e-4)
        np.testing.assert_allclose(
            float(res.se),
            np.sqrt(7 * elpd_i.var(ddof=1)),
            rtol=1e-4,
        )


class TestGPDFit:
    def test_recovers_shape_on_gpd_samples(self):
        for k_true in (0.1, 0.3, 0.6):
            x = np.sort(
                genpareto.rvs(k_true, scale=1.0, size=2000, random_state=1)
            ).astype(np.float32)
            k, sigma = _gpd_fit(jnp.asarray(x))
            np.testing.assert_allclose(float(k), k_true, atol=0.08)
            np.testing.assert_allclose(float(sigma), 1.0, rtol=0.15)


def conjugate_draws_and_loglik(ys, sigma, n_draws=4000, seed=2):
    """Posterior draws of mu for y_i ~ N(mu, sigma), mu ~ N(0, 1), and the
    (S, N) pointwise log-lik matrix."""
    n = len(ys)
    v = 1.0 / (1.0 + n / sigma**2)
    m = v * ys.sum() / sigma**2
    mus = m + np.sqrt(v) * np.random.RandomState(seed).randn(n_draws)
    ll = norm.logpdf(ys[None, :], mus[:, None], sigma)
    return mus, ll.astype(np.float32), (m, v)


def exact_loo_elpd(ys, sigma):
    """Exact leave-one-out: log p(y_i | y_{-i}) with the conjugate
    posterior from the other n-1 points."""
    n = len(ys)
    out = []
    for i in range(n):
        rest = np.delete(ys, i)
        v = 1.0 / (1.0 + (n - 1) / sigma**2)
        m = v * rest.sum() / sigma**2
        out.append(norm.logpdf(ys[i], m, np.sqrt(v + sigma**2)))
    return np.asarray(out)


class TestPSISLOO:
    ys = (rng.randn(12) * 0.8 + 0.5).astype(np.float32)
    sigma = 0.8

    def test_matches_exact_loo(self):
        _, ll, _ = conjugate_draws_and_loglik(self.ys, self.sigma)
        res = jax.jit(psis_loo)(jnp.asarray(ll))
        exact = exact_loo_elpd(self.ys, self.sigma)
        np.testing.assert_allclose(
            np.asarray(res.pointwise), exact, atol=0.05
        )
        np.testing.assert_allclose(
            float(res.elpd), exact.sum(), atol=0.3
        )
        # a well-specified conjugate model: every k-hat is small
        assert np.asarray(res.pareto_k).max() < 0.7

    @pytest.mark.slow
    def test_waic_agrees_with_loo_when_well_specified(self):
        _, ll, _ = conjugate_draws_and_loglik(self.ys, self.sigma)
        r_w = waic(jnp.asarray(ll))
        r_l = psis_loo(jnp.asarray(ll))
        np.testing.assert_allclose(
            float(r_w.elpd), float(r_l.elpd), atol=0.2
        )

    def test_too_few_draws_fails_loudly(self):
        import pytest

        with pytest.raises(ValueError, match="at least 25"):
            psis_loo(jnp.zeros((10, 4)))

    def test_compare_ranks_true_model_first(self):
        _, ll_good, _ = conjugate_draws_and_loglik(self.ys, self.sigma)
        # mis-specified: likelihood evaluated with a wrong (tiny) scale
        _, ll_bad, _ = conjugate_draws_and_loglik(self.ys, 0.2)
        rows = compare(
            {
                "good": psis_loo(jnp.asarray(ll_good)),
                "bad": psis_loo(jnp.asarray(ll_bad)),
            }
        )
        assert rows[0][0] == "good"
        assert rows[1][2] < 0.0  # bad model's elpd difference is negative
