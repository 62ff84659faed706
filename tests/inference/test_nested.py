"""Nested sampling validated against closed-form evidences.

Exactness sources: Gaussian prior x Gaussian likelihood gives
log Z = sum_j log N(y_j; 0, sqrt(1 + sigma^2)); a Gaussian-mixture
likelihood stays closed-form because each component is Gaussian in q.
"""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference.nested import (
    NestedSamplingResult,
    column_nested_sampling,
    nested_sampling,
)


def _log_normal(x, mu, sigma):
    return -0.5 * ((x - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(
        2 * jnp.pi
    )


class TestNestedSamplingExact:
    def _gaussian_problem(self, d=2, sigma=0.5):
        y = jnp.asarray(np.linspace(0.4, 1.0, d), jnp.float32)

        def sample_prior(key, n):
            return jr.normal(key, (d, n))

        def log_prior(q):
            return jnp.sum(_log_normal(q, 0.0, 1.0), axis=0)

        def log_lik(q):
            return jnp.sum(_log_normal(q, y[:, None], sigma), axis=0)

        exact = float(
            jnp.sum(_log_normal(y, 0.0, jnp.sqrt(1.0 + sigma**2)))
        )
        return sample_prior, log_prior, log_lik, exact

    def test_gaussian_evidence(self):
        sample_prior, log_prior, log_lik, exact = self._gaussian_problem()
        res = jax.jit(
            lambda k: nested_sampling(
                sample_prior, log_prior, log_lik, k,
                n_live=200, n_iter=1600, n_mcmc=20, n_runs=16,
            )
        )(jr.key(0))
        assert isinstance(res, NestedSamplingResult)
        err = abs(float(res.log_z_mean) - exact)
        # theoretical per-run error sqrt(H/n_live) ~ 0.1; 16 runs
        assert err < 0.15, (
            f"logZ={float(res.log_z_mean):.3f} exact={exact:.3f} "
            f"(spread {float(res.log_z_std):.3f})"
        )
        # between-run spread should be of the same order as the classic
        # error estimate (mixing sanity), and never wildly larger
        assert float(res.log_z_std) < 5 * max(
            float(res.error_estimate()), 0.02
        )

    def test_dead_likelihoods_nondecreasing(self):
        sample_prior, log_prior, log_lik, _ = self._gaussian_problem()
        res = jax.jit(
            lambda k: nested_sampling(
                sample_prior, log_prior, log_lik, k,
                n_live=64, n_iter=300, n_mcmc=10, n_runs=4,
            )
        )(jr.key(1))
        diffs = jnp.diff(res.dead_log_lik, axis=1)
        assert bool(jnp.all(diffs >= -1e-5))
        # final live points all dominate the last dead point
        assert bool(
            jnp.all(res.live_log_lik >= res.dead_log_lik[:, -1:] - 1e-5)
        )

    def test_information_and_acceptance_sane(self):
        sample_prior, log_prior, log_lik, _ = self._gaussian_problem()
        res = jax.jit(
            lambda k: nested_sampling(
                sample_prior, log_prior, log_lik, k,
                n_live=128, n_iter=900, n_mcmc=15, n_runs=8,
            )
        )(jr.key(2))
        assert bool(jnp.all(jnp.isfinite(res.h)))
        assert bool(jnp.all(res.h > 0.0))
        # the step-scale controller should keep the walk alive
        assert 0.05 < float(jnp.mean(res.accept_rate)) < 0.9

    def test_bimodal_evidence(self):
        """Mixture likelihood under a wide prior: nested sampling must
        carry both modes through the shrinkage."""
        prior_sigma, s, a = 3.0, 0.3, 2.0

        def sample_prior(key, n):
            return prior_sigma * jr.normal(key, (1, n))

        def log_prior(q):
            return _log_normal(q[0], 0.0, prior_sigma)

        def log_lik(q):
            return jnp.logaddexp(
                _log_normal(q[0], -a, s), _log_normal(q[0], a, s)
            ) - jnp.log(2.0)

        marg = jnp.sqrt(prior_sigma**2 + s**2)
        exact = float(
            jnp.logaddexp(
                _log_normal(jnp.float32(-a), 0.0, marg),
                _log_normal(jnp.float32(a), 0.0, marg),
            )
            - jnp.log(2.0)
        )
        res = jax.jit(
            lambda k: nested_sampling(
                sample_prior, log_prior, log_lik, k,
                n_live=200, n_iter=1800, n_mcmc=20, n_runs=16,
            )
        )(jr.key(3))
        assert abs(float(res.log_z_mean) - exact) < 0.15
        # both modes survive in the pooled final live points
        live = np.asarray(res.live).reshape(-1)
        assert (live < 0).mean() > 0.15 and (live > 0).mean() > 0.15


class TestColumnBridge:
    @pytest.mark.slow
    def test_conjugate_model_evidence(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        obs = g.C["y"].set(1.2)
        exact = float(_log_normal(jnp.float32(1.2), 0.0, jnp.sqrt(1.25)))
        res, packer = column_nested_sampling(
            model, obs, (), ["mu"], jr.key(4),
            n_live=160, n_iter=1100, n_mcmc=15, n_runs=8,
        )
        assert abs(float(res.log_z_mean) - exact) < 0.2, (
            f"logZ={float(res.log_z_mean):.3f} exact={exact:.3f}"
        )
        # the weighted dead points are the posterior draws (live points
        # concentrate on the innermost likelihood shell, near mu = y)
        post_mean = 1.2 / 1.25
        assert abs(float(res.posterior_mean()[0]) - post_mean) < 0.1
        draws = res.resample_posterior(jr.key(9), 2000)
        post_var = 0.25 / 1.25
        assert abs(float(jnp.var(draws[:, 0])) - post_var) < 0.06

    @pytest.mark.slow
    def test_agrees_with_tempered_smc(self):
        """Cross-estimator consistency on a 2-latent model."""
        from genjax_tpu.inference.tempered import (
            geometric_ladder,
            tempered_smc,
        )

        @g.gen
        def model():
            loc = g.normal(0.0, 1.0) @ "loc"
            scale = g.log_normal(0.0, 0.3) @ "scale"
            _ = g.normal(loc, scale) @ "y"

        obs = g.C["y"].set(0.8)
        res, _ = column_nested_sampling(
            model, obs, (), ["loc", "scale"], jr.key(5),
            n_live=160, n_iter=1200, n_mcmc=15, n_runs=8,
        )
        sm = tempered_smc(
            jr.key(6), model, obs, (),
            n_particles=4096, betas=geometric_ladder(30),
        )
        assert abs(float(res.log_z_mean) - float(sm.log_marginal)) < 0.25
