"""Pathfinder (inference/pathfinder.py) against exact Gaussian algebra.

On a Gaussian target the quadratic approximation is exact once L-BFGS has
accumulated full-rank curvature: the best-ELBO Gaussian must recover the
target's mean/covariance and its ELBO must equal log Z. The compact-form
inverse Hessian is additionally pinned against an explicit BFGS recursion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference.pathfinder import (
    _inverse_hessian,
    column_pathfinder,
    multi_pathfinder,
    pathfinder,
)

KEY = jax.random.key(11)


def _gaussian_target(m, cov):
    m = jnp.asarray(m, jnp.float32)
    prec = jnp.linalg.inv(jnp.asarray(cov, jnp.float32))

    def logp(z):
        d = z - m[:, None]
        return -0.5 * jnp.sum(d * (prec @ d), axis=0)

    return logp


class TestInverseHessian:
    def test_matches_explicit_bfgs_recursion(self):
        # dense BFGS inverse update: H+ = (I - rho s z^T) H (I - rho z s^T)
        #                                 + rho s s^T,  rho = 1/(s.z)
        rng = np.random.default_rng(0)
        dim, J = 4, 3
        S = rng.normal(size=(dim, J))
        Z = S * 2.0 + 0.3 * rng.normal(size=(dim, J))  # positive curvature
        gamma = float(S[:, -1] @ Z[:, -1] / (Z[:, -1] @ Z[:, -1]))
        H = gamma * np.eye(dim)
        for j in range(J):
            s, z = S[:, j], Z[:, j]
            rho = 1.0 / (s @ z)
            V = np.eye(dim) - rho * np.outer(s, z)
            H = V @ H @ V.T + rho * np.outer(s, s)
        got = _inverse_hessian(
            jnp.asarray(S, jnp.float32),
            jnp.asarray(Z, jnp.float32),
            jnp.ones((J,), jnp.float32),
            jnp.float32(gamma),
        )
        np.testing.assert_allclose(np.asarray(got), H, rtol=2e-4, atol=2e-4)

    def test_invalid_slots_contribute_zero(self):
        rng = np.random.default_rng(1)
        dim, J = 3, 4
        S = rng.normal(size=(dim, J)).astype(np.float32)
        Z = (S * 1.5).astype(np.float32)
        valid = jnp.asarray([0.0, 1.0, 0.0, 1.0])
        got = _inverse_hessian(jnp.asarray(S), jnp.asarray(Z), valid, 0.7)
        ref = _inverse_hessian(
            jnp.asarray(S[:, [1, 3]]),
            jnp.asarray(Z[:, [1, 3]]),
            jnp.ones((2,), jnp.float32),
            0.7,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


class TestPathfinderGaussian:
    def setup_method(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(3, 3))
        self.cov = np.asarray(a @ a.T + 2.0 * np.eye(3), np.float32)
        self.m = np.asarray([1.5, -0.5, 2.0], np.float32)

    def test_recovers_mean_cov_and_log_normalizer(self):
        res = pathfinder(
            KEY,
            _gaussian_target(self.m, self.cov),
            3,
            n_iters=40,
            history=6,
            n_elbo_samples=64,
            n_draws=4000,
        )
        np.testing.assert_allclose(np.asarray(res.mu), self.m, atol=0.02)
        np.testing.assert_allclose(
            np.asarray(res.scale_tril @ res.scale_tril.T),
            self.cov,
            rtol=0.05,
            atol=0.05,
        )
        log_z = 0.5 * 3 * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(
            self.cov
        )[1]
        assert float(res.elbo) == pytest.approx(float(log_z), abs=0.05)
        # draws carry consistent importance diagnostics
        assert res.draws.shape == (3, 4000)
        lw = np.asarray(res.logp - res.logq)
        # q == p up to log Z: the ratio must be (nearly) constant
        assert np.std(lw) < 0.1
        mean = np.asarray(jnp.mean(res.draws, axis=1))
        np.testing.assert_allclose(mean, self.m, atol=0.1)

    def test_elbo_trace_monotone_ish_and_finite_at_best(self):
        res = pathfinder(
            KEY, _gaussian_target(self.m, self.cov), 3, n_iters=30
        )
        assert np.isfinite(float(res.elbo))
        assert float(res.elbo) == pytest.approx(
            float(jnp.max(res.elbo_trace)), abs=1e-5
        )


class TestMultiPathfinder:
    @pytest.mark.slow
    def test_pooled_resampling_targets_posterior(self):
        cov = np.asarray([[1.0, 0.6], [0.6, 1.5]], np.float32)
        m = np.asarray([0.5, -1.0], np.float32)
        res = multi_pathfinder(
            KEY,
            _gaussian_target(m, cov),
            2,
            n_paths=4,
            n_resample=2000,
            n_iters=30,
            n_draws=500,
        )
        assert res.draws.shape == (2, 2000)
        np.testing.assert_allclose(np.asarray(res.mean()), m, atol=0.1)
        np.testing.assert_allclose(
            np.asarray(jnp.cov(res.draws)), cov, atol=0.2
        )
        # Gaussian target: the pooled ratios have no heavy tail
        assert float(res.pareto_k) < 0.7
        assert res.path_elbos.shape == (4,)

    @pytest.mark.slow
    def test_column_bridge_conjugate(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        post = column_pathfinder(
            KEY,
            model,
            g.C["y"].set(1.0),
            (),
            ["mu"],
            n_paths=4,
            n_iters=30,
            n_resample=2000,
        )
        # posterior N(0.8, 0.2)
        assert float(post.mean_choices()["mu"]) == pytest.approx(
            0.8, abs=0.05
        )
        chms = post.sample_choices(jax.random.key(2), 3000)
        draws = chms.get_submap("mu").get_value()
        assert float(jnp.std(draws)) == pytest.approx(
            np.sqrt(0.2), rel=0.15
        )
