"""Poisson GLM: the log-posterior is strictly concave, so the Laplace
approximation (whose mode is found by the framework's own fit_map and
whose curvature is checked against a numpy finite-difference Hessian) is
the exact-enough reference for the MCMC posterior at moderate counts."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference import laplace_approximation, sample_posterior
from genjax_tpu.models import poisson_regression

rng = np.random.RandomState(0)
N, D = 40, 3
X = rng.randn(N, D).astype(np.float32) * 0.5
W_TRUE = np.asarray([0.8, -0.5, 0.3], np.float32)
Y = rng.poisson(np.exp(X @ W_TRUE)).astype(np.float32)
OBS = g.C["obs", jnp.arange(N), "y"].set(jnp.asarray(Y))


def neg_log_post(w):
    """−log p(w, y) up to a constant, in numpy (for the FD Hessian)."""
    eta = X @ w
    return 0.5 * w @ w + np.sum(np.exp(eta) - Y * eta)


class TestPoissonGLM:
    @pytest.mark.slow
    def test_laplace_mode_matches_numpy_optimum(self):
        model = poisson_regression(X)
        lap = laplace_approximation(
            jr.key(0), model, OBS, (), g.S["w"], n_steps=2000, learning_rate=0.05
        )
        w_map = np.asarray(lap.mean)
        # optimality: the numpy gradient at the framework's mode vanishes
        eta = X @ w_map
        grad = w_map + X.T @ (np.exp(eta) - Y)
        assert np.abs(grad).max() < 5e-2, grad
        # curvature: Laplace covariance == inverse FD Hessian
        eps = 1e-3
        H = np.zeros((D, D))
        for i in range(D):
            for j in range(D):
                e_i, e_j = np.eye(D)[i] * eps, np.eye(D)[j] * eps
                H[i, j] = (
                    neg_log_post(w_map + e_i + e_j)
                    - neg_log_post(w_map + e_i - e_j)
                    - neg_log_post(w_map - e_i + e_j)
                    + neg_log_post(w_map - e_i - e_j)
                ) / (4 * eps**2)
        cov_fd = np.linalg.inv(H)
        np.testing.assert_allclose(
            np.asarray(lap.cov), cov_fd, rtol=0.05, atol=1e-4
        )

    @pytest.mark.slow
    def test_mcmc_matches_laplace(self):
        model = poisson_regression(X)
        lap = laplace_approximation(
            jr.key(0), model, OBS, (), g.S["w"], n_steps=2000, learning_rate=0.05
        )
        res = sample_posterior(
            jr.key(1), model, OBS, (), g.S["w"],
            n_chains=32, n_warmup=200, n_samples=150, algorithm="hmc",
            eps0=0.1,
        )
        ws = np.asarray(res.positions[("w",)]).reshape(-1, D)
        np.testing.assert_allclose(
            ws.mean(axis=0), np.asarray(lap.mean), atol=0.05
        )
        np.testing.assert_allclose(
            ws.std(axis=0),
            np.sqrt(np.diag(np.asarray(lap.cov))),
            rtol=0.25,
        )


class TestPoissonGLMFast:
    def test_model_scores_and_simulates(self):
        """Fast-lane smoke: the family constructs, simulates, and its
        generate weight under full observation equals assess (GFI
        identity) — the exactness batteries above run in the slow lane."""
        model = poisson_regression(X)
        tr, w = model.generate(jr.key(1), OBS, ())
        score, _ = model.assess(tr.get_choices(), ())
        assert jnp.isfinite(score)
        assert float(score) == pytest.approx(
            float(tr.get_score()), abs=1e-3
        )
