"""Bayesian neural network family (models/bnn.py).

The ``hidden=()`` network is a conjugate linear regression, so the full
column pipeline (packer -> variational fit) is checked against the exact
posterior; the nonlinear case is checked by function recovery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.models.bnn import (
    bayesian_nn,
    bnn_exact_linear_posterior,
    bnn_predict,
)

KEY = jax.random.key(3)


class TestLinearExactness:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.X = rng.normal(size=(30, 3)).astype(np.float32)
        w_true = np.asarray([1.0, -0.5, 0.25], np.float32)
        self.y = (self.X @ w_true + 0.3 + 0.25 * rng.normal(size=30)).astype(
            np.float32
        )

    def test_simulate_assess_shapes(self):
        model, addresses, forward = bayesian_nn(self.X, hidden=())
        assert addresses == ["W0", "b0"]
        tr = model.simulate(KEY, ())
        assert tr.get_retval().shape == (30,)
        w, _ = model.assess(tr.get_choices(), ())
        assert float(w) == pytest.approx(float(tr.get_score()), abs=1e-4)

    @pytest.mark.slow
    def test_pathfinder_matches_conjugate_posterior(self):
        from genjax_tpu.inference.pathfinder import column_pathfinder

        model, addresses, forward = bayesian_nn(self.X, hidden=())
        post = column_pathfinder(
            KEY,
            model,
            g.C["y"].set(self.y),
            (),
            addresses,
            n_paths=2,
            n_iters=40,
            n_resample=4000,
            n_draws=2500,
        )
        mean, cov = bnn_exact_linear_posterior(self.X, self.y)
        # packer order is [W0 (3), b0 (1)]; dims 4.. are padding
        got_mean = np.asarray(post.result.mean())[:4]
        np.testing.assert_allclose(got_mean, np.asarray(mean), atol=0.03)
        got_cov = np.cov(np.asarray(post.result.draws[:4]))
        np.testing.assert_allclose(
            got_cov, np.asarray(cov), atol=0.015
        )

    def test_advi_matches_conjugate_posterior(self):
        from genjax_tpu.inference import column_advi

        model, addresses, _ = bayesian_nn(self.X, hidden=())
        post = column_advi(
            KEY,
            model,
            g.C["y"].set(self.y),
            (),
            addresses,
            rank="full",
            n_steps=2500,
            learning_rate=0.03,
        )
        mean, cov = bnn_exact_linear_posterior(self.X, self.y)
        np.testing.assert_allclose(
            np.asarray(post.result.mu)[:4], np.asarray(mean), atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(post.result.cov)[:4, :4],
            np.asarray(cov),
            atol=0.02,
        )


class TestNonlinear:
    @pytest.mark.slow
    def test_tanh_net_recovers_function(self):
        from genjax_tpu.inference.pathfinder import column_pathfinder

        rng = np.random.default_rng(1)
        X = np.linspace(-2.0, 2.0, 40).reshape(-1, 1).astype(np.float32)
        y = (np.sin(2.0 * X[:, 0]) + 0.1 * rng.normal(size=40)).astype(
            np.float32
        )
        model, addresses, forward = bayesian_nn(
            X, hidden=(8,), obs_scale=0.1, prior_scale=2.0
        )
        post = column_pathfinder(
            KEY,
            model,
            g.C["y"].set(y),
            (),
            addresses,
            n_paths=4,
            n_iters=150,
            history=10,
            n_resample=300,
        )
        # point prediction from the BEST path's mode (the pooled mean
        # averages across weight-space symmetries and washes the fit out)
        best = int(jnp.argmax(post.result.path_elbos))
        mode_chm = post.packer.unpack(post.result.paths.mu[best])
        pred = forward(mode_chm, X)[:, 0]
        rmse = float(jnp.sqrt(jnp.mean((pred - np.sin(2.0 * X[:, 0])) ** 2)))
        assert rmse < 0.15, rmse
        # posterior predictive over draws: finite sd, mean close too
        chms = post.sample_choices(jax.random.key(5), 200)
        mu, sd = bnn_predict(chms, X, forward)
        assert mu.shape == (40, 1) and sd.shape == (40, 1)
        assert float(jnp.max(sd)) < 1.0
        rmse_mu = float(
            jnp.sqrt(jnp.mean((mu[:, 0] - np.sin(2.0 * X[:, 0])) ** 2))
        )
        assert rmse_mu < 0.3, rmse_mu

    def test_validation(self):
        X = np.zeros((4, 2), np.float32)
        with pytest.raises(ValueError, match="activation"):
            bayesian_nn(X, activation="swishh")

    def test_deep_net_addresses_and_forward(self):
        X = np.random.default_rng(2).normal(size=(6, 2)).astype(np.float32)
        model, addresses, forward = bayesian_nn(
            X, hidden=(4, 3), d_out=2, activation="relu"
        )
        assert addresses == ["W0", "b0", "W1", "b1", "W2", "b2"]
        tr = model.simulate(KEY, ())
        out = forward(tr.get_choices(), X)
        assert out.shape == (6, 2)
        # forward at the trace's weights must reproduce the in-model
        # network: the sampled y sits within observation noise of it
        y_draw = np.asarray(tr.get_choices().get_submap("y").get_value())
        resid = y_draw - np.asarray(out.reshape(-1))
        assert np.max(np.abs(resid)) < 5 * 0.25, resid
