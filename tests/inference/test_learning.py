"""MAP estimation (inference/learning.py) against closed forms."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.inference.learning import fit_map, laplace_approximation

KEY = jax.random.key(0)


class TestFitMAP:
    def test_conjugate_map_is_posterior_mode(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        res = fit_map(
            KEY, model, g.C["y"].set(2.0), (), g.S["mu"],
            n_steps=200, learning_rate=0.1,
        )
        # posterior N(1, 1/2): mode = 1
        assert float(res["mu"]) == pytest.approx(1.0, abs=0.01)
        import jax.scipy.stats as st

        expected_lj = st.norm.logpdf(1.0, 0.0, 1.0) + st.norm.logpdf(
            2.0, 1.0, 1.0
        )
        assert float(res.log_joint) == pytest.approx(
            float(expected_lj), abs=1e-3
        )

    def test_vector_regression_map(self):
        import numpy as np

        from genjax_tpu.models import linear_regression

        N, D = 20, 3
        rng = np.random.default_rng(0)
        X = rng.normal(size=(N, D)).astype(np.float32)
        w_true = np.asarray([1.0, -1.0, 0.5], np.float32)
        y = (X @ w_true + 0.25 * rng.normal(size=N)).astype(np.float32)
        model, exact_posterior = linear_regression(X)
        post_mean, _post_cov = exact_posterior(jnp.asarray(y))

        res = fit_map(
            KEY, model, g.C["y"].set(jnp.asarray(y)), (), g.S["w"],
            n_steps=400, learning_rate=0.05,
        )
        # gaussian posterior: mode == mean
        assert jnp.allclose(res["w"], post_mean, atol=0.01)

    @pytest.mark.slow
    def test_laplace_exact_on_gaussian_posterior(self):
        """Laplace is exact for Gaussian posteriors: mean, covariance, AND
        the evidence all match the conjugate closed forms (the evidence
        also cross-checks against the Kalman-style marginal)."""
        import numpy as np

        from genjax_tpu.inference.learning import laplace_approximation
        from genjax_tpu.models import linear_regression

        N, D = 20, 3
        rng = np.random.default_rng(1)
        X = rng.normal(size=(N, D)).astype(np.float32)
        y = (X @ np.asarray([1.0, -1.0, 0.5]) + 0.25 * rng.normal(size=N)).astype(
            np.float32
        )
        model, exact_posterior = linear_regression(X)
        post_mean, post_cov = exact_posterior(jnp.asarray(y))

        lap = laplace_approximation(
            KEY, model, g.C["y"].set(jnp.asarray(y)), (), g.S["w"],
            n_steps=400, learning_rate=0.05,
        )
        assert jnp.allclose(lap.mean, post_mean, atol=0.01)
        assert jnp.allclose(lap.cov, post_cov, atol=1e-3)
        # exact evidence: y ~ N(0, sigma^2 I + X X^T)
        S = 0.25**2 * jnp.eye(N) + X @ X.T
        sign, logdet = jnp.linalg.slogdet(2 * jnp.pi * S)
        exact_lml = -0.5 * (
            logdet + jnp.asarray(y) @ jnp.linalg.solve(S, jnp.asarray(y))
        )
        assert float(lap.log_marginal) == pytest.approx(
            float(exact_lml), abs=0.01
        )

    def test_restarts_escape_bad_inits(self):
        # bimodal: mu^2 observed; restarts find one of the modes ±2
        @g.gen
        def model():
            mu = g.normal(0.0, 3.0) @ "mu"
            _ = g.normal(mu * mu, 0.2) @ "y"

        res = fit_map(
            KEY, model, g.C["y"].set(4.0), (), g.S["mu"],
            n_steps=300, learning_rate=0.05, n_restarts=16,
        )
        assert abs(abs(float(res["mu"])) - 2.0) < 0.05
        # trajectory is monotone-ish toward the optimum
        assert float(res.trajectory[-1]) >= float(res.trajectory[0])


def test_laplace_non_positive_definite_surfaces_nan():
    """At a point where -H is not positive definite (here a local MINIMUM
    of the log-joint along z), the Gaussian approximation does not exist:
    log_marginal and cov must come back NaN, not silently-finite garbage."""

    @g.gen
    def saddle():
        z = g.uniform(-1e-3, 1e-3) @ "z"  # flat prior, zero curvature
        _ = g.normal(z * z, 0.1) @ "y"  # y=4: loglik curvature at 0 is +800

    lap = laplace_approximation(
        KEY, saddle, g.C["y"].set(4.0), (), g.S["z"],
        n_steps=0, n_restarts=2,
    )
    assert jnp.isnan(float(lap.log_marginal))
    assert bool(jnp.all(jnp.isnan(lap.cov)))
