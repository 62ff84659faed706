"""Posterior predictive checked against the conjugate closed form:
mu ~ N(0,1), y ~ N(mu,1), observe y=2 ⇒ posterior mu ~ N(1, 1/2) and
predictive y_rep ~ N(1, 3/2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference import posterior_predictive, sample_posterior


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


class TestPosteriorPredictive:
    def test_closed_form_moments_from_dict(self):
        mus = 1.0 + jnp.sqrt(0.5) * jax.random.normal(
            jax.random.key(0), (20000,)
        )
        out = posterior_predictive(
            jax.random.key(1), conjugate, (), {"mu": mus}
        )
        y_rep = out["y"]
        assert y_rep.shape == (20000,)
        assert float(jnp.mean(y_rep)) == pytest.approx(1.0, abs=0.05)
        assert float(jnp.std(y_rep)) == pytest.approx(
            np.sqrt(1.5), abs=0.05
        )
        # Constrained sites replay the draws exactly.
        np.testing.assert_allclose(np.asarray(out["mu"]), np.asarray(mus))

    @pytest.mark.slow
    def test_end_to_end_from_sample_posterior(self):
        res = sample_posterior(
            jax.random.key(2), conjugate, g.C["y"].set(2.0), (), g.S["mu"],
            n_chains=128, n_warmup=100, n_samples=100, algorithm="hmc",
            eps0=0.3, L=8,
        )
        out = posterior_predictive(jax.random.key(3), conjugate, (), res)
        y_rep = np.asarray(out["y"])
        assert y_rep.shape == (128 * 100,)
        assert y_rep.mean() == pytest.approx(1.0, abs=0.1)
        assert y_rep.std() == pytest.approx(np.sqrt(1.5), abs=0.1)

    def test_subsampling_and_errors(self):
        mus = jnp.zeros((100,))
        out = posterior_predictive(
            jax.random.key(0), conjugate, (), {"mu": mus}, n_draws=10
        )
        assert out["y"].shape == (10,)
        with pytest.raises(ValueError, match="at least one site"):
            posterior_predictive(jax.random.key(0), conjugate, (), {})
        with pytest.raises(ValueError, match="disagree"):
            posterior_predictive(
                jax.random.key(0),
                conjugate,
                (),
                {"mu": jnp.zeros(5), "y": jnp.zeros(6)},
            )
