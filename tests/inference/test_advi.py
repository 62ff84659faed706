"""ADVI (inference/advi.py) against exact Gaussian algebra.

Full-rank ADVI on a Gaussian target has the target itself as the ELBO
optimum, so mean, covariance, and the ELBO (= log Z at the optimum) all
have closed forms; mean-field on a correlated Gaussian converges to the
inverse-precision-diagonal variances (Kucukelbir et al. 2017 §3.2 /
standard VB factorization result). These pin the estimator, the
parameterization, and the optimizer wiring at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference.advi import advi, column_advi

KEY = jax.random.key(7)


def _gaussian_target(m, cov):
    m = jnp.asarray(m, jnp.float32)
    prec = jnp.linalg.inv(jnp.asarray(cov, jnp.float32))

    def logp(z):  # (D, K) -> (K,), unnormalized
        d = z - m[:, None]
        return -0.5 * jnp.sum(d * (prec @ d), axis=0)

    return logp


class TestFullRank:
    def setup_method(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(3, 3))
        self.cov = np.asarray(a @ a.T + 3.0 * np.eye(3), np.float32)
        self.m = np.asarray([1.0, -2.0, 0.5], np.float32)

    def test_recovers_mean_and_covariance(self):
        res = advi(
            KEY,
            _gaussian_target(self.m, self.cov),
            3,
            rank="full",
            n_steps=2000,
            n_samples=32,
            learning_rate=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.mu), self.m, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(res.cov), self.cov, atol=0.15, rtol=0.05
        )

    def test_elbo_is_log_normalizer_at_optimum(self):
        # target is unnormalized N(m, cov): log Z = D/2 log 2pi + 1/2 log|cov|
        res = advi(
            KEY,
            _gaussian_target(self.m, self.cov),
            3,
            rank="full",
            n_steps=2000,
            learning_rate=0.05,
            n_elbo_samples=2048,
        )
        log_z = 0.5 * 3 * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(
            self.cov
        )[1]
        assert float(res.elbo) == pytest.approx(float(log_z), abs=0.05)

    def test_stl_beats_entropy_noise_floor(self):
        # with q in the target's family, STL gradients vanish at the
        # optimum: the tail of the ELBO trace should be tighter than the
        # analytic-entropy estimator's sampling noise floor
        common = dict(rank="full", n_steps=2000, learning_rate=0.05)
        stl = advi(
            KEY, _gaussian_target(self.m, self.cov), 3,
            estimator="stl", **common,
        )
        ent = advi(
            KEY, _gaussian_target(self.m, self.cov), 3,
            estimator="entropy", **common,
        )
        tail = slice(-200, None)
        assert float(jnp.std(stl.elbo_trace[tail])) < float(
            jnp.std(ent.elbo_trace[tail])
        )
        # entropy estimator still converges to the same optimum
        log_z = 0.5 * 3 * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(
            self.cov
        )[1]
        assert float(ent.elbo) == pytest.approx(float(log_z), abs=0.2)

    def test_logq_matches_scipy(self):
        res = advi(
            KEY, _gaussian_target(self.m, self.cov), 3,
            rank="full", n_steps=50,
        )
        z = jax.random.normal(jax.random.key(1), (3, 5))
        from scipy.stats import multivariate_normal

        expected = multivariate_normal.logpdf(
            np.asarray(z).T, np.asarray(res.mu), np.asarray(res.cov)
        )
        np.testing.assert_allclose(
            np.asarray(res.logq(z)), expected, rtol=1e-4, atol=1e-4
        )
        # sample moments agree with (mu, cov)
        draws = res.sample(jax.random.key(2), 40000)
        np.testing.assert_allclose(
            np.asarray(jnp.mean(draws, axis=1)),
            np.asarray(res.mu),
            atol=0.05,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.cov(draws)), np.asarray(res.cov), atol=0.1
        )


class TestMeanField:
    def test_independent_gaussian_exact(self):
        cov = np.diag([0.25, 4.0]).astype(np.float32)
        m = np.asarray([2.0, -1.0], np.float32)
        res = advi(
            KEY, _gaussian_target(m, cov), 2,
            rank="diag", n_steps=2000, learning_rate=0.05,
        )
        np.testing.assert_allclose(np.asarray(res.mu), m, atol=0.03)
        np.testing.assert_allclose(
            np.asarray(res.sd), [0.5, 2.0], rtol=0.05
        )

    def test_correlated_gaussian_gives_inverse_precision_diag(self):
        # KL(q||p) optimum for factorized Gaussian q: mean = m,
        # var_i = 1 / prec_ii (NOT cov_ii) — the classic VB shrinkage
        import optax

        cov = np.asarray([[1.0, 0.8], [0.8, 1.0]], np.float32)
        m = np.asarray([0.3, -0.7], np.float32)
        # q can't match p here, so STL gradients do NOT vanish at the
        # optimum — decay the step size to kill the SGD noise floor
        # (learning_rate accepts any optax schedule)
        res = advi(
            KEY, _gaussian_target(m, cov), 2,
            rank="diag", n_steps=3000,
            learning_rate=optax.cosine_decay_schedule(0.05, 3000),
        )
        prec = np.linalg.inv(cov)
        expected_sd = 1.0 / np.sqrt(np.diag(prec))
        np.testing.assert_allclose(np.asarray(res.mu), m, atol=0.03)
        np.testing.assert_allclose(
            np.asarray(res.sd), expected_sd, rtol=0.06
        )

    def test_validation(self):
        with pytest.raises(ValueError, match="rank"):
            advi(KEY, _gaussian_target([0.0], [[1.0]]), 1, rank="banded")
        with pytest.raises(ValueError, match="estimator"):
            advi(
                KEY, _gaussian_target([0.0], [[1.0]]), 1,
                estimator="score",
            )


class TestColumnADVI:
    def test_conjugate_normal_normal(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        post = column_advi(
            KEY,
            model,
            g.C["y"].set(1.0),
            (),
            ["mu"],
            rank="full",
            n_steps=2000,
            learning_rate=0.05,
        )
        # posterior: var = 1/(1 + 1/0.25) = 0.2, mean = 0.2 * (1/0.25) = 0.8
        assert float(post.mean_choices()["mu"]) == pytest.approx(
            0.8, abs=0.03
        )
        assert float(post.result.sd[0]) == pytest.approx(
            np.sqrt(0.2), rel=0.08
        )
        chms = post.sample_choices(jax.random.key(3), 4000)
        draws = chms.get_submap("mu").get_value()
        assert draws.shape == (4000,)
        assert float(jnp.mean(draws)) == pytest.approx(0.8, abs=0.05)
        # padding dims (packer pads 1 -> 8) must fit N(0, 1) exactly
        assert float(post.result.mu[1]) == pytest.approx(0.0, abs=0.06)
        assert float(post.result.sd[1]) == pytest.approx(1.0, rel=0.08)

    def test_constrained_address_rejected(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        with pytest.raises(ValueError, match="constrained"):
            column_advi(KEY, model, g.C["y"].set(1.0), (), ["y"])
