"""PPCA: the spectral ML solution is the gold standard every other path
(EM, the @gen model's density, the exact latent posterior) is checked
against; likelihoods are cross-checked with scipy's MVN."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from scipy.stats import multivariate_normal

import genjax_tpu as g
from genjax_tpu.models.ppca import (
    ppca_em,
    ppca_log_likelihood,
    ppca_ml,
    ppca_model,
    ppca_posterior,
)

D, Q, N = 5, 2, 400
rng = np.random.RandomState(0)
W_TRUE = rng.randn(D, Q).astype(np.float32)
MU_TRUE = rng.randn(D).astype(np.float32)
SIGMA = 0.4
X = (
    rng.randn(N, Q) @ W_TRUE.T + MU_TRUE + SIGMA * rng.randn(N, D)
).astype(np.float32)


class TestExactness:
    def test_log_likelihood_matches_scipy(self):
        cov = W_TRUE @ W_TRUE.T + SIGMA**2 * np.eye(D)
        expected = multivariate_normal.logpdf(X, MU_TRUE, cov).sum()
        got = ppca_log_likelihood(X, jnp.asarray(W_TRUE), MU_TRUE, SIGMA**2)
        np.testing.assert_allclose(float(got), expected, rtol=1e-4)

    def test_ml_is_a_local_maximum(self):
        """Any perturbation of the spectral solution can only lower the
        likelihood (ML optimality)."""
        W, mu, s2 = ppca_ml(X, Q)
        ll_star = float(ppca_log_likelihood(X, W, mu, s2))
        r = np.random.RandomState(1)
        for _ in range(6):
            dW = 0.05 * r.randn(D, Q).astype(np.float32)
            ll = float(
                ppca_log_likelihood(X, W + jnp.asarray(dW), mu, s2)
            )
            assert ll <= ll_star + 1e-3, (ll, ll_star)
        assert (
            float(ppca_log_likelihood(X, W, mu, s2 * 1.1)) <= ll_star
        )

    def test_ml_covariance_reproduces_top_subspace(self):
        W, mu, s2 = ppca_ml(X, Q)
        # the ML marginal covariance matches the sample covariance on the
        # principal subspace: C v = lambda v for top eigenvectors
        S = np.cov(np.asarray(X).T, bias=True)
        C = np.asarray(W @ W.T) + float(s2) * np.eye(D)
        evals, evecs = np.linalg.eigh(S)
        for k in (1, 2):  # top-2
            v = evecs[:, -k]
            np.testing.assert_allclose(
                C @ v, evals[-k] * v, rtol=1e-3, atol=1e-4
            )

    def test_em_converges_to_spectral_ml(self):
        W_ml, mu, s2_ml = ppca_ml(X, Q)
        ll_star = float(ppca_log_likelihood(X, W_ml, mu, s2_ml))
        (W_em, _, s2_em), lls = jax.jit(
            lambda: ppca_em(X, Q, n_iters=200)
        )()
        lls = np.asarray(lls)
        assert np.all(np.diff(lls) > -1e-2), "EM must ascend"
        ll_em = float(ppca_log_likelihood(X, W_em, mu, s2_em))
        np.testing.assert_allclose(ll_em, ll_star, rtol=1e-4)
        np.testing.assert_allclose(float(s2_em), float(s2_ml), rtol=0.02)


class TestGenModel:
    def test_model_score_matches_exact_density(self):
        model = ppca_model(W_TRUE, jnp.asarray(MU_TRUE), SIGMA)
        tr = model.simulate(jr.key(0), ())
        ch = tr.get_choices()
        z, x = np.asarray(ch["z"]), np.asarray(ch["x"])
        expected = multivariate_normal.logpdf(
            z, np.zeros(Q), np.eye(Q)
        ) + multivariate_normal.logpdf(
            x, W_TRUE @ z + MU_TRUE, SIGMA**2 * np.eye(D)
        )
        np.testing.assert_allclose(
            float(tr.get_score()), expected, rtol=1e-4
        )

    def test_latent_posterior_matches_generate_weights(self):
        """Importance weights from constraining x equal the exact marginal
        N(x; mu, WW^T + s2 I) — i.e. the model analytically integrates to
        the PPCA marginal."""
        model = ppca_model(W_TRUE, jnp.asarray(MU_TRUE), SIGMA)
        x_obs = X[0]
        mean_z, cov_z = ppca_posterior(
            jnp.asarray(x_obs), jnp.asarray(W_TRUE), MU_TRUE, SIGMA**2
        )
        # self-normalized IS with prior proposal: posterior-mean estimate
        keys = jr.split(jr.key(1), 60000)
        trs, ws = jax.jit(
            jax.vmap(
                lambda k: model.generate(k, g.C["x"].set(x_obs), ())
            )
        )(keys)
        w = np.exp(np.asarray(ws) - np.max(np.asarray(ws)))
        w /= w.sum()
        zs = np.asarray(trs.get_choices()["z"])
        np.testing.assert_allclose(
            w @ zs, np.asarray(mean_z), atol=0.08
        )
