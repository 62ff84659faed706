"""EllipticalSlice edit request vs conjugate closed forms on real @gen
traces (scalar, vector, and correlated-prior models)."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference.mcmc import mh
from genjax_tpu.inference.requests import EllipticalSlice

N_CHAINS = 512
N_STEPS = 120


def run_chains(model, constraint, req, key, n_chains=N_CHAINS, n_steps=N_STEPS):
    def one(k):
        k0, k1 = jr.split(k)
        tr, _ = model.generate(k0, constraint, ())

        def step(t, kk):
            t2, _ = mh(kk, t, req)
            return t2, None

        tr, _ = jax.lax.scan(step, tr, jr.split(k1, n_steps))
        return tr

    return jax.jit(jax.vmap(one))(jr.split(key, n_chains))


class TestScalarConjugate:
    def test_normal_normal_posterior(self):
        """mu ~ N(2, 1.5); y ~ N(mu, 0.5), y = 3.1:
        posterior N(m, v) with v = 1/(1/1.5² + 1/0.5²), m = v(2/1.5² + 3.1/0.5²)."""

        @g.gen
        def model():
            mu = g.normal(2.0, 1.5) @ "mu"
            g.normal(mu, 0.5) @ "y"

        v = 1.0 / (1.0 / 1.5**2 + 1.0 / 0.5**2)
        m = v * (2.0 / 1.5**2 + 3.1 / 0.5**2)
        req = EllipticalSlice(g.S["mu"], mean=2.0, chol=1.5)
        trs = run_chains(model, g.C["y"].set(3.1), req, jr.key(0))
        mus = np.asarray(trs.get_choices()["mu"])
        np.testing.assert_allclose(mus.mean(), m, atol=0.05)
        np.testing.assert_allclose(mus.var(), v, rtol=0.15)

    def test_weight_is_zero_and_backward_is_same(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            g.normal(mu, 1.0) @ "y"

        tr, _ = model.generate(jr.key(1), g.C["y"].set(1.0), ())
        req = EllipticalSlice(g.S["mu"])
        new, w, _, bwd = tr.edit(jr.key(2), req)
        assert float(w) == 0.0
        assert isinstance(bwd, EllipticalSlice)
        # move actually moves (a.s.)
        assert float(new.get_choices()["mu"]) != float(tr.get_choices()["mu"])


class TestVectorConjugate:
    def test_linear_regression_posterior(self):
        """w ~ N(0, I_3); y ~ N(Xw, s I): posterior matches the conjugate
        closed form (mv_normal_diag prior → chol is the scalar 1.0)."""
        rng = np.random.RandomState(0)
        X = rng.randn(10, 3).astype(np.float32)
        s = 0.5
        y = (X @ np.asarray([1.0, -1.0, 0.5]) + s * rng.randn(10)).astype(
            np.float32
        )
        cov = np.linalg.inv(np.eye(3) + X.T @ X / s**2)
        m_post = cov @ (X.T @ y) / s**2

        from genjax_tpu.dists import mv_normal_diag

        @g.gen
        def model():
            w = mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
            mv_normal_diag(jnp.asarray(X) @ w, s * jnp.ones(10)) @ "y"

        req = EllipticalSlice(g.S["w"])
        trs = run_chains(model, g.C["y"].set(jnp.asarray(y)), req, jr.key(3))
        ws = np.asarray(trs.get_choices()["w"])
        np.testing.assert_allclose(ws.mean(axis=0), m_post, atol=0.06)
        np.testing.assert_allclose(
            ws.std(axis=0), np.sqrt(np.diag(cov)), rtol=0.2
        )


class TestCorrelatedPrior:
    @pytest.mark.slow
    def test_full_cholesky_prior(self):
        """w ~ N(0, Sigma) with off-diagonal Sigma, one Gaussian
        observation of w[0]+w[1]: exact posterior from joint-Gaussian
        conditioning; EllipticalSlice takes the full Cholesky."""
        Sigma = np.asarray([[1.0, 0.7], [0.7, 1.0]], np.float32)
        s = 0.4
        obs = 1.2
        a = np.asarray([1.0, 1.0])
        # posterior: Sigma_post = (Sigma^-1 + a a^T/s^2)^-1
        cov = np.linalg.inv(np.linalg.inv(Sigma) + np.outer(a, a) / s**2)
        m_post = cov @ a * obs / s**2

        from genjax_tpu.dists import mv_normal

        @g.gen
        def model():
            w = mv_normal(jnp.zeros(2), jnp.asarray(Sigma)) @ "w"
            g.normal(w[0] + w[1], s) @ "y"

        chol = jnp.asarray(np.linalg.cholesky(Sigma))
        req = EllipticalSlice(g.S["w"], chol=chol)
        trs = run_chains(model, g.C["y"].set(obs), req, jr.key(4))
        ws = np.asarray(trs.get_choices()["w"])
        np.testing.assert_allclose(ws.mean(axis=0), m_post, atol=0.05)
        np.testing.assert_allclose(np.cov(ws.T), cov, atol=0.06)
