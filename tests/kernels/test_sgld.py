"""Stochastic-gradient MCMC validated against EXACT discrete-chain
stationary laws (CLAUDE.md convention): ULA on a Gaussian has closed-form
stationary variance σ²/(1 − ε/(4σ²)); SGHMC is a linear AR system whose
stationary covariance solves a discrete Lyapunov equation."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from scipy.linalg import solve_discrete_lyapunov

from genjax_tpu.kernels.sgld import (
    full_grad_cols,
    minibatch_grad_cols,
    sghmc_sweep_cols,
    sgld_sweep_cols,
)

N_CHAINS = 4096


class TestULAStationary:
    def test_gaussian_stationary_variance_exact(self):
        """Full-batch SGLD == ULA. For target N(mu, s2) and step eps the
        chain is AR(1) with a = 1 - eps/(2 s2); stationary variance is
        exactly eps / (1 - a^2) = s2 / (1 - eps/(4 s2))."""
        mu, s2, eps = 1.7, 1.0, 0.4

        def ld(q):
            return -0.5 * jnp.sum((q - mu) ** 2, axis=0) / s2

        grad = full_grad_cols(ld)
        q0 = jnp.zeros((1, N_CHAINS), jnp.float32)
        q, _ = jax.jit(
            lambda: sgld_sweep_cols(grad, q0, 0, n_steps=400, eps=eps)
        )()
        draws = np.asarray(q[0])
        v_exact = s2 / (1.0 - eps / (4.0 * s2))
        np.testing.assert_allclose(draws.mean(), mu, atol=0.04)
        np.testing.assert_allclose(draws.var(), v_exact, rtol=0.06)

    def test_psgld_anisotropic_means(self):
        """pSGLD on a badly conditioned diagonal Gaussian recovers both
        means (the preconditioner is what makes the slow direction mix)."""
        mus = jnp.asarray([[2.0], [-3.0]])
        s2 = jnp.asarray([[100.0], [0.01]])

        def ld(q):
            return -0.5 * jnp.sum((q - mus) ** 2 / s2, axis=0)

        grad = full_grad_cols(ld)
        q0 = jnp.zeros((2, N_CHAINS), jnp.float32)
        q, _ = jax.jit(
            lambda: sgld_sweep_cols(
                grad, q0, 1, n_steps=6000, eps=0.01, precondition=True
            )
        )()
        means = np.asarray(q).mean(axis=1)
        np.testing.assert_allclose(means[0], 2.0, atol=0.8)
        np.testing.assert_allclose(means[1], -3.0, atol=0.1)


class TestSGHMCStationary:
    def test_gaussian_lyapunov_exact(self):
        """Full-gradient SGHMC on N(0, s2) is the linear system
        (q,p)' = M (q,p) + noise; its stationary covariance solves
        Sigma = M Sigma M^T + Q exactly — compare the q-marginal."""
        s2, eps, C = 1.0, 0.05, 1.0

        def ld(q):
            return -0.5 * jnp.sum(q**2, axis=0) / s2

        grad = full_grad_cols(ld)
        q0 = jnp.zeros((1, N_CHAINS), jnp.float32)
        q, p = jax.jit(
            lambda: sghmc_sweep_cols(
                grad, q0, 0, n_steps=3000, eps=eps, friction=C
            )
        )()
        M = np.array(
            [
                [1.0 - eps**2 / s2, eps * (1.0 - eps * C)],
                [-eps / s2, 1.0 - eps * C],
            ]
        )
        Q = 2.0 * C * eps * np.array([[eps**2, eps], [eps, 1.0]])
        sigma = solve_discrete_lyapunov(M, Q)
        draws = np.asarray(q[0])
        np.testing.assert_allclose(draws.mean(), 0.0, atol=0.05)
        np.testing.assert_allclose(draws.var(), sigma[0, 0], rtol=0.08)


class TestMinibatchGradient:
    rng = np.random.RandomState(3)
    X = rng.randn(64, 3).astype(np.float32)
    Y = rng.randn(64).astype(np.float32)

    @staticmethod
    def _lp(q):
        return -0.5 * jnp.sum(q**2, axis=0)

    @staticmethod
    def _ll(q, shard):
        x, y = shard
        resid = y[:, None] - x @ q[:3]
        return -0.5 * jnp.sum(resid**2, axis=0)

    def test_unbiased_vs_full_gradient(self):
        data = (jnp.asarray(self.X), jnp.asarray(self.Y))
        grad = minibatch_grad_cols(self._lp, self._ll, data, batch_size=8)
        q = jnp.asarray(self.rng.randn(4, 2), jnp.float32)
        full = jax.grad(
            lambda qq: jnp.sum(self._lp(qq) + self._ll(qq, data))
        )(q)
        keys = jr.split(jr.key(0), 8000)
        est = jax.jit(
            lambda: jnp.mean(jax.vmap(lambda k: grad(q, k))(keys), axis=0)
        )()
        np.testing.assert_allclose(
            np.asarray(est), np.asarray(full), rtol=0.1, atol=0.6
        )

    def test_minibatch_sgld_conjugate_posterior(self):
        """End-to-end: SGLD with batch 16 of 64 observations on the
        Gaussian-mean model. Small eps → stationary law ≈ the conjugate
        posterior (loose MC tolerance; the bias is O(eps) + minibatch
        noise inflation)."""
        obs = np.asarray(self.rng.randn(64) * 0.5 + 2.0, np.float32)
        s = 0.5
        v_post = 1.0 / (1.0 + len(obs) / s**2)
        m_post = v_post * obs.sum() / s**2

        def lp(q):
            return -0.5 * jnp.sum(q**2, axis=0)

        def ll(q, shard):
            (ys,) = shard
            return -0.5 * jnp.sum((ys[:, None] - q[0]) ** 2, axis=0) / s**2

        grad = minibatch_grad_cols(lp, ll, (jnp.asarray(obs),), batch_size=16)
        q0 = jnp.full((1, N_CHAINS), float(m_post), jnp.float32)
        q, _ = jax.jit(
            lambda: sgld_sweep_cols(grad, q0, 2, n_steps=2000, eps=2e-4)
        )()
        draws = np.asarray(q[0])
        np.testing.assert_allclose(draws.mean(), m_post, atol=0.02)
        # minibatch gradient noise inflates the stationary variance above
        # v_post; it must still be the right order
        assert v_post * 0.8 < draws.var() < v_post * 3.0
