"""Temporally-parallel (associative-scan) filters vs their sequential
twins: identical results to float roundoff at every step, including
non-power-of-two lengths (the associative_scan padding path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genjax_tpu.dists.hmm_tools import (
    forward_backward,
    forward_backward_parallel,
    forward_parallel,
    viterbi,
    viterbi_parallel,
)
from genjax_tpu.dists.lgssm import (
    LGSSMParams,
    kalman_filter,
    kalman_filter_parallel,
    kalman_smoother,
    kalman_smoother_parallel,
)

rng = np.random.RandomState(0)
PARAMS = LGSSMParams(
    A=jnp.asarray([[0.9, 0.1], [0.0, 0.7]]),
    Q=jnp.asarray([[0.5, 0.1], [0.1, 0.4]]),
    C=jnp.asarray([[1.0, 0.5]]),
    R=jnp.asarray([[0.3]]),
    mu0=jnp.asarray([0.2, -0.1]),
    P0=jnp.asarray([[0.6, 0.0], [0.0, 0.6]]),
)


class TestParallelKalman:
    @pytest.mark.parametrize("T", [1, 2, 3, 16, 37, 64])
    def test_matches_sequential_all_lengths(self, T):
        ys = jnp.asarray(rng.randn(T, 1), jnp.float32)
        m_seq, c_seq, _ = kalman_filter(PARAMS, ys)
        m_par, c_par = jax.jit(kalman_filter_parallel)(PARAMS, ys)
        np.testing.assert_allclose(
            np.asarray(m_par), np.asarray(m_seq), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_par), np.asarray(c_seq), rtol=1e-3, atol=1e-5
        )


class TestParallelViterbi:
    @pytest.mark.parametrize("T", [1, 2, 5, 17, 33])
    def test_matches_sequential(self, T):
        N, M = 5, 4
        pi = rng.dirichlet(np.ones(N))
        tr = rng.dirichlet(np.ones(N), size=N)
        ob = rng.dirichlet(np.ones(M), size=N)
        ys = rng.randint(0, M, size=T)
        lp = jnp.log(jnp.asarray(pi, jnp.float32))
        lt = jnp.log(jnp.asarray(tr, jnp.float32))
        lo = jnp.log(jnp.asarray(ob, jnp.float32))
        p1, l1 = viterbi(lp, lt, lo, jnp.asarray(ys))
        p2, l2 = jax.jit(viterbi_parallel)(lp, lt, lo, jnp.asarray(ys))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


class TestParallelSmoother:
    @pytest.mark.parametrize("T", [1, 2, 3, 16, 37])
    def test_matches_sequential_all_lengths(self, T):
        ys = jnp.asarray(rng.randn(T, 1), jnp.float32)
        m_seq, c_seq, _ = kalman_smoother(PARAMS, ys)
        m_par, c_par = jax.jit(kalman_smoother_parallel)(PARAMS, ys)
        np.testing.assert_allclose(
            np.asarray(m_par), np.asarray(m_seq), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_par), np.asarray(c_seq), rtol=1e-3, atol=1e-5
        )


class TestParallelHMMForward:
    @pytest.mark.parametrize("T", [1, 2, 5, 32, 33])
    def test_matches_sequential_alphas(self, T):
        N, M = 4, 3
        pi = rng.dirichlet(np.ones(N))
        tr = rng.dirichlet(np.ones(N), size=N)
        ob = rng.dirichlet(np.ones(M), size=N)
        ys = rng.randint(0, M, size=T)
        lp = jnp.log(jnp.asarray(pi, jnp.float32))
        lt = jnp.log(jnp.asarray(tr, jnp.float32))
        lo = jnp.log(jnp.asarray(ob, jnp.float32))
        alphas, lm = jax.jit(forward_parallel)(lp, lt, lo, jnp.asarray(ys))
        # sequential alphas via forward_backward's internals: gammas need
        # betas, but alpha_t = log_gamma_t + log_marginal - beta_t; easier
        # to just recompute the sequential forward here
        from jax.scipy.special import logsumexp

        a = lp + lo[:, ys[0]]
        seq = [a]
        for t in range(1, T):
            a = lo[:, ys[t]] + logsumexp(a[:, None] + lt, axis=0)
            seq.append(a)
        np.testing.assert_allclose(
            np.asarray(alphas), np.asarray(jnp.stack(seq)), atol=1e-4
        )
        post = forward_backward(lp, lt, lo, jnp.asarray(ys))
        np.testing.assert_allclose(
            float(lm), float(post.log_marginal), rtol=1e-5
        )

    @pytest.mark.parametrize("T", [1, 2, 5, 32, 33])
    def test_parallel_smoothing_matches_sequential(self, T):
        N, M = 4, 3
        pi = rng.dirichlet(np.ones(N))
        tr = rng.dirichlet(np.ones(N), size=N)
        ob = rng.dirichlet(np.ones(M), size=N)
        ys = rng.randint(0, M, size=T)
        lp = jnp.log(jnp.asarray(pi, jnp.float32))
        lt = jnp.log(jnp.asarray(tr, jnp.float32))
        lo = jnp.log(jnp.asarray(ob, jnp.float32))
        seq = forward_backward(lp, lt, lo, jnp.asarray(ys))
        par = jax.jit(forward_backward_parallel)(lp, lt, lo, jnp.asarray(ys))
        np.testing.assert_allclose(
            np.asarray(par.log_gammas),
            np.asarray(seq.log_gammas),
            atol=2e-4,
        )
        if T > 1:
            np.testing.assert_allclose(
                np.asarray(par.log_xis), np.asarray(seq.log_xis), atol=2e-4
            )
        np.testing.assert_allclose(
            float(par.log_marginal), float(seq.log_marginal), rtol=1e-5
        )
