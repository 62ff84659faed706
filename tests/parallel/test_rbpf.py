"""Rao-Blackwellized PF vs EXACT enumeration: on a 2-regime switching
linear-Gaussian SSM with T=8, the evidence is computable by enumerating
all 2^8 regime sequences x a time-varying Kalman filter. Also checks the
Rao-Blackwellization claim itself: logZ MSE below the plain PF's at the
same particle count."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from itertools import product
from scipy.stats import norm as snorm

import genjax_tpu as g
from genjax_tpu.parallel.rbpf import rbpf

T = 8
A_REG = np.asarray([0.9, 0.3], np.float32)  # per-regime transition coeff
Q_SD, R_SD = 0.5, 0.4
TRANS = np.asarray([[0.85, 0.15], [0.2, 0.8]], np.float32)
MU0, P0 = 0.0, 1.0


def make_data(seed=0):
    rng = np.random.RandomState(seed)
    u, z = 0, rng.randn() * np.sqrt(P0)
    ys, us = [], []
    for _ in range(T):
        u = rng.choice(2, p=TRANS[u])
        z = A_REG[u] * z + Q_SD * rng.randn()
        ys.append(z + R_SD * rng.randn())
        us.append(u)
    return np.asarray(ys, np.float32), np.asarray(us)


YS, US_TRUE = make_data()


def kalman_tv(ys, a_seq):
    """Scalar Kalman with per-step transition coefficient a_t; z_0 ~
    N(MU0, P0), step t: z_t = a_t z_{t-1} + w; y_t ~ N(z_t, R)."""
    mean, var, ll = MU0, P0, 0.0
    for y, a in zip(ys, a_seq):
        mean, var = a * mean, a * a * var + Q_SD**2
        s = var + R_SD**2
        ll += snorm.logpdf(y, mean, np.sqrt(s))
        k = var / s
        mean, var = mean + k * (y - mean), (1 - k) * var
    return ll


def exact_logz():
    lws = []
    for us in product(range(2), repeat=T):
        lp = np.log(TRANS[0, us[0]])
        for t in range(1, T):
            lp += np.log(TRANS[us[t - 1], us[t]])
        lws.append(lp + kalman_tv(YS, A_REG[list(us)]))
    m = max(lws)
    return m + np.log(np.sum(np.exp(np.asarray(lws) - m)))


LOGZ_EXACT = float(exact_logz())

LOG_TRANS = jnp.log(jnp.asarray(TRANS))


def sample_regime(key, u_prev, t):
    return jr.categorical(key, LOG_TRANS[u_prev])


def matrices(u):
    a = jnp.asarray(A_REG)[u]
    return (
        a.reshape(1, 1),
        jnp.asarray([[Q_SD**2]]),
        jnp.asarray([[1.0]]),
        jnp.asarray([[R_SD**2]]),
    )


def run_rbpf(seed, k=512):
    return jax.jit(
        lambda key: rbpf(
            key,
            sample_regime,
            matrices,
            jnp.asarray(YS).reshape(-1, 1),
            n_particles=k,
            init_regime=jnp.asarray(0),
            mu0=jnp.asarray([MU0]),
            P0=jnp.asarray([[P0]]),
        )
    )(jr.key(seed))


class TestRBPFExactness:
    def test_logz_matches_enumeration(self):
        lzs = [float(run_rbpf(s).log_marginal) for s in range(8)]
        # unbiased in Z: the mean of Z-ratios is ~1 and each estimate close
        ratios = np.exp(np.asarray(lzs) - LOGZ_EXACT)
        assert 0.8 < ratios.mean() < 1.25, (lzs, LOGZ_EXACT)
        np.testing.assert_allclose(np.mean(lzs), LOGZ_EXACT, atol=0.1)

    def test_regime_posterior_marginal(self):
        """Weighted final-regime frequencies match the enumerated
        posterior P(u_T | y)."""
        lws = []
        for us in product(range(2), repeat=T):
            lp = np.log(TRANS[0, us[0]])
            for t in range(1, T):
                lp += np.log(TRANS[us[t - 1], us[t]])
            lws.append((us[-1], lp + kalman_tv(YS, A_REG[list(us)])))
        m = max(w for _, w in lws)
        z0 = sum(np.exp(w - m) for u, w in lws if u == 0)
        z1 = sum(np.exp(w - m) for u, w in lws if u == 1)
        p1_exact = z1 / (z0 + z1)

        res = run_rbpf(42, k=4096)
        w = np.exp(np.asarray(res.log_weights))
        p1 = float(w @ np.asarray(res.regimes == 1, np.float32))
        np.testing.assert_allclose(p1, p1_exact, atol=0.05)

    @pytest.mark.slow
    def test_variance_reduction_vs_plain_pf(self):
        """Rao-Blackwellization: logZ MSE must beat the plain PF that
        samples (u, z) jointly, at equal particle count."""
        from genjax_tpu.parallel import SSMParticleFilter

        @g.gen
        def kern(c, x):
            u_prev, z = c
            u = g.categorical(LOG_TRANS[u_prev]) @ "u"
            z2 = g.normal(jnp.asarray(A_REG)[u] * z, Q_SD) @ "z"
            y = g.normal(z2, R_SD) @ "y"
            return ((u, z2), y)

        pf = SSMParticleFilter(kern, n_particles=512)
        obs = g.C[:, "y"].set(jnp.asarray(YS))

        # plain PF must integrate z_0 ~ N(0, P0): push it into the carry
        def run_pf(seed):
            k0, k1 = jr.split(jr.key(seed))
            z0 = float(np.sqrt(P0)) * jr.normal(k0)
            return float(
                pf.run(
                    k1, (jnp.asarray(0), z0), jnp.zeros(T), obs
                ).log_marginal
            )

        # NOTE: a single z0 draw per run adds prior variance — that IS the
        # joint sampler's job; the RBPF integrates it exactly.
        mse_pf = np.mean(
            [(run_pf(s) - LOGZ_EXACT) ** 2 for s in range(16)]
        )
        mse_rb = np.mean(
            [
                (float(run_rbpf(100 + s).log_marginal) - LOGZ_EXACT) ** 2
                for s in range(16)
            ]
        )
        assert mse_rb < mse_pf, (mse_rb, mse_pf)
