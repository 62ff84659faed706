"""LGSSM forecasting and EM: predictions vs brute-force joint-Gaussian
conditioning; EM's guaranteed log-marginal ascent; parameter recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.dists.lgssm import (
    LGSSMParams,
    kalman_filter,
    kalman_predict,
    lgssm_em,
)

from tests.dists.test_lgssm import (  # noqa: F401 — reuse the fixed system
    A,
    C,
    COV_Y,
    MEAN_Y,
    MU0,
    P0,
    PARAMS,
    Q,
    R,
    T,
    DZ,
    YS,
)


class TestForecasting:
    def test_matches_joint_conditioning(self):
        """Extend the joint to T+h latent steps in numpy and condition on
        the T observations — the forecast means/covs must match exactly."""
        h = 3
        nz = (T + h) * DZ
        mean_z = np.zeros(nz)
        mean_z[0:DZ] = MU0
        for t in range(1, T + h):
            mean_z[t * DZ : (t + 1) * DZ] = (
                A @ mean_z[(t - 1) * DZ : t * DZ]
            )
        cov_z = np.zeros((nz, nz))
        cov_z[0:DZ, 0:DZ] = P0
        for t in range(1, T + h):
            prev = cov_z[(t - 1) * DZ : t * DZ, (t - 1) * DZ : t * DZ]
            cov_z[t * DZ : (t + 1) * DZ, t * DZ : (t + 1) * DZ] = (
                A @ prev @ A.T + Q
            )
            for s in range(t):
                cross = cov_z[s * DZ : (s + 1) * DZ, (t - 1) * DZ : t * DZ]
                cov_z[s * DZ : (s + 1) * DZ, t * DZ : (t + 1) * DZ] = (
                    cross @ A.T
                )
                cov_z[t * DZ : (t + 1) * DZ, s * DZ : (s + 1) * DZ] = (
                    cross @ A.T
                ).T
        Cbig = np.zeros((T, nz))
        for t in range(T):
            Cbig[t, t * DZ : (t + 1) * DZ] = C[0]
        cov_y = Cbig @ cov_z @ Cbig.T + np.kron(np.eye(T), R)
        cov_zy = cov_z @ Cbig.T
        mean_y = Cbig @ mean_z
        cond_mean = mean_z + cov_zy @ np.linalg.solve(
            cov_y, YS.ravel() - mean_y
        )
        cond_cov = cov_z - cov_zy @ np.linalg.solve(cov_y, cov_zy.T)

        z_means, z_covs, y_means, y_covs = kalman_predict(
            PARAMS, jnp.asarray(YS), h
        )
        for k in range(h):
            t = T + k
            np.testing.assert_allclose(
                np.asarray(z_means)[k],
                cond_mean[t * DZ : (t + 1) * DZ],
                rtol=1e-3,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(z_covs)[k],
                cond_cov[t * DZ : (t + 1) * DZ, t * DZ : (t + 1) * DZ],
                rtol=1e-3,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(y_means)[k],
                C @ cond_mean[t * DZ : (t + 1) * DZ],
                rtol=1e-3,
                atol=1e-4,
            )


def make_series(a, q_sd, r_sd, T, seed=0):
    rng = np.random.RandomState(seed)
    z, ys = rng.randn() * q_sd, []
    for _ in range(T):
        ys.append(z + r_sd * rng.randn())
        z = a * z + q_sd * rng.randn()
    return np.asarray(ys, np.float32).reshape(-1, 1)


class TestEM:
    def test_log_marginal_monotone_ascent(self):
        ys = make_series(0.8, 0.7, 0.5, 120)
        p0 = LGSSMParams.scalar(0.2, 1.5, 1.0, 1.5, 0.0, p0=1.0)
        _, lms = jax.jit(lambda: lgssm_em(p0, jnp.asarray(ys), n_iters=25))()
        lms = np.asarray(lms)
        assert np.all(np.diff(lms) > -1e-3), lms

    def test_recovers_transition_coefficient(self):
        ys = make_series(0.8, 0.7, 0.5, 600)
        p0 = LGSSMParams.scalar(0.3, 1.0, 1.0, 0.25, 0.0, p0=1.0)
        fitted, lms = jax.jit(
            lambda: lgssm_em(
                p0, jnp.asarray(ys), n_iters=60, fit=("A", "Q")
            )
        )()
        a_hat = float(fitted.A[0, 0])
        q_hat = float(fitted.Q[0, 0])
        np.testing.assert_allclose(a_hat, 0.8, atol=0.08)
        np.testing.assert_allclose(q_hat, 0.49, rtol=0.3)
        # frozen fields untouched
        np.testing.assert_allclose(float(fitted.C[0, 0]), 1.0)
        np.testing.assert_allclose(float(fitted.R[0, 0]), 0.25)

    def test_fitted_beats_initial_likelihood(self):
        ys = make_series(0.8, 0.7, 0.5, 120, seed=3)
        p0 = LGSSMParams.scalar(0.1, 2.0, 1.0, 2.0, 0.0, p0=1.0)
        fitted, _ = lgssm_em(p0, jnp.asarray(ys), n_iters=30)
        _, _, lm0 = kalman_filter(p0, jnp.asarray(ys))
        _, _, lm1 = kalman_filter(fitted, jnp.asarray(ys))
        assert float(lm1) > float(lm0) + 1.0
