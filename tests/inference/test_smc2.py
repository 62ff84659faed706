"""SMC² validated against exact grid quadrature on a linear-Gaussian SSM
with an unknown transition coefficient: Kalman gives p(y | a) exactly, so
the θ-posterior and the evidence have dense-grid ground truth."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from scipy.stats import norm as snorm

import genjax_tpu as g
from genjax_tpu.inference.smc2 import smc2

Q, R = 1.0, 0.5  # transition/observation noise SDs
A_TRUE = 0.8
PRIOR_MEAN, PRIOR_SD = 0.5, 0.3
T = 20


@g.gen
def kernel(c, x):
    a, z = c
    z_new = g.normal(a * z, Q) @ "z"
    y = g.normal(z_new, R) @ "y"
    return ((a, z_new), y)


def kalman_loglik(ys, a):
    """log p(y_{1:T} | a) for z_t ~ N(a z_{t-1}, Q^2), y_t ~ N(z_t, R^2),
    z_0 = 0 deterministic."""
    mean, var = 0.0, 0.0  # state z_0
    ll = 0.0
    for y in ys:
        mean, var = a * mean, a * a * var + Q**2
        s = var + R**2
        ll += snorm.logpdf(y, mean, np.sqrt(s))
        k_gain = var / s
        mean = mean + k_gain * (y - mean)
        var = (1 - k_gain) * var
    return ll


def make_data(seed=0):
    rng = np.random.RandomState(seed)
    z = 0.0
    ys = []
    for _ in range(T):
        z = A_TRUE * z + Q * rng.randn()
        ys.append(z + R * rng.randn())
    return np.asarray(ys, np.float32)


def grid_posterior(ys):
    grid = np.linspace(-0.6, 1.8, 1201)
    lw = np.array(
        [snorm.logpdf(a, PRIOR_MEAN, PRIOR_SD) + kalman_loglik(ys, a) for a in grid]
    )
    log_ev = np.log(np.trapezoid(np.exp(lw - lw.max()), grid)) + lw.max()
    w = np.exp(lw - lw.max())
    w /= w.sum()
    mean = float(w @ grid)
    var = float(w @ (grid - mean) ** 2)
    return mean, var, float(log_ev)


class TestSMC2:
    def setup_method(self):
        self.ys = make_data()
        self.mean_exact, self.var_exact, self.logev_exact = grid_posterior(
            self.ys
        )

    def _run(self, seed):
        return jax.jit(
            lambda k: smc2(
                k,
                kernel,
                lambda kk: PRIOR_MEAN + PRIOR_SD * jr.normal(kk),
                lambda a: -0.5 * ((a - PRIOR_MEAN) / PRIOR_SD) ** 2
                - jnp.log(PRIOR_SD)
                - 0.5 * jnp.log(2.0 * jnp.pi),
                0.0,
                jnp.zeros(T),
                g.C[:, "y"].set(jnp.asarray(self.ys)),
                n_theta=192,
                n_x=96,
                rw_scales=0.15,
                n_rejuv=2,
            )
        )(jr.key(seed))

    def test_theta_posterior_and_evidence(self):
        res = self._run(0)
        w = np.exp(np.asarray(res.log_weights))
        thetas = np.asarray(res.thetas)
        mean = float(w @ thetas)
        var = float(w @ (thetas - mean) ** 2)
        np.testing.assert_allclose(mean, self.mean_exact, atol=0.06)
        np.testing.assert_allclose(
            np.sqrt(var), np.sqrt(self.var_exact), rtol=0.35
        )
        np.testing.assert_allclose(
            float(res.log_evidence), self.logev_exact, atol=0.6
        )

    def test_rejuvenation_fires_and_accepts(self):
        res = self._run(1)
        # the θ-ESS must have collapsed at least once on 20 informative
        # observations, and the PMMH exchange must accept a sane fraction
        assert float(res.rejuv_accept_rate) > 0.05
        ess = np.asarray(res.ess_history)
        assert ess.min() < 0.9 * 192

    def test_mesh_sharding_is_placement_only(self):
        """Sharding the θ axis over the 8-device mesh must not change the
        math: same seed → same θ-posterior moments and evidence (allowing
        float-reduction reorder)."""
        from genjax_tpu.parallel import make_mesh

        mesh = make_mesh()
        base = self._run(0)

        res = jax.jit(
            lambda k: smc2(
                k,
                kernel,
                lambda kk: PRIOR_MEAN + PRIOR_SD * jr.normal(kk),
                lambda a: -0.5 * ((a - PRIOR_MEAN) / PRIOR_SD) ** 2
                - jnp.log(PRIOR_SD)
                - 0.5 * jnp.log(2.0 * jnp.pi),
                0.0,
                jnp.zeros(T),
                g.C[:, "y"].set(jnp.asarray(self.ys)),
                n_theta=192,
                n_x=96,
                rw_scales=0.15,
                n_rejuv=2,
                mesh=mesh,
            )
        )(jr.key(0))
        np.testing.assert_allclose(
            np.asarray(res.thetas), np.asarray(base.thetas), atol=1e-4
        )
        np.testing.assert_allclose(
            float(res.log_evidence), float(base.log_evidence), atol=1e-3
        )

    @pytest.mark.slow
    def test_evidence_unbiasedness_across_seeds(self):
        """Mean of exp(logZ_hat - logZ_exact) across independent runs ≈ 1
        (the estimator is unbiased in Z, not log Z)."""
        ratios = []
        for s in range(4):
            res = self._run(10 + s)
            ratios.append(np.exp(float(res.log_evidence) - self.logev_exact))
        assert 0.5 < np.mean(ratios) < 1.8, ratios
