"""ABC rejection and adaptive ABC-SMC, validated against exact answers
(CLAUDE.md convention): the Gaussian-model ABC posterior has the closed
form  p_eps(theta | y) ∝ N(theta; m0, t0²) · [Φ((y+eps−theta)/s) −
Φ((y−eps−theta)/s)], integrated here by dense quadrature; and as eps → 0
the ABC posterior converges to the conjugate normal posterior.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import pytest
from jax.scipy.stats import norm

import genjax_tpu as g
from genjax_tpu.inference import (
    abc_rejection,
    abc_smc,
    column_weighted_moments,
)

KEY = jr.key(20260821)

T0 = 1.0   # prior sd
S = 0.7    # observation sd
Y_OBS = 1.3


@g.gen
def gauss_model():
    theta = g.normal(0.0, T0) @ "theta"
    y = g.normal(theta, S) @ "y"
    return y


def distance(tr):
    return jnp.abs(tr.get_choices()["y"] - Y_OBS)


def exact_abc_moments(eps, grid_n=200_001, lim=6.0):
    """Quadrature over the closed-form ABC posterior density."""
    th = jnp.linspace(-lim, lim, grid_n)
    log_prior = norm.logpdf(th, 0.0, T0)
    hit = norm.cdf((Y_OBS + eps - th) / S) - norm.cdf((Y_OBS - eps - th) / S)
    w = jnp.exp(log_prior) * hit
    w = w / jnp.trapezoid(w, th)
    mean = jnp.trapezoid(th * w, th)
    var = jnp.trapezoid((th - mean) ** 2 * w, th)
    return float(mean), float(var)


def conjugate_posterior():
    var = 1.0 / (1.0 / T0**2 + 1.0 / S**2)
    return var * Y_OBS / S**2, var


class TestABCRejection:
    def test_matches_quadrature_exact(self):
        eps = 0.5
        res = abc_rejection(
            KEY, gauss_model, (), distance,
            n_samples=400_000, tolerance=eps,
        )
        flag = res.choices.flag
        th = res.choices.value["theta"]
        w = flag.astype(jnp.float32)
        mean = jnp.sum(w * th) / jnp.sum(w)
        var = jnp.sum(w * (th - mean) ** 2) / jnp.sum(w)
        exact_mean, exact_var = exact_abc_moments(eps)
        assert float(mean) == pytest.approx(exact_mean, abs=0.02)
        assert float(var) == pytest.approx(exact_var, abs=0.02)
        # acceptance rate equals the marginal hit probability:
        # y_sim ~ N(0, t0²+s²)
        s_marg = jnp.sqrt(T0**2 + S**2)
        p_hit = float(
            norm.cdf((Y_OBS + eps) / s_marg) - norm.cdf((Y_OBS - eps) / s_marg)
        )
        assert float(res.accept_rate) == pytest.approx(p_hit, abs=0.01)

    def test_fixed_shapes_and_mask_idiom(self):
        res = abc_rejection(
            KEY, gauss_model, (), distance, n_samples=1024, tolerance=0.3
        )
        assert res.distances.shape == (1024,)
        assert res.choices.flag.shape == (1024,)
        assert res.choices.value["theta"].shape == (1024,)


class TestABCSMC:
    def test_converges_to_conjugate_posterior(self):
        res, packer = abc_smc(
            KEY, gauss_model, (), distance, ["theta"],
            n_particles=4096, n_generations=10, quantile=0.5, mh_moves=2,
        )
        mean, var = column_weighted_moments(res.params, packer.dim)
        # the acceptance gate stops the ladder where moves still mix —
        # tight enough that the ABC posterior is close to exact
        eps = float(res.tolerance)
        assert eps < 0.3, eps
        exact_mean, exact_var = exact_abc_moments(eps)
        assert float(mean[0]) == pytest.approx(exact_mean, abs=0.06)
        assert float(var[0]) == pytest.approx(exact_var, rel=0.2)
        # and near the eps->0 limit
        cmean, cvar = conjugate_posterior()
        assert float(mean[0]) == pytest.approx(cmean, abs=0.1)
        assert float(var[0]) == pytest.approx(cvar, rel=0.2)

    def test_tolerance_ladder_monotone(self):
        res, _ = abc_smc(
            KEY, gauss_model, (), distance, ["theta"],
            n_particles=512, n_generations=6,
        )
        ladder = res.tolerance_history
        assert bool(jnp.all(ladder[1:] <= ladder[:-1] + 1e-7))
        assert bool(jnp.all(res.distances <= res.tolerance))

    def test_moves_accept_and_particles_move(self):
        res, _ = abc_smc(
            KEY, gauss_model, (), distance, ["theta"],
            n_particles=1024, n_generations=5, mh_moves=3,
        )
        assert float(jnp.mean(res.move_accept_history)) > 0.05
        # the population is not collapsed
        assert float(jnp.var(res.params[0])) > 1e-4

    def test_packer_reuse_and_determinism(self):
        r1, packer = abc_smc(
            KEY, gauss_model, (), distance, ["theta"],
            n_particles=256, n_generations=3,
        )
        r2, _ = abc_smc(
            KEY, gauss_model, (), distance, ["theta"],
            n_particles=256, n_generations=3, packer=packer,
        )
        assert jnp.array_equal(r1.params, r2.params)
        assert float(r1.tolerance) == float(r2.tolerance)

    def test_multidim_parameters(self):
        """Two-parameter simulator: location and log-scale."""

        @g.gen
        def loc_scale():
            mu = g.normal(0.0, 1.0) @ "mu"
            log_s = g.normal(0.0, 0.3) @ "log_s"
            y = g.normal(mu, jnp.exp(log_s)) @ "y"
            return y

        def dist2(tr):
            c = tr.get_choices()
            return jnp.abs(c["y"] - 0.8)

        res, packer = abc_smc(
            jr.key(5), loc_scale, (), dist2, ["mu", "log_s"],
            n_particles=2048, n_generations=8,
        )
        assert packer.dim == 2
        mean, var = column_weighted_moments(res.params, 2)
        # posterior over mu concentrates near the observation side
        assert 0.1 < float(mean[0]) < 0.9
        assert bool(jnp.all(jnp.isfinite(var)))
