"""Parallel-tempering HMC (kernels/pt.py): replica exchange must recover
mode weights that single-temperature HMC provably cannot, and must stay
exact on unimodal targets."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.kernels import column_pt, geometric_ladder, pt_hmc

jax.config.update("jax_platforms", "cpu")

KW = dict(rng_impl="threefry2x32")  # rbg lowers poorly on CPU hosts


def bimodal_ld(sep=3.0, scale=0.5):
    """0.5 N(-sep, scale^2) + 0.5 N(+sep, scale^2) per dimension."""

    def ld(q):
        a = -0.5 * ((q - sep) / scale) ** 2
        b = -0.5 * ((q + sep) / scale) ** 2
        return jnp.sum(jnp.logaddexp(a, b), axis=0)

    return ld


class TestPTKernel:
    def test_geometric_ladder(self):
        betas = geometric_ladder(5, beta_min=0.1)
        assert betas.shape == (5,)
        assert float(betas[0]) == pytest.approx(1.0)
        assert float(betas[-1]) == pytest.approx(0.1)
        ratios = np.asarray(betas[1:] / betas[:-1])
        assert np.allclose(ratios, ratios[0], rtol=1e-5)
        assert geometric_ladder(1).shape == (1,)

    @pytest.mark.slow
    def test_bimodal_mode_weights(self):
        """All chains start in the NEGATIVE mode. A single rung (plain
        HMC) stays essentially trapped (the only crossings are rare
        unstable-leapfrog flukes); the ladder must redistribute to
        50/50."""
        ld = bimodal_ld(sep=4.0)
        n = 512
        q0 = (-4.0 + 0.1 * jr.normal(jr.key(0), (1, n))).astype(
            jnp.float32
        )

        # control: betas = [1.0] is exactly HMC — trapped
        q_hmc, _ = pt_hmc(
            ld, q0, 1, betas=[1.0], n_warmup=150, n_steps=150,
            eps0=0.1, L=8, **KW,
        )
        frac_hmc = float(jnp.mean(q_hmc > 0))
        assert frac_hmc < 0.05, "plain HMC crossed an 8-sigma barrier?!"

        # ladder: hot rungs hop modes, exchanges percolate down
        q, info = pt_hmc(
            ld, q0, 1, betas=geometric_ladder(6, beta_min=0.02),
            n_warmup=300, n_steps=500, eps0=0.1, L=8, collect=True,
            **KW,
        )
        draws = info.draws[250:]  # (steps, 1, n)
        frac_pos = float(jnp.mean(draws > 0))
        assert frac_pos == pytest.approx(0.5, abs=0.08)
        # within-mode geometry is exact too
        pos = np.asarray(draws)[np.asarray(draws) > 0]
        assert np.mean(pos) == pytest.approx(4.0, abs=0.1)
        assert np.std(pos) == pytest.approx(0.5, abs=0.1)
        # adjacent-rung exchange is alive across the whole ladder
        assert np.all(np.asarray(info.swap_rate) > 0.1)

    def test_unimodal_exactness_and_per_rung_adaptation(self):
        scales = np.asarray([1.0, 5.0], np.float32)

        def ld(q):
            return -0.5 * jnp.sum((q / scales[:, None]) ** 2, axis=0)

        q0 = 0.1 * jr.normal(jr.key(2), (2, 1024))
        q, info = pt_hmc(
            ld, q0, 3, betas=geometric_ladder(4), n_warmup=400,
            n_steps=200, eps0=0.05, L=8, **KW,
        )
        assert np.allclose(np.std(np.asarray(q), axis=1), scales, rtol=0.15)
        # per-rung mass: the cold rung sees var = scale^2, the hot rung
        # var = scale^2 / beta — both absorbed per rung
        im = np.asarray(info.inv_mass)  # (R, D)
        assert np.allclose(im[0], scales**2, rtol=0.35)
        assert im[-1, 1] > im[0, 1]  # hot rung is wider
        # per-rung mass whitens each rung, so the ADAPTED step sizes come
        # out comparable across the ladder — the per-rung dual averaging
        # just has to land every rung near the target acceptance
        assert np.all(np.asarray(info.accept_rate) > 0.6)

    def test_per_rung_initial_positions(self):
        ld = bimodal_ld()
        q0 = jnp.stack(
            [jnp.full((1, 64), -3.0), jnp.full((1, 64), 3.0)]
        )  # (R=2, 1, 64)
        q, info = pt_hmc(
            ld, q0, 4, betas=[1.0, 0.05], n_warmup=50, n_steps=50,
            eps0=0.1, L=4, **KW,
        )
        assert q.shape == (1, 64)
        assert bool(jnp.all(jnp.isfinite(q)))

    def test_ladder_validation(self):
        ld = bimodal_ld()
        q0 = jnp.zeros((1, 8))
        with pytest.raises(ValueError, match="1-D"):
            pt_hmc(ld, q0, 0, betas=jnp.ones((2, 2)), **KW)
        with pytest.raises(ValueError, match="rung"):
            geometric_ladder(0)
        with pytest.raises(ValueError, match=r"\(D, N\) or \(R, D, N\)"):
            pt_hmc(ld, jnp.zeros((2, 1, 8)), 0, betas=[1.0], **KW)


class TestColumnPT:
    @pytest.mark.slow
    def test_bimodal_gen_model(self):
        """A @gen posterior that is bimodal by symmetry: with
        mu ~ N(0, 10) and y ~ N(mu^2, 1), observing y=4 puts exactly
        equal mass near mu = -2 and mu = +2 (the prior is symmetric and
        the likelihood depends on mu only through mu^2). PT must weight
        the modes 50/50; plain HMC started in one mode cannot."""

        @g.gen
        def bimodal():
            mu = g.normal(0.0, 10.0) @ "mu"
            _ = g.normal(mu * mu, 1.0) @ "y"

        obs = g.C["y"].set(4.0)
        q, info, packer = column_pt(
            bimodal, obs, (), ["mu"],
            n_chains=256, n_rungs=5, n_warmup=200, n_steps=400,
            eps=0.05, L=8, seed=5, collect=True, **KW,
        )
        draws = np.asarray(info.draws[200:, 0, :])
        frac_pos = float(np.mean(draws > 0))
        assert frac_pos == pytest.approx(0.5, abs=0.1)
