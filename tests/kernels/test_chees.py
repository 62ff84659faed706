"""ChEES-HMC: joint step-size/mass/trajectory-length adaptation on the
column layout (kernels/chees.py), validated against exact posteriors."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.kernels import chees_hmc, column_chees

jax.config.update("jax_platforms", "cpu")

KW = dict(rng_impl="threefry2x32")  # rbg lowers poorly on CPU hosts


class TestChEESKernel:
    def test_anisotropic_gaussian_recovery(self):
        scales = np.asarray([1.0, 10.0], np.float32)

        def ld(q):
            return -0.5 * jnp.sum((q / scales[:, None]) ** 2, axis=0)

        q0 = 0.1 * jr.normal(jr.key(0), (2, 2048))
        q, info = jax.jit(
            lambda q0: chees_hmc(
                ld, q0, 1, n_warmup=400, n_steps=200, eps0=0.05, **KW
            )
        )(q0)
        assert np.allclose(np.std(np.asarray(q), axis=1), scales, rtol=0.1)
        # the mass matrix absorbed the scales...
        assert np.allclose(
            np.asarray(info.inv_mass), scales**2, rtol=0.25
        )
        # ...and the acceptance adapted toward the 0.651 target
        assert 0.5 < float(info.accept_rate) < 0.9

    def test_correlated_gaussian_grows_trajectory(self):
        """A 0.95-correlated Gaussian cannot be whitened by a diagonal
        mass: ChEES must discover a LONGER trajectory than the one-step
        initialization to traverse the ridge."""
        rho = 0.95
        cov = np.asarray([[1.0, rho], [rho, 1.0]], np.float32)
        prec = np.linalg.inv(cov).astype(np.float32)

        def ld(q):
            return -0.5 * jnp.sum(q * (prec @ q), axis=0)

        q0 = 0.1 * jr.normal(jr.key(1), (2, 2048))
        q, info = jax.jit(
            lambda q0: chees_hmc(
                ld, q0, 2, n_warmup=500, n_steps=300, eps0=0.05,
                t0=0.1, **KW
            )
        )(q0)
        emp_cov = np.cov(np.asarray(q))
        assert np.allclose(emp_cov, cov, atol=0.12)
        assert float(info.trajectory_length) > 0.5  # grew well past t0

    def test_seed_accepts_prng_key(self):
        def ld(q):
            return -0.5 * jnp.sum(q**2, axis=0)

        q0 = 0.1 * jr.normal(jr.key(4), (2, 512))
        key = jr.key(11, impl="threefry2x32")
        q, info = chees_hmc(
            ld, q0, key, n_warmup=100, n_steps=50, eps0=0.1, **KW
        )
        assert np.allclose(np.std(np.asarray(q), axis=1), 1.0, atol=0.15)
        # identical key → identical stream; different key → different draws
        q2, _ = chees_hmc(
            ld, q0, key, n_warmup=100, n_steps=50, eps0=0.1, **KW
        )
        assert np.array_equal(np.asarray(q), np.asarray(q2))
        q3, _ = chees_hmc(
            ld, q0, jr.key(12, impl="threefry2x32"),
            n_warmup=100, n_steps=50, eps0=0.1, **KW,
        )
        assert not np.array_equal(np.asarray(q), np.asarray(q3))

    def test_nan_trajectories_count_as_rejections(self):
        # a huge eps0 diverges immediately; adaptation must survive
        def ld(q):
            return -0.5 * jnp.sum(q**2, axis=0) - 0.05 * jnp.sum(
                q**4, axis=0
            )

        q0 = jr.normal(jr.key(2), (2, 256))
        q, info = chees_hmc(
            ld, q0, 3, n_warmup=200, n_steps=50, eps0=50.0, **KW
        )
        assert np.isfinite(float(info.eps))
        assert bool(jnp.all(jnp.isfinite(q)))
        assert float(info.accept_rate) > 0.3  # recovered from eps0=50


class TestColumnChEES:
    def test_conjugate_posterior_with_draws(self):
        @g.gen
        def conjugate():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        q, info, packer = column_chees(
            conjugate, g.C["y"].set(1.5), (), ["mu"],
            n_chains=1024, n_warmup=200, n_steps=100, eps=0.1,
            collect=True, **KW,
        )
        # posterior: precision 1 + 4 = 5, mean 1.2, std 1/sqrt(5)
        mus = np.asarray(info.draws[-50:, 0, :]).ravel()
        assert np.mean(mus) == pytest.approx(1.2, abs=0.05)
        assert np.std(mus) == pytest.approx(1.0 / np.sqrt(5.0), abs=0.05)
        # decode through the packer as well
        decoded = packer.unpack(q[:, 0])
        assert "mu" in decoded
