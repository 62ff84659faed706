"""SVGD vs exact targets: Gaussian moments (mean AND covariance — the
repulsion term is what keeps the spread; a bug there collapses particles
to the mode), correlated Gaussians, and bimodal mass split."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from genjax_tpu.kernels.svgd import rbf_kernel_and_grad, svgd


class TestKernel:
    def test_gram_and_repulsion_match_brute_force(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(3, 6), jnp.float32)
        h = 1.7
        K, rep = rbf_kernel_and_grad(q, bandwidth=np.sqrt(h))
        qn = np.asarray(q)
        K_np = np.zeros((6, 6))
        rep_np = np.zeros((3, 6))
        for i in range(6):
            for j in range(6):
                K_np[j, i] = np.exp(
                    -np.sum((qn[:, i] - qn[:, j]) ** 2) / h
                )
                # ∇_{q_j} exp(−‖q_j − q_i‖²/h) = −(2/h)(q_j − q_i) k
                rep_np[:, i] += (
                    -(2.0 / h) * (qn[:, j] - qn[:, i]) * K_np[j, i]
                )
        np.testing.assert_allclose(np.asarray(K), K_np, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(rep), rep_np, rtol=1e-3, atol=1e-5
        )


class TestGaussianTargets:
    def test_moments_of_anisotropic_gaussian(self):
        mus = jnp.asarray([[1.0], [-2.0]])
        sds = jnp.asarray([[0.5], [1.5]])

        def ld(q):
            return -0.5 * jnp.sum(((q - mus) / sds) ** 2, axis=0)

        rng = np.random.RandomState(1)
        q0 = jnp.asarray(rng.randn(2, 256), jnp.float32)
        q = jax.jit(
            lambda q0: svgd(ld, q0, n_steps=2000, step_size=0.15)
        )(q0)
        d = np.asarray(q)
        # finite-N SVGD carries a small deterministic bias — tolerances
        # reflect that, not sampling noise
        np.testing.assert_allclose(d.mean(axis=1), [1.0, -2.0], atol=0.12)
        np.testing.assert_allclose(
            d.std(axis=1), [0.5, 1.5], rtol=0.15
        )

    def test_correlated_gaussian_covariance(self):
        cov = np.asarray([[1.0, 0.7], [0.7, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))

        def ld(q):
            return -0.5 * jnp.einsum("in,ij,jn->n", q, prec, q)

        rng = np.random.RandomState(2)
        q0 = jnp.asarray(rng.randn(2, 384), jnp.float32)
        q = jax.jit(
            lambda q0: svgd(ld, q0, n_steps=1000, step_size=0.3)
        )(q0)
        emp = np.cov(np.asarray(q))
        np.testing.assert_allclose(emp, cov, atol=0.12)


class TestColumnBridge:
    def test_conjugate_posterior_through_model(self):
        """column_svgd on a @gen model: padding dims must be excluded
        (regression — with them in the kernel metric the posterior sd
        collapsed 2x)."""
        import genjax_tpu as g
        from genjax_tpu.kernels.model_interface import column_svgd

        @g.gen
        def m():
            mu = g.normal(0.0, 1.0) @ "mu"
            g.normal(mu, 0.5) @ "y"

        v = 1.0 / (1.0 + 4.0)
        mp = v * 1.2 / 0.25
        q, packer = column_svgd(
            m,
            g.C["y"].set(1.2),
            (),
            ["mu"],
            n_particles=128,
            n_steps=1200,
        )
        d = np.asarray(q[0])
        np.testing.assert_allclose(d.mean(), mp, atol=0.06)
        np.testing.assert_allclose(d.std(), np.sqrt(v), atol=0.06)
        assert q.shape == (packer.dim, 128)


class TestBimodal:
    def test_mode_mass_split(self):
        """Equal-weight well-separated mixture: about half the particles
        end in each mode (SVGD's repulsion prevents mode collapse when
        initialized across both basins)."""

        def ld(q):
            x = q[0]
            return logsumexp(
                jnp.stack(
                    [-0.5 * (x - 3.0) ** 2, -0.5 * (x + 3.0) ** 2]
                ),
                axis=0,
            ) - 0.5 * jnp.sum(q[1:] ** 2, axis=0)

        rng = np.random.RandomState(3)
        q0 = jnp.asarray(4.0 * rng.randn(1, 256), jnp.float32)
        q = jax.jit(
            lambda q0: svgd(ld, q0, n_steps=600, step_size=0.3)
        )(q0)
        frac_right = float(np.mean(np.asarray(q[0]) > 0))
        assert 0.3 < frac_right < 0.7, frac_right
        # particles actually sit in the modes
        d = np.abs(np.abs(np.asarray(q[0])) - 3.0)
        assert np.median(d) < 1.5
