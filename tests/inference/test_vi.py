"""Variational inference correctness.

Modeled on reference /root/reference/tests/inference/test_vi.py (mean-only
convergence) — extended with a posterior-scale convergence test, which
exercises the guide-entropy term of the ELBO (the reference's Marginal
weight bug dropped it; see genjax_tpu/inference/sp.py).
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.inference import Target, vi
from genjax_tpu.inference.sp import Marginal

KEY = jax.random.key(314159)


def make_guide(gen_fn):
    return Marginal(
        gen_fn, g.Pytree.const(g.Selection.all()), g.Pytree.const(None)
    )


class TestELBO:
    def test_normal_normal_mean_convergence(self):
        """Reference parity test (test_vi.py:23-43): guide mean converges to
        the observation under a tight-variance model."""

        @g.gen
        def model(v):
            mu = g.normal(0.0, 10.0) @ "mu"
            _ = g.normal(mu, 0.1) @ "v"

        @g.gen
        def guide_fn(target):
            (v,) = target.args
            _ = vi.normal_reparam(v, 0.1) @ "mu"

        guide = make_guide(guide_fn)
        elbo_grad = vi.ELBO(
            guide, lambda v: Target(model, (v,), g.C["v"].set(3.0))
        )
        v = 0.1
        jitted = jax.jit(elbo_grad)
        for _ in range(200):
            (v_grad,) = jitted(KEY, (v,))
            v -= 1e-3 * v_grad
        assert v == pytest.approx(3.0, rel=5e-2)

    def test_posterior_mean_and_scale(self):
        """Full ELBO: both guide mean AND scale converge to the exact
        conjugate posterior (requires the entropy term)."""

        @g.gen
        def model(phi):
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        @g.gen
        def guide_fn(target):
            phi = target.args[0]
            _ = vi.normal_reparam(phi[0], jax.nn.softplus(phi[1])) @ "mu"

        guide = make_guide(guide_fn)
        elbo_grad = vi.ELBO(
            guide, lambda phi: Target(model, (phi,), g.C["y"].set(2.0))
        )
        bstep = jax.jit(
            lambda k, phi: jnp.mean(
                jax.vmap(lambda kk: elbo_grad(kk, (phi,))[0])(
                    jax.random.split(k, 32)
                ),
                0,
            )
        )
        phi = jnp.array([0.0, 0.0])
        key = KEY
        for _ in range(400):
            key, sub = jax.random.split(key)
            phi = phi - 0.05 * bstep(sub, phi)
        # posterior: N(1, 1/sqrt(2))
        assert phi[0] == pytest.approx(1.0, abs=0.1)
        assert jax.nn.softplus(phi[1]) == pytest.approx(0.7071, abs=0.1)


class TestIWELBO:
    def test_gradient_is_finite_and_converges_mean(self):
        @g.gen
        def model(phi):
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        @g.gen
        def guide_fn(target):
            phi = target.args[0]
            _ = vi.normal_reparam(phi[0], jax.nn.softplus(phi[1])) @ "mu"

        guide = make_guide(guide_fn)
        iwelbo_grad = vi.IWELBO(
            guide, lambda phi: Target(model, (phi,), g.C["y"].set(2.0)), N=5
        )
        phi = jnp.array([0.0, 0.0])
        bstep = jax.jit(
            lambda k, phi: jnp.mean(
                jax.vmap(lambda kk: iwelbo_grad(kk, (phi,))[0])(
                    jax.random.split(k, 16)
                ),
                0,
            )
        )
        key = KEY
        for _ in range(200):
            key, sub = jax.random.split(key)
            phi = phi - 0.05 * bstep(sub, phi)
        assert phi[0] == pytest.approx(1.0, abs=0.2)


class TestWakeSleep:
    def test_pwake_qwake_gradients_finite(self):
        @g.gen
        def model(phi):
            mu = g.normal(phi[0], 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        @g.gen
        def guide_fn(target):
            phi = target.args[0]
            _ = vi.normal_reparam(phi[1], 1.0) @ "mu"

        guide = make_guide(guide_fn)
        make_target = lambda phi: Target(model, (phi,), g.C["y"].set(2.0))
        pwake_grad = vi.PWake(guide, make_target)
        qwake_grad = vi.QWake(guide, guide, make_target)
        phi = jnp.array([0.0, 0.5])
        (gp,) = pwake_grad(KEY, (phi,))
        (gq,) = qwake_grad(KEY, (phi,))
        assert jnp.all(jnp.isfinite(gp))
        assert jnp.all(jnp.isfinite(gq))


class TestEnumGuides:
    def test_flip_enum_guide_distribution(self):
        """A discrete guide with exact enumeration gradients."""

        @g.gen
        def model(phi):
            b = g.flip(0.5) @ "b"
            _ = g.normal(jnp.where(b, 2.0, -2.0), 0.5) @ "y"

        @g.gen
        def guide_fn(target):
            phi = target.args[0]
            _ = vi.flip_enum(jax.nn.sigmoid(phi)) @ "b"

        guide = make_guide(guide_fn)
        elbo_grad = vi.ELBO(
            guide, lambda phi: Target(model, (phi,), g.C["y"].set(2.0))
        )
        phi = 0.0
        jitted = jax.jit(elbo_grad)
        key = KEY
        for _ in range(150):
            key, sub = jax.random.split(key)
            (grad,) = jitted(sub, (phi,))
            phi -= 0.5 * grad
        # observation strongly supports b=True: guide prob should approach 1
        assert jax.nn.sigmoid(phi) > 0.95
