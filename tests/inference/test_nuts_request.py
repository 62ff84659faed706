"""Trace-based NUTS edit request (inference/requests/nuts.py): posterior
recovery over arbitrary @gen models through the GFI, validated against
conjugate closed forms — the same standard as the HMC request tests."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g

KEY = jax.random.key(314159)


class TestNUTSRequest:
    def test_conjugate_posterior_recovery(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        obs = g.C["y"].set(2.0)

        def one_chain(k):
            k0, k1 = jax.random.split(k)
            tr, _ = model.generate(k0, obs, ())

            def step(tr, kk):
                new_tr, w, _, _ = tr.edit(kk, g.NUTS(g.S["mu"], 0.4))
                return new_tr, new_tr.get_choices()["mu"]

            _, draws = jax.lax.scan(step, tr, jax.random.split(k1, 40))
            return draws[-1]

        finals = jax.jit(jax.vmap(one_chain))(jax.random.split(KEY, 512))
        # exact posterior: N(1, 1/2)
        assert jnp.mean(finals) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(finals) == pytest.approx(
            1.0 / jnp.sqrt(2.0), abs=0.08
        )

    def test_multi_address_and_vector_choices(self):
        """NUTS ravels several selected addresses (scalar + vector) into
        one position; the anisotropic posterior scales must come back."""

        @g.gen
        def model():
            a = g.normal(0.0, 2.0) @ "a"
            b = g.mv_normal_diag(jnp.zeros(3), 0.5 * jnp.ones(3)) @ "b"
            return a + jnp.sum(b)

        def one_chain(k):
            k0, k1 = jax.random.split(k)
            tr = model.simulate(k0, ())

            def step(tr, kk):
                new_tr, _, _, _ = tr.edit(
                    kk, g.NUTS(g.S["a"] | g.S["b"], 0.25)
                )
                return new_tr, (
                    new_tr.get_choices()["a"],
                    new_tr.get_choices()["b"],
                )

            _, (a_d, b_d) = jax.lax.scan(step, tr, jax.random.split(k1, 30))
            return a_d[-1], b_d[-1]

        a_f, b_f = jax.jit(jax.vmap(one_chain))(jax.random.split(KEY, 512))
        assert jnp.std(a_f) == pytest.approx(2.0, rel=0.15)
        assert jnp.std(b_f) == pytest.approx(0.5, rel=0.2)

    def test_inv_mass_recovers_anisotropic_scales(self):
        """A 100x-conditioned target mixes with few doublings when the
        diagonal inverse mass matches the posterior variances."""
        scales = jnp.array([0.1, 10.0])

        @g.gen
        def model():
            _ = g.mv_normal_diag(jnp.zeros(2), scales) @ "x"

        inv_mass = scales**2

        def one_chain(k):
            k0, k1 = jax.random.split(k)
            tr = model.simulate(k0, ())

            def step(tr, kk):
                new_tr, _, _, _ = tr.edit(
                    kk,
                    g.NUTS(g.S["x"], 0.15, max_depth=6, inv_mass=inv_mass),
                )
                return new_tr, new_tr.get_choices()["x"]

            _, draws = jax.lax.scan(step, tr, jax.random.split(k1, 30))
            return draws[-1]

        finals = jax.jit(jax.vmap(one_chain))(jax.random.split(KEY, 384))
        assert jnp.allclose(
            jnp.std(finals, axis=0), scales, rtol=0.2
        ), jnp.std(finals, axis=0)

    def test_weight_zero_and_untouched_choices_fixed(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        tr = model.simulate(KEY, ())
        y0 = float(tr.get_choices()["y"])
        new_tr, w, _, bwd = tr.edit(
            jax.random.key(1), g.NUTS(g.S["mu"], 0.3)
        )
        assert float(w) == 0.0
        assert float(new_tr.get_choices()["y"]) == y0
        assert isinstance(bwd, g.NUTS)
        # trace stays internally consistent
        score, _ = model.assess(new_tr.get_choices(), ())
        assert jnp.allclose(new_tr.get_score(), score, atol=1e-5)

    def test_nuts_in_mh_driver_and_changed_args_rejected(self):
        @g.gen
        def model(s):
            return g.normal(0.0, s) @ "x"

        tr = model.simulate(KEY, (1.0,))
        new_tr, accepted = g.mh(
            jax.random.key(2), tr, g.NUTS(g.S["x"], 0.5)
        )
        assert bool(accepted)  # α = 0 accepts always; NUTS is internal
        with pytest.raises(NotImplementedError):
            g.NUTS(g.S["x"], 0.5).edit(
                jax.random.key(3), tr, (g.Diff(2.0, g.UnknownChange),)
            )
