"""Runtime type validation at the GFI boundary (the reference's
beartype-on-import layer, rebuilt without beartype — see
genjax_tpu/typecheck.py)."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.typecheck import GFITypeError


@g.gen
def model(mu):
    return g.normal(mu, 1.0) @ "x"


KEY = jax.random.key(0)


class TestBoundaryChecks:
    def test_simulate_rejects_non_key(self):
        with pytest.raises(GFITypeError, match="PRNG key"):
            model.simulate(42, (0.0,))

    def test_simulate_rejects_non_tuple_args(self):
        with pytest.raises(GFITypeError, match="tuple"):
            model.simulate(KEY, 0.0)

    def test_generate_rejects_dict_constraint(self):
        with pytest.raises(GFITypeError, match="ChoiceMap.d"):
            model.generate(KEY, {"x": 1.0}, (0.0,))

    def test_assess_rejects_non_choicemap(self):
        with pytest.raises(GFITypeError, match="ChoiceMap"):
            model.assess([("x", 1.0)], (0.0,))

    def test_legacy_uint32_keys_accepted(self):
        legacy = jax.random.PRNGKey(0)  # shape (2,) uint32
        tr = model.simulate(legacy, (0.0,))
        assert jnp.isfinite(tr.get_score())

    def test_valid_calls_unaffected(self):
        tr = model.simulate(KEY, (0.0,))
        tr2, w = model.generate(KEY, g.C["x"].set(1.0), (0.0,))
        s, _ = model.assess(g.C["x"].set(1.0), (0.0,))
        assert jnp.isfinite(s)

    def test_checks_work_under_jit_and_vmap(self):
        out = jax.jit(
            lambda k: model.simulate(k, (0.0,)).get_score()
        )(KEY)
        assert jnp.isfinite(out)
        outs = jax.vmap(
            lambda k: model.simulate(k, (0.0,)).get_score()
        )(jax.random.split(KEY, 4))
        assert outs.shape == (4,)


class TestImportHook:
    def test_install_import_hook_returns_manager(self):
        # narrow scope: whole-package checking under typeguard 2.x is a
        # sys.setprofile sweep over every frame — minutes of overhead on a
        # tracing-heavy call like simulate (observed 336s under xdist
        # contention). One submodule proves the hook end-to-end.
        from genjax_tpu.typecheck import install_import_hook

        hook = install_import_hook("genjax_tpu.generative.selection")
        assert hasattr(hook, "uninstall") or hasattr(hook, "__exit__")
        # usable as a context manager around checked calls
        with hook:
            tr = model.simulate(KEY, (0.0,))
            assert jnp.isfinite(tr.get_score())

    def test_default_scope_is_whole_package(self):
        from genjax_tpu.typecheck import install_import_hook

        hook = install_import_hook()
        try:
            assert hasattr(hook, "uninstall") or hasattr(hook, "__exit__")
        finally:
            # typeguard >= 3 registers a global meta-path finder at call
            # time — never leak it into the rest of the session
            if hasattr(hook, "uninstall"):
                hook.uninstall()
