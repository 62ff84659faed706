"""GFI contract tests for the @gen static language (reference:
tests/generative_functions/test_static_gen_fn.py, 1163 LoC)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.scipy.stats as jss
import pytest

import genjax_tpu as g
from genjax_tpu import C, S


@g.gen
def simple_normal():
    y1 = g.normal(0.0, 1.0) @ "y1"
    y2 = g.normal(0.0, 1.0) @ "y2"
    return y1 + y2


@g.gen
def hierarchical():
    x = g.normal(0.0, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


class TestSimulate:
    def test_score_is_logpdf_sum(self):
        key = jr.key(314159)
        tr = simple_normal.simulate(key, ())
        chm = tr.get_choices()
        y1, y2 = chm["y1"], chm["y2"]
        expected = jss.norm.logpdf(y1) + jss.norm.logpdf(y2)
        assert tr.get_score() == pytest.approx(expected, abs=1e-5)
        assert tr.get_retval() == pytest.approx(y1 + y2, abs=1e-6)

    def test_jit_simulate(self):
        key = jr.key(0)
        tr = jax.jit(simple_normal.simulate)(key, ())
        assert jnp.isfinite(tr.get_score())

    def test_keys_differ_across_addresses(self):
        tr = simple_normal.simulate(jr.key(1), ())
        chm = tr.get_choices()
        assert chm["y1"] != chm["y2"]

    def test_subtrace_access(self):
        tr = hierarchical.simulate(jr.key(2), ())
        sub = tr.get_subtrace("x")
        assert sub.get_retval() == tr.get_choices()["x"]

    def test_address_reuse_raises(self):
        @g.gen
        def dup():
            g.normal(0.0, 1.0) @ "x"
            g.normal(0.0, 1.0) @ "x"

        with pytest.raises(g.AddressReuse):
            dup.simulate(jr.key(0), ())


class TestAssess:
    def test_assess_correctness(self):
        chm = C["x"].set(1.0) | C["y"].set(0.5)
        score, ret = hierarchical.assess(chm, ())
        expected = jss.norm.logpdf(1.0) + jss.norm.logpdf(0.5, 1.0, 0.5)
        assert score == pytest.approx(expected, abs=1e-5)
        assert ret == 0.5

    def test_assess_missing_address_raises(self):
        with pytest.raises(g.MissingAddress):
            hierarchical.assess(C["x"].set(1.0), ())


class TestImportance:
    def test_importance_weight_correctness(self):
        key = jr.key(42)
        obs = C["y"].set(0.3)
        tr, w = hierarchical.importance(key, obs, ())
        x = tr.get_choices()["x"]
        # weight = logpdf of constrained address given sampled latents
        expected = jss.norm.logpdf(0.3, x, 0.5)
        assert w == pytest.approx(expected, abs=1e-5)

    def test_full_constraint_weight_is_score(self):
        key = jr.key(43)
        chm = C["x"].set(0.2) | C["y"].set(0.3)
        tr, w = hierarchical.importance(key, chm, ())
        assert w == pytest.approx(tr.get_score(), abs=1e-5)

    def test_empty_constraint_weight_zero(self):
        tr, w = hierarchical.importance(jr.key(44), g.ChoiceMap.empty(), ())
        assert w == pytest.approx(0.0, abs=1e-6)


class TestUpdate:
    def test_update_weight_correctness(self):
        key = jr.key(7)
        tr = hierarchical.simulate(key, ())
        old_score = tr.get_score()
        new_tr, w, _rd, discard = tr.update(jr.key(8), C["x"].set(2.0))
        assert new_tr.get_choices()["x"] == 2.0
        # y unchanged
        assert new_tr.get_choices()["y"] == tr.get_choices()["y"]
        # weight identity: w = new_score - old_score for pure overwrite
        assert w == pytest.approx(new_tr.get_score() - old_score, abs=1e-5)
        # discard holds the old value
        assert discard["x"] == pytest.approx(tr.get_choices()["x"], abs=1e-6)

    def test_update_roundtrip(self):
        key = jr.key(9)
        tr = hierarchical.simulate(key, ())
        new_tr, w1, _, discard = tr.update(jr.key(10), C["x"].set(2.0))
        back_tr, w2, _, _ = new_tr.update(jr.key(11), discard)
        assert back_tr.get_score() == pytest.approx(tr.get_score(), abs=1e-5)
        assert w1 + w2 == pytest.approx(0.0, abs=1e-5)


class TestRegenerate:
    def test_regenerate_weight(self):
        key = jr.key(12)
        tr = hierarchical.simulate(key, ())
        req = g.Regenerate(S["x"])
        new_tr, w, _rd, _bwd = tr.edit(jr.key(13), req)
        # regenerated x differs, y same
        assert new_tr.get_choices()["x"] != tr.get_choices()["x"]
        assert new_tr.get_choices()["y"] == tr.get_choices()["y"]
        # Reference semantics (tests/inference/test_requests.py:118-121): the
        # Regenerate weight is the joint-density ratio.
        expected = new_tr.get_score() - tr.get_score()
        assert w == pytest.approx(expected, abs=1e-5)

    def test_regenerate_roundtrip(self):
        tr = hierarchical.simulate(jr.key(50), ())
        req = g.Regenerate(S["x"])
        new_tr, w1, _, bwd = tr.edit(jr.key(51), req)
        back_tr, w2, _, _ = new_tr.edit(jr.key(52), bwd)
        # backward request restores the old value and cancels the weight
        assert back_tr.get_choices()["x"] == pytest.approx(
            tr.get_choices()["x"], abs=1e-6
        )
        assert w1 + w2 == pytest.approx(0.0, abs=1e-5)


class TestProject:
    def test_project_all_is_score(self):
        tr = simple_normal.simulate(jr.key(14), ())
        w = tr.project(jr.key(15), g.Selection.all())
        assert w == pytest.approx(tr.get_score(), abs=1e-6)

    def test_project_subset(self):
        tr = simple_normal.simulate(jr.key(16), ())
        w = tr.project(jr.key(17), S["y1"])
        y1 = tr.get_choices()["y1"]
        assert w == pytest.approx(jss.norm.logpdf(y1), abs=1e-5)

    def test_project_none_zero(self):
        tr = simple_normal.simulate(jr.key(18), ())
        assert tr.project(jr.key(19), g.Selection.none()) == pytest.approx(0.0)


class TestArgsAndNesting:
    def test_args(self):
        @g.gen
        def scaled(mu, sigma):
            return g.normal(mu, sigma) @ "v"

        tr = scaled.simulate(jr.key(20), (1.0, 2.0))
        v = tr.get_choices()["v"]
        assert tr.get_score() == pytest.approx(jss.norm.logpdf(v, 1.0, 2.0), abs=1e-5)

    def test_nested_gen_call(self):
        @g.gen
        def inner(mu):
            return g.normal(mu, 1.0) @ "z"

        @g.gen
        def outer():
            x = g.normal(0.0, 1.0) @ "x"
            return inner(x) @ "sub"

        tr = outer.simulate(jr.key(21), ())
        chm = tr.get_choices()
        z = chm["sub", "z"]
        x = chm["x"]
        expected = jss.norm.logpdf(x) + jss.norm.logpdf(z, x, 1.0)
        assert tr.get_score() == pytest.approx(expected, abs=1e-5)
        # assess through nesting
        score, _ = outer.assess(chm, ())
        assert score == pytest.approx(expected, abs=1e-5)

    def test_kwargs(self):
        @g.gen
        def kw_model(mu, scale=1.0):
            return g.normal(mu, scale) @ "v"

        @g.gen
        def caller():
            return kw_model(0.0, scale=2.0) @ "k"

        tr = caller.simulate(jr.key(22), ())
        v = tr.get_choices()["k", "v"]
        assert tr.get_score() == pytest.approx(jss.norm.logpdf(v, 0.0, 2.0), abs=1e-5)

    def test_distribution_kwargs(self):
        """Distributions accept their TFP-named parameters as keywords,
        including through the staged edit path."""

        @g.gen
        def m():
            return g.normal(0.0, scale=2.0) @ "x"

        tr = m.simulate(jr.key(30), ())
        x = tr.get_choices()["x"]
        assert tr.get_score() == pytest.approx(
            jss.norm.logpdf(x, 0.0, 2.0), abs=1e-5
        )
        new_tr, w, _, bwd = tr.edit(jr.key(31), g.Update(g.C["x"].set(0.5)))
        back, wb, _, _ = new_tr.edit(jr.key(32), bwd)
        assert float(w + wb) == pytest.approx(0.0, abs=1e-5)
        score, _ = m.assess(new_tr.get_choices(), ())
        assert float(new_tr.get_score()) == pytest.approx(
            float(score), abs=1e-5
        )

    def test_partial_apply(self):
        @g.gen
        def two_arg(a, b):
            return g.normal(a, b) @ "v"

        one = two_arg.partial_apply(3.0)
        tr = one.simulate(jr.key(23), (1.0,))
        v = tr.get_choices()["v"]
        assert tr.get_score() == pytest.approx(jss.norm.logpdf(v, 3.0, 1.0), abs=1e-5)

    def test_inline(self):
        @g.gen
        def sub():
            return g.normal(0.0, 1.0) @ "z"

        @g.gen
        def outer():
            return sub.inline()

        tr = outer.simulate(jr.key(24), ())
        assert "z" in tr.get_choices()


class TestVmapSimulate:
    def test_vmapped_model(self):
        keys = jr.split(jr.key(25), 16)
        trs = jax.vmap(lambda k: simple_normal.simulate(k, ()))(keys)
        assert trs.get_score().shape == (16,)
        chm = trs.get_choices()
        # vmapped trace choices keep the batch axis on leaves
        assert chm["y1"].shape == (16,)


class TestTupleAddressSubtrace:
    def test_get_subtrace_whole_tuple_address(self):
        """A model tracing at a tuple address records it WHOLE; get_subtrace
        must find it (reference generative_function.py:217-222)."""

        @g.gen
        def model():
            _ = g.normal(0.0, 1.0) @ ("a", "b")

        tr = model.simulate(jax.random.key(0), ())
        sub = tr.get_subtrace(("a", "b"))
        assert float(sub.get_score()) == pytest.approx(
            float(tr.get_score())
        )

    def test_get_subtrace_nested_components_still_work(self):
        @g.gen
        def inner():
            _ = g.normal(0.0, 1.0) @ "w"

        @g.gen
        def outer():
            _ = inner() @ "sub"

        tr = outer.simulate(jax.random.key(0), ())
        sub = tr.get_subtrace(("sub", "w"))
        assert float(sub.get_score()) == pytest.approx(float(tr.get_score()))
