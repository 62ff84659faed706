"""Edge cases from the reference's deep test suite
(/root/reference/tests/generative_functions/test_static_gen_fn.py et al.):
masked constraints, heterogeneous per-address requests, dynamic closures,
tuple addresses, method models, request combinators."""

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.scipy.stats as jss
import pytest

import genjax_tpu as g
from genjax_tpu import C, S

KEY = jr.key(0)


@g.gen
def simple():
    x = g.normal(0.0, 1.0) @ "x"
    y = g.normal(x, 0.5) @ "y"
    return y


class TestMaskedConstraints:
    def test_generate_with_masked_constraint_valid(self):
        chm = C["x"].set(g.Mask(jnp.asarray(1.5), jnp.asarray(True)))
        tr, w = simple.generate(KEY, chm, ())
        assert tr.get_choices()["x"] == pytest.approx(1.5)
        assert w == pytest.approx(jss.norm.logpdf(1.5, 0.0, 1.0), rel=1e-5)

    def test_generate_with_masked_constraint_invalid(self):
        chm = C["x"].set(g.Mask(jnp.asarray(1.5), jnp.asarray(False)))
        tr, w = simple.generate(KEY, chm, ())
        # invalid constraint -> simulated fresh, weight 0
        assert w == pytest.approx(0.0)
        assert tr.get_choices()["x"] != pytest.approx(1.5)

    def test_update_with_masked_constraint(self):
        tr = simple.simulate(KEY, ())
        old_x = float(tr.get_choices()["x"])
        chm = C["x"].set(g.Mask(jnp.asarray(2.0), jnp.asarray(False)))
        new_tr, w, _, _ = tr.update(jr.key(1), chm)
        # invalid mask -> no change
        assert new_tr.get_choices()["x"] == pytest.approx(old_x)


class TestStaticRequest:
    def test_heterogeneous_per_address_requests(self):
        tr = simple.simulate(KEY, ())
        old = tr.get_choices()
        req = g.StaticRequest.d(
            {
                "x": g.Update(g.ChoiceMap.choice(0.7)),
                "y": g.Regenerate(g.Selection.all()),
            }
        )
        new_tr, w, _rd, bwd = tr.edit(jr.key(1), req)
        assert new_tr.get_choices()["x"] == pytest.approx(0.7)
        assert new_tr.get_choices()["y"] != pytest.approx(float(old["y"]))
        assert new_tr.get_score() == pytest.approx(float(tr.get_score() + w), rel=1e-4)

    def test_empty_request_noop(self):
        tr = simple.simulate(KEY, ())
        new_tr, w, _rd, _ = tr.edit(jr.key(1), g.EmptyRequest())
        assert w == pytest.approx(0.0)
        assert new_tr.get_score() == pytest.approx(float(tr.get_score()))


class TestClosures:
    def test_pytree_partial_dynamic_capture(self):
        """A model closing over a *traced* value via Pytree.partial."""

        def make_model(shift):
            @g.gen
            @g.Pytree.partial(shift)
            def model(shift):
                return g.normal(shift, 1.0) @ "x"

            return model

        def run(shift):
            m = make_model(shift)
            tr = m.simulate(KEY, ())
            return tr.get_score(), tr.get_choices()["x"]

        score, x = jax.jit(run)(3.0)
        assert score == pytest.approx(jss.norm.logpdf(float(x), 3.0, 1.0), rel=1e-5)

    def test_method_model(self):
        class Thing(g.Pytree):
            pass

        @g.Pytree.dataclass
        class Model(g.Pytree):
            loc: float

            @g.gen
            def sample_me(self):
                return g.normal(self.loc, 1.0) @ "x"

        m = Model(2.0)
        tr = m.sample_me().simulate(KEY)
        x = tr.get_choices()["x"]
        assert tr.get_score() == pytest.approx(
            jss.norm.logpdf(float(x), 2.0, 1.0), rel=1e-5
        )


class TestTupleAddresses:
    def test_tuple_address_binding(self):
        @g.gen
        def model():
            a = g.normal(0.0, 1.0) @ ("lvl", "a")
            return a

        tr = model.simulate(KEY, ())
        assert tr.get_choices()["lvl", "a"] is not None
        score, _ = model.assess(tr.get_choices(), ())
        assert score == pytest.approx(float(tr.get_score()), rel=1e-5)


class TestSwitchIndexChange:
    def test_edit_with_changed_index(self):
        @g.gen
        def b0():
            return g.normal(0.0, 1.0) @ "n"

        @g.gen
        def b1():
            return g.normal(5.0, 1.0) @ "m"

        sw = g.switch(b0, b1)
        tr = sw.simulate(KEY, (0, (), ()))
        argdiffs = (
            g.Diff(1, g.UnknownChange),
            g.Diff((), g.NoChange),
            g.Diff((), g.NoChange),
        )
        new_tr, w, _rd, _bwd = sw.edit(
            jr.key(1), tr, g.Update(g.ChoiceMap.empty()), argdiffs
        )
        m = new_tr.get_choices()["m"]
        m = m.unmask() if isinstance(m, g.Mask) else m
        assert abs(float(m) - 5.0) < 5.0
        # branch-swap weight, Gen update spec: the unconstrained new-branch
        # value is an internal-proposal draw whose density cancels, leaving
        # minus the old branch's score. (The reference adds the new score
        # on top — its own switch.py:293-298 double-count; deviation
        # documented in ARCHITECTURE.md §Deviations.)
        assert w == pytest.approx(float(-tr.get_score()), rel=1e-4)
        # a fully-constrained swap DOES satisfy the score-delta identity
        donor = sw.simulate(jr.key(9), (1, (), ()))
        full_tr, full_w, _, full_bwd = sw.edit(
            jr.key(2), tr, g.Update(donor.get_choices()), argdiffs
        )
        assert full_w == pytest.approx(
            float(full_tr.get_score() - tr.get_score()), rel=1e-4
        )
        # and round-trips exactly through the backward request
        back_argdiffs = (
            g.Diff(0, g.UnknownChange),
            g.Diff((), g.NoChange),
            g.Diff((), g.NoChange),
        )
        back, wb, _, _ = sw.edit(jr.key(3), full_tr, full_bwd, back_argdiffs)
        assert float(full_w + wb) == pytest.approx(0.0, abs=1e-5)
        assert float(back.get_score()) == pytest.approx(
            float(tr.get_score()), abs=1e-5
        )


class TestDiffAnnotate:
    def test_diff_annotate_wraps_request(self):
        tr = simple.simulate(KEY, ())
        seen = {}

        def record_retdiff(rd):
            seen["rd"] = rd
            return rd

        req = g.Update(C["x"].set(1.0)).map(record_retdiff)
        new_tr, w, _rd, _ = tr.edit(jr.key(1), req)
        assert "rd" in seen
        assert new_tr.get_choices()["x"] == pytest.approx(1.0)


class TestVectorizedMask:
    def test_unmask_with_vector_flags(self):
        vals = jnp.arange(4.0)
        flags = jnp.array([True, False, True, False])
        m = g.Mask(vals, flags)
        out = m.unmask(default=jnp.full(4, -1.0))
        assert jnp.allclose(out, jnp.array([0.0, -1.0, 2.0, -1.0]))

    def test_mask_or_prefers_valid(self):
        a = g.Mask(jnp.asarray(1.0), jnp.asarray(False))
        b = g.Mask(jnp.asarray(2.0), jnp.asarray(True))
        c = a | b
        assert bool(c.primal_flag())
        assert c.value == pytest.approx(2.0)
