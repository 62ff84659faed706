"""The staged-edit fallback detector must fail CONSERVATIVE.

``_closure_captures_tracer`` (lang/staged_edit.py) guards the staged
incremental edit path: a local ``@gen`` callee that reaches an upstream
sample through Python closure cells has a dependency the staged Jaxpr
cannot see, so such bodies must take the handler fallback. Round 2 shipped
the detector with unsafe give-up answers — recursion deeper than its depth
cap, or an unflattenable closure value, reported "no tracer" and let the
staged path silently reuse stale subtraces. These tests pin the fix: every
give-up answer is now "captured" (fallback), and a model whose capture
chain is deeper than the cap still produces assess-consistent edits.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.lang.staged_edit import (
    StagingUnsupported,
    _closure_captures_tracer,
    stage_body,
)

KEY = jax.random.key(0)


def _chain_through(levels: int, leaf_value):
    """Build fn_0 -> fn_1 -> ... -> fn_{levels-1} where only the LAST
    function's closure holds ``leaf_value``; each earlier function only
    captures its successor."""

    def make_last(v):
        def last():
            return v

        return last

    fn = make_last(leaf_value)
    for _ in range(levels - 1):

        def make_link(nxt):
            def link():
                return nxt()

            return link

        fn = make_link(fn)
    return fn


class TestDetectorGiveUpAnswers:
    def test_deep_chain_reports_captured(self):
        """A tracer 9+ function-hops away exhausts the depth cap; the
        give-up answer must be True (capture), not False."""
        # build the chain inside a trace so the leaf really is a Tracer
        seen = {}

        def probe(x):
            fn = _chain_through(12, x)
            seen["deep"] = _closure_captures_tracer(fn)
            shallow = _chain_through(2, x)
            seen["shallow"] = _closure_captures_tracer(shallow)
            return x

        jax.make_jaxpr(probe)(jnp.float32(0.0))
        assert seen["shallow"] is True
        assert seen["deep"] is True  # was False before the fix

    def test_deep_chain_without_tracer_is_conservative(self):
        """Past the cap we cannot PROVE tracer-freedom either way, so even
        a tracer-free deep chain reports captured — one slow-but-sound
        fallback, never a stale reuse."""
        fn = _chain_through(12, jnp.float32(1.0))
        assert _closure_captures_tracer(fn) is True

    def test_unflattenable_value_is_conservative(self):
        class Exploding:
            """tree_leaves on an object whose flatten raises."""

            def __iter__(self):
                raise RuntimeError("boom")

        import jax.tree_util as jtu

        @jtu.register_pytree_node_class
        class Hostile:
            def tree_flatten(self):
                raise RuntimeError("boom")

            @classmethod
            def tree_unflatten(cls, aux, children):
                return cls()

        def captor():
            return hostile

        hostile = Hostile()
        assert _closure_captures_tracer(captor) is True


def _make_deep_model(levels: int):
    @g.gen
    def deep_model(mu):
        root = g.normal(mu, 1.0) @ "root"
        reach = _chain_through(levels, root)

        @g.gen
        def leaf():
            c = g.normal(reach(), 0.7) @ "c"
            return c

        out = leaf() @ "dep"
        return out

    return deep_model


class TestDeepClosureModel:
    """End-to-end: a dependency routed through a >cap-deep closure chain."""

    def test_staging_is_refused(self):
        deep_model = _make_deep_model(12)
        with pytest.raises(StagingUnsupported):
            stage_body(deep_model.source, (0.3,))

    def test_edit_stays_assess_consistent(self):
        """Updating "root" must re-score "c" against the NEW root. Before
        the fix the staged path saw no root->dep dependency in the Jaxpr
        and reused the stale "dep" subtrace."""
        deep_model = _make_deep_model(12)
        tr = deep_model.simulate(KEY, (0.3,))
        new_tr, w, _rd, _bwd = tr.edit(
            jax.random.key(1), g.Update(g.C["root"].set(jnp.float32(2.5)))
        )
        score, _ = deep_model.assess(new_tr.get_choices(), (0.3,))
        assert float(new_tr.get_score()) == pytest.approx(
            float(score), abs=1e-4
        )
        assert float(new_tr.get_score()) == pytest.approx(
            float(tr.get_score()) + float(w), abs=1e-4
        )

    def test_shallow_closure_model_still_falls_back(self):
        """The 1-hop capture (the classic local-@gen case) keeps working."""
        deep_model = _make_deep_model(1)
        with pytest.raises(StagingUnsupported):
            stage_body(deep_model.source, (0.3,))
        tr = deep_model.simulate(KEY, (0.3,))
        new_tr, _w, _rd, _bwd = tr.edit(
            jax.random.key(1), g.Update(g.C["root"].set(jnp.float32(-1.0)))
        )
        score, _ = deep_model.assess(new_tr.get_choices(), (0.3,))
        assert float(new_tr.get_score()) == pytest.approx(
            float(score), abs=1e-4
        )
