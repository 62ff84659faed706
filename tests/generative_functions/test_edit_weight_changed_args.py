"""Edit-weight identities under CHANGED top-level arguments.

VERDICT round-1 item 6 — the reference's update-correctness family
(tests/generative_functions/test_static_gen_fn.py:441,669) checks
hand-computed weights for Update/Regenerate; the conservative-retdiff risk
in this build is precisely edits with changed argdiffs across nested
combinators, so every test here passes non-trivial argdiffs.

Two kinds of assertion:

- hand-computed: per-address score deltas summed by hand for the linked
  normal chain (and its curried / method / pytree-arg variants);
- the substitution identity: when an Update supplies values (or retains
  old ones) at every address — no fresh sampling — the weight must equal
  ``assess(new_choices, new_args) - assess(old_choices, old_args)``,
  checked through deep scan-in-switch-in-vmap compositions.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st
import pytest

import genjax_tpu as g
from genjax_tpu.core.diff import Diff

KEY = jax.random.key(314159)


def nlogpdf(x, mu, s=1.0):
    return float(st.norm.logpdf(x, mu, s))


@g.gen
def linked(mu):
    y1 = g.normal(mu, 1.0) @ "y1"
    y2 = g.normal(y1, 1.0) @ "y2"
    y3 = g.normal(y1 + y2, 1.0) @ "y3"
    return y1 + y2 + y3


class TestHandComputedWeights:
    def test_update_with_changed_arg_and_constraint(self):
        tr = jax.jit(linked.simulate)(KEY, (0.0,))
        y1o, y2o, y3o = (float(tr.get_choices()[a]) for a in ("y1", "y2", "y3"))
        new_mu, new_y1 = 1.5, 2.0
        new_tr, w, _, bwd = linked.edit(
            jax.random.key(1),
            tr,
            g.Update(g.C["y1"].set(new_y1)),
            (Diff.unknown_change(new_mu),),
        )
        # every address re-scores: y1 under (new value, new mu); y2, y3
        # keep their values but y1 changed upstream
        expected = (
            nlogpdf(new_y1, new_mu) - nlogpdf(y1o, 0.0)
            + nlogpdf(y2o, new_y1) - nlogpdf(y2o, y1o)
            + nlogpdf(y3o, new_y1 + y2o) - nlogpdf(y3o, y1o + y2o)
        )
        assert float(w) == pytest.approx(expected, abs=1e-4)
        # trace invariants
        score, _ = linked.assess(new_tr.get_choices(), (new_mu,))
        assert float(new_tr.get_score()) == pytest.approx(float(score), abs=1e-4)
        # SMCP3 round trip (argdiffs back to the old argument)
        back, wb, _, _ = linked.edit(
            jax.random.key(2), new_tr, bwd, (Diff.unknown_change(0.0),)
        )
        assert float(w + wb) == pytest.approx(0.0, abs=1e-4)
        assert float(back.get_score()) == pytest.approx(
            float(tr.get_score()), abs=1e-4
        )

    def test_update_changed_arg_no_constraint(self):
        """Changed args, empty constraint: only the mu-dependent address
        re-scores (y1's value is retained; y2/y3 see no changed inputs)."""
        tr = jax.jit(linked.simulate)(KEY, (0.0,))
        y1o = float(tr.get_choices()["y1"])
        new_mu = -0.7
        _, w, _, _ = linked.edit(
            jax.random.key(1),
            tr,
            g.Update(g.C.empty()),
            (Diff.unknown_change(new_mu),),
        )
        expected = nlogpdf(y1o, new_mu) - nlogpdf(y1o, 0.0)
        assert float(w) == pytest.approx(expected, abs=1e-4)

    def test_regenerate_with_changed_arg(self):
        """Regenerate y1 under a changed mu. The implemented (documented —
        ARCHITECTURE.md §Deviations 3) Regenerate weight is the joint
        score delta, round-trip cancellable: the new y1 scores under the
        new args, the old y1's score is removed at the old args, and the
        downstream addresses re-score under the new y1."""
        tr = jax.jit(linked.simulate)(KEY, (0.0,))
        y2o, y3o = (float(tr.get_choices()[a]) for a in ("y2", "y3"))
        y1o = float(tr.get_choices()["y1"])
        new_mu = 2.0
        new_tr, w, _, bwd = linked.edit(
            jax.random.key(5),
            tr,
            g.Regenerate(g.S["y1"]),
            (Diff.unknown_change(new_mu),),
        )
        y1n = float(new_tr.get_choices()["y1"])
        assert y1n != y1o
        expected = (
            nlogpdf(y1n, new_mu) - nlogpdf(y1o, 0.0)
            + nlogpdf(y2o, y1n) - nlogpdf(y2o, y1o)
            + nlogpdf(y3o, y1n + y2o) - nlogpdf(y3o, y1o + y2o)
        )
        assert float(w) == pytest.approx(expected, abs=1e-4)
        # round-trip cancellation under the reverse argdiffs
        back, wb, _, _ = linked.edit(
            jax.random.key(6), new_tr, bwd, (Diff.unknown_change(0.0),)
        )
        assert float(w + wb) == pytest.approx(0.0, abs=1e-4)
        assert float(back.get_score()) == pytest.approx(
            float(tr.get_score()), abs=1e-4
        )

    def test_curried_and_method_variants(self):
        @g.gen
        def curried(v1, v2, v3):
            y1 = g.normal(0.0, v1) @ "y1"
            y2 = g.normal(y1, v2) @ "y2"
            y3 = g.normal(y1 + y2, v3) @ "y3"
            return y1 + y2 + y3

        for model, args in [
            (curried.partial_apply(1.0, 1.0), (1.0,)),
            (curried.partial_apply(1.0), (1.0, 1.0)),
        ]:
            tr = model.simulate(KEY, args)
            y1o, y2o, y3o = (
                float(tr.get_choices()[a]) for a in ("y1", "y2", "y3")
            )
            new_last = 2.0  # change the final scale argument
            new_args = args[:-1] + (new_last,)
            _, w, _, _ = model.edit(
                jax.random.key(3),
                tr,
                g.Update(g.C["y1"].set(0.5)),
                Diff.tree_diff_unknown_change(new_args),
            )
            expected = (
                nlogpdf(0.5, 0.0) - nlogpdf(y1o, 0.0)
                + nlogpdf(y2o, 0.5) - nlogpdf(y2o, y1o)
                + nlogpdf(y3o, 0.5 + y2o, new_last)
                - nlogpdf(y3o, y1o + y2o, 1.0)
            )
            assert float(w) == pytest.approx(expected, abs=1e-4)

    def test_pytree_argument_update(self):
        @g.Pytree.dataclass
        class Params(g.Pytree):
            x: float
            y: float

        @g.gen
        def with_tree(tree):
            return g.normal(tree.x, tree.y) @ "y1"

        tr = jax.jit(with_tree.simulate)(KEY, (Params(0.0, 1.0),))
        y1o = float(tr.get_choices()["y1"])
        new_tree = Params(1.0, 2.0)
        new_tr, w, _, _ = with_tree.edit(
            jax.random.key(7),
            tr,
            g.Update(g.C.empty()),
            (Diff.unknown_change(new_tree),),
        )
        assert float(w) == pytest.approx(
            nlogpdf(y1o, 1.0, 2.0) - nlogpdf(y1o, 0.0, 1.0), abs=1e-4
        )


class TestSubstitutionIdentityDeepCompositions:
    """When the edit substitutes/retains values everywhere (no fresh
    sampling), weight == assess(new)-assess(old) under the new args."""

    def _check(self, model, args, new_args, tr, constraint, argdiffs=None):
        if argdiffs is None:
            argdiffs = Diff.tree_diff_unknown_change(new_args)
        new_tr, w, _, _ = model.edit(
            jax.random.key(11), tr, g.Update(constraint), argdiffs
        )
        new_score, _ = model.assess(new_tr.get_choices(), new_args)
        old_score, _ = model.assess(tr.get_choices(), args)
        assert float(w) == pytest.approx(
            float(new_score) - float(old_score), abs=1e-3
        )
        assert float(new_tr.get_score()) == pytest.approx(
            float(new_score), abs=1e-3
        )

    def test_scan_changed_init_carry(self):
        @g.gen
        def kern(c, x):
            z = g.normal(0.8 * c + x, 1.0) @ "z"
            return (z, z)

        sc = kern.scan()
        xs = jnp.linspace(-1, 1, 6)
        tr = jax.jit(sc.simulate)(KEY, (0.0, xs))
        self._check(sc, (0.0, xs), (1.0, xs), tr, g.C[2, "z"].set(0.3))

    def test_vmap_changed_args(self):
        @g.gen
        def point(mu):
            return g.normal(mu, 1.0) @ "x"

        vm = point.vmap(in_axes=(0,))
        mus = jnp.arange(4.0)
        tr = jax.jit(vm.simulate)(KEY, (mus,))
        self._check(vm, (mus,), (mus + 0.5,), tr, g.C[1, "x"].set(0.9))

    def test_scan_in_switch_in_vmap(self):
        """The deep composition from the VERDICT: a scanned kernel inside a
        switch inside a vmap, edited with changed args everywhere."""

        @g.gen
        def kern_a(c, x):
            z = g.normal(0.5 * c, 1.0) @ "z"
            return (z, z)

        @g.gen
        def kern_b(c, x):
            z = g.normal(c + 1.0, 2.0) @ "z"
            return (z, z)

        branch_a = kern_a.scan(n=3)
        branch_b = kern_b.scan(n=3)
        sw = g.switch(branch_a, branch_b)

        @g.gen
        def per_lane(idx, init):
            out = sw(idx, (init, None), (init, None)) @ "seq"
            return out

        vm = per_lane.vmap(in_axes=(0, 0))
        idxs = jnp.asarray([0, 1, 0])
        inits = jnp.asarray([0.0, 1.0, -1.0])
        tr = jax.jit(vm.simulate)(KEY, (idxs, inits))
        # changed inits (same branch indices, stated precisely: the index
        # argdiff is NoChange — an UnknownChange index takes the
        # fresh-branch transition semantics, which resamples), one
        # constrained lane/slice
        constraint = g.C[1, "seq", 1, "z"].set(0.25)
        self._check(
            vm,
            (idxs, inits),
            (idxs, inits + 0.3),
            tr,
            constraint,
            argdiffs=(Diff.no_change(idxs), Diff.unknown_change(inits + 0.3)),
        )

    def test_switch_same_index_changed_branch_arg(self):
        @g.gen
        def b0(mu):
            return g.normal(mu, 1.0) @ "a"

        @g.gen
        def b1(mu):
            return g.normal(mu, 2.0) @ "b"

        sw = g.switch(b0, b1)
        args = (0, (0.5,), (0.5,))
        tr = jax.jit(sw.simulate)(KEY, args)
        new_args = (0, (1.5,), (0.5,))
        # index stated unchanged: an UnknownChange index takes the
        # branch-transition semantics (fresh internal-proposal draws whose
        # density cancels), for which the score-delta identity doesn't hold
        argdiffs = (
            Diff.no_change(0),
            Diff.unknown_change((1.5,)),
            Diff.no_change((0.5,)),
        )
        self._check(sw, args, new_args, tr, g.C.empty(), argdiffs=argdiffs)


class TestChangedCalleeClosure:
    """When the CALLEE itself carries changed dynamic leaves (a
    re-partial_apply-ed closure built from the model argument), the
    sub-edit must score under the NEW closure values — the previous
    subtrace's gen_fn is stale."""

    def test_update_rescores_partial_apply_closure(self):
        import jax.scipy.stats as jss

        @g.gen
        def inner(shift):
            _ = g.normal(shift, 1.0) @ "w"

        @g.gen
        def outer(shift):
            k = inner.partial_apply(shift)
            _ = k() @ "sub"

        tr = outer.simulate(jax.random.key(0), (0.0,))
        w_val = tr.get_choices()["sub", "w"]
        argdiffs = (Diff.unknown_change(5.0),)
        new_tr, w, _rd, _bwd = tr.update(
            jax.random.key(1), g.ChoiceMap.empty(), argdiffs
        )
        expected = float(
            jss.norm.logpdf(w_val, 5.0, 1.0) - jss.norm.logpdf(w_val, 0.0, 1.0)
        )
        assert float(w) == pytest.approx(expected, abs=1e-5)
        assert float(new_tr.get_score()) == pytest.approx(
            float(jss.norm.logpdf(w_val, 5.0, 1.0)), abs=1e-5
        )

    def test_staticrequest_rescores_partial_apply_closure(self):
        """The StaticRequest wrapping must not defeat the stale-closure
        rescore (it routes through the current gen_fn like Update)."""
        import jax.scipy.stats as jss

        from genjax_tpu.lang.static_lang import StaticRequest

        @g.gen
        def inner(shift):
            _ = g.normal(shift, 1.0) @ "w"

        @g.gen
        def outer(shift):
            k = inner.partial_apply(shift)
            _ = k() @ "sub"

        tr = outer.simulate(jax.random.key(0), (0.0,))
        w_val = tr.get_choices()["sub", "w"]
        req = StaticRequest.d({"sub": StaticRequest.d({})})
        new_tr, w, _rd, _bwd = tr.edit(
            jax.random.key(1), req, (Diff.unknown_change(5.0),)
        )
        expected = float(
            jss.norm.logpdf(w_val, 5.0, 1.0) - jss.norm.logpdf(w_val, 0.0, 1.0)
        )
        assert float(w) == pytest.approx(expected, abs=1e-5)
        assert float(new_tr.get_score()) == pytest.approx(
            float(jss.norm.logpdf(w_val, 5.0, 1.0)), abs=1e-5
        )

    def test_edited_trace_treedef_stable_with_local_genfn(self):
        """Bodies that define a local @gen callee per execution must keep
        the edited trace's treedef equal to the original's (MH/SMC
        tree_map old-vs-new)."""
        import jax.tree_util as jtu

        @g.gen
        def model(mu):
            @g.gen
            def point():
                _ = g.normal(mu, 1.0) @ "x"

            _ = point() @ "p"

        tr = model.simulate(jax.random.key(0), (0.0,))
        new_tr, _w, _rd, _bwd = tr.edit(
            jax.random.key(1),
            g.Regenerate(g.S["p"]),
            (Diff.no_change(0.0),),
        )
        assert jtu.tree_structure(new_tr) == jtu.tree_structure(tr)
        # and the tree_map MH would perform works
        merged = jtu.tree_map(lambda a, b: a, new_tr, tr)
        assert merged is not None

    def test_local_genfn_python_closure_rescored(self):
        """A local @gen function captures upstream samples through a
        PYTHON closure (cells, not pytree leaves). Regenerating the
        upstream address must re-score the dependent call — previously
        both edit paths silently reused the stale closure value, making
        prior-proposal MH accept everything and sample the prior."""
        import jax.scipy.stats as jss
        import jax.tree_util as jtu

        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"

            @g.gen
            def pt():
                _ = g.normal(mu, 0.5) @ "y"

            _ = pt() @ "obs"

        tr0, _ = model.generate(jax.random.key(5), g.C["obs", "y"].set(1.0), ())

        def check(edit_fn):
            new_tr, w, _rd, _bwd = edit_fn(tr0)
            mu1 = new_tr.get_choices()["mu"]
            expected = jss.norm.logpdf(mu1, 0, 1) + jss.norm.logpdf(
                1.0, mu1, 0.5
            )
            assert float(new_tr.get_score()) == pytest.approx(
                float(expected), abs=1e-5
            )
            assert jtu.tree_structure(new_tr) == jtu.tree_structure(tr0)

        req = g.Regenerate(g.S["mu"])
        check(lambda t: t.edit(jax.random.key(7), req))  # eager
        check(jax.jit(lambda t: t.edit(jax.random.key(7), req)))  # jitted
