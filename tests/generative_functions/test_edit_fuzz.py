"""Edit-sequence fuzzing: random models × random edit programs.

Hypothesis drives sequences of Update/Regenerate edits over randomly
composed models, checking after every step the invariants that make SMCP3
inference correct:

  - internal consistency: ``new_score == assess(new_choices)``;
  - the update identity: ``new_score == old_score + weight`` for
    substitution updates (no fresh sampling);
  - reversal: applying the backward request restores the previous score
    and cancels the weight.

This generalizes the hand-written per-combinator edit tests: any
staged-evaluator reuse decision, scan fast-path trigger, or backward
request assembled along the way is checked against the model density.
"""

import jax
import jax.numpy as jnp
import pytest
from hypothesis import given, settings, strategies as st

import genjax_tpu as g

KEY = jax.random.key(0)


@g.gen
def base_block(mu):
    a = g.normal(mu, 1.0) @ "a"
    b = g.normal(a * 0.5, 0.8) @ "b"
    return a + b


@g.gen
def branch_pos(mu):
    x = g.normal(mu, 1.0) @ "x"
    return x


@g.gen
def branch_neg(mu):
    x = g.normal(-mu, 0.5) @ "x"
    return x


@st.composite
def models(draw):
    """A grammar over ALL eight combinators; returns
    ``(gen_fn, args, update_paths, regen_paths)`` where ``update_paths``
    lists float-valued addresses servable by ``Update`` and ``regen_paths``
    those servable by ``Regenerate`` (``Mask`` is Update-only, matching
    reference mask.py:186; ``Switch``/``mix``/``or_else`` regeneration —
    including resampling the mixture component itself — is repo-native,
    switch.py ``_edit_regenerate``)."""
    kind = draw(
        st.sampled_from(
            [
                "plain",
                "nested",
                "scan",
                "vmap",
                "partial",
                "local_closure",
                "switch",
                "or_else",
                "mask",
                "mix",
                "dimap",
            ]
        )
    )
    if kind == "switch":
        sw = g.switch(branch_pos, branch_neg)
        idx = draw(st.sampled_from([0, 1]))
        return sw, (idx, (0.3,), (0.3,)), [("x",)], [("x",)]
    if kind == "or_else":
        oe = g.or_else(branch_pos, branch_neg)
        flag = draw(st.booleans())
        return oe, (flag, (0.3,), (0.3,)), [("x",)], [("x",)]
    if kind == "mask":
        # Update-only (reference parity); flag transitions are fuzzed
        # separately in test_structural_flip_invariants
        return base_block.mask(), (True, 0.3), [("a",), ("b",)], []
    if kind == "mix":
        mx = g.mix(branch_pos, branch_neg)
        logits = jnp.log(jnp.array([0.4, 0.6]))
        return (
            mx,
            (logits, (0.3,), (0.3,)),
            [("component_sample", "x")],
            # resampling the component flips the inner switch index —
            # the staged evaluator routes the index change into
            # Switch._edit_regenerate
            [("component_sample", "x"), ("mixture_component",)],
        )
    if kind == "dimap":
        dm = base_block.dimap(
            pre=lambda u, v: (u + v,), post=lambda args, r: r * 2.0
        )
        paths = [("a",), ("b",)]
        return dm, (0.1, 0.2), paths, paths
    if kind == "plain":
        return base_block, (0.3,), [("a",), ("b",)], None
    if kind == "partial":
        # the callee is re-partial_apply-ed per execution: its closed-over
        # pytree leaves ride dispatch_edit's merge path
        @g.gen
        def curried(mu):
            k = base_block.partial_apply(mu * 2.0)
            u = k() @ "sub"
            v = g.normal(u, 1.0) @ "top"
            return v

        return curried, (0.3,), [("sub", "a"), ("sub", "b"), ("top",)], None
    if kind == "local_closure":
        # a local @gen capturing an upstream SAMPLE through a Python
        # closure: the handler fallback + closure-mismatch rescore path
        @g.gen
        def closure_model(mu):
            root = g.normal(mu, 1.0) @ "root"

            @g.gen
            def leafs():
                c = g.normal(root, 0.7) @ "c"
                return c

            out = leafs() @ "dep"
            return out

        return closure_model, (0.3,), [("root",), ("dep", "c")], None
    if kind == "nested":

        @g.gen
        def nested(mu):
            u = base_block(mu) @ "inner"
            v = g.normal(u, 1.0) @ "top"
            return v

        return nested, (0.3,), [("inner", "a"), ("inner", "b"), ("top",)], None
    if kind == "scan":

        @g.gen
        def kern(c, x):
            z = g.normal(0.6 * c + x, 1.0) @ "z"
            return (z, z)

        n = draw(st.integers(2, 4))
        return (
            kern.scan(n=n),
            (0.0, jnp.linspace(-1, 1, n)),
            [(i, "z") for i in range(n)],
            None,
        )
    # vmap
    n = draw(st.integers(2, 3))
    return (
        base_block.vmap(in_axes=(0,)),
        (jnp.linspace(-1, 1, n),),
        [(i, a) for i in range(n) for a in ("a", "b")],
        None,
    )


@st.composite
def edit_programs(draw, update_paths, regen_paths):
    ops = []
    for _ in range(draw(st.integers(1, 3))):
        kinds = ["update"] if not regen_paths else ["update", "regenerate"]
        kind = draw(st.sampled_from(kinds))
        if kind == "update":
            path = draw(st.sampled_from(update_paths))
            v = draw(
                st.floats(
                    min_value=-3, max_value=3, allow_nan=False, width=32
                )
            )
            ops.append(("update", path, v))
        else:
            ops.append(("regenerate", draw(st.sampled_from(regen_paths)), None))
    return ops


def read(chm, path):
    v = chm.get_submap(*path).get_value()
    return v.unmask() if isinstance(v, g.Mask) else v


# Each battery runs twice: a reduced fast-lane pass on every commit, and
# the full-budget pass in the slow lane (-m slow) — VERDICT r2 item 8.


def _edit_sequences_body(data):
    gen_fn, args, update_paths, regen_paths = data.draw(models())
    if regen_paths is None:
        regen_paths = update_paths
    program = data.draw(edit_programs(update_paths, regen_paths))

    tr = gen_fn.simulate(KEY, args)
    step_key = jax.random.key(1)
    for i, (kind, path, v) in enumerate(program):
        step_key = jax.random.fold_in(step_key, i)
        old_score = float(tr.get_score())
        if kind == "update":
            req = g.Update(g.C[path].set(jnp.float32(v)))
        else:
            req = g.Regenerate(g.S[path])
        new_tr, w, _rd, bwd = tr.edit(step_key, req)

        # internal consistency
        score, _ = gen_fn.assess(new_tr.get_choices(), args)
        assert float(new_tr.get_score()) == pytest.approx(
            float(score), abs=2e-3
        ), (kind, path)

        # update identity (pure substitution) and value placement
        if kind == "update":
            assert float(new_tr.get_score()) == pytest.approx(
                old_score + float(w), abs=2e-3
            ), (kind, path)
            assert float(read(new_tr.get_choices(), path)) == pytest.approx(
                v, abs=1e-5
            )

        # reversal restores the previous state
        back, wb, _, _ = new_tr.edit(jax.random.fold_in(step_key, 99), bwd)
        assert float(back.get_score()) == pytest.approx(
            old_score, abs=2e-3
        ), (kind, path)
        # weight cancellation holds whenever the forward move sampled no
        # fresh structure; resampling a component index draws the newly
        # selected branch fresh, so only score restoration applies there
        if not (kind == "regenerate" and path == ("mixture_component",)):
            assert float(w + wb) == pytest.approx(0.0, abs=2e-3), (kind, path)

        tr = new_tr


@settings(max_examples=16, deadline=None)
@given(st.data())
def test_edit_sequences_preserve_invariants(data):
    _edit_sequences_body(data)


@pytest.mark.slow
@settings(max_examples=80, deadline=None)
@given(st.data())
def test_edit_sequences_preserve_invariants_full(data):
    _edit_sequences_body(data)


# ----------------------------------------------------------------------
# structural edits: mask flag flips, switch/or_else index flips, dimap
# argument changes — the argdiff-driven transitions (reference
# mask.py:179's four-way table and switch.py:257's index-change path)
# ----------------------------------------------------------------------


def _nochange(args):
    return jax.tree_util.tree_map(lambda x: g.Diff(x, g.NoChange), args)


def _structural_spec(kind):
    """Returns (gen_fn, states, make_args, make_argdiffs, update_paths).

    ``states`` enumerates the structural knob (mask flag / switch index /
    or_else flag / dimap pre-arg); ``make_argdiffs(new, changed)`` builds
    argdiffs moving the knob with everything else NoChange."""
    if kind == "mask":
        mm = base_block.mask()

        def margs(s):
            return (jnp.asarray(s), 0.3)

        def mdiffs(s, changed):
            tan = g.UnknownChange if changed else g.NoChange
            return (g.Diff(jnp.asarray(s), tan), g.Diff(0.3, g.NoChange))

        return mm, [True, False], margs, mdiffs, [("a",), ("b",)]
    if kind == "switch":
        sw = g.switch(branch_pos, branch_neg)

        def sargs(s):
            return (jnp.asarray(s), (0.3,), (0.3,))

        def sdiffs(s, changed):
            tan = g.UnknownChange if changed else g.NoChange
            return (
                g.Diff(jnp.asarray(s), tan),
                (g.Diff(0.3, g.NoChange),),
                (g.Diff(0.3, g.NoChange),),
            )

        return sw, [0, 1], sargs, sdiffs, [("x",)]
    if kind == "or_else":
        oe = g.or_else(branch_pos, branch_neg)

        def oargs(s):
            return (jnp.asarray(s), (0.3,), (0.3,))

        def odiffs(s, changed):
            tan = g.UnknownChange if changed else g.NoChange
            return (
                g.Diff(jnp.asarray(s), tan),
                (g.Diff(0.3, g.NoChange),),
                (g.Diff(0.3, g.NoChange),),
            )

        return oe, [True, False], oargs, odiffs, [("x",)]
    # dimap: the structural knob is the first pre-image argument
    dm = base_block.dimap(pre=lambda u, v: (u + v,), post=lambda args, r: r * 2.0)

    def dargs(s):
        return (jnp.float32(s), 0.2)

    def ddiffs(s, changed):
        tan = g.UnknownChange if changed else g.NoChange
        return (g.Diff(jnp.float32(s), tan), g.Diff(0.2, g.NoChange))

    return dm, [-0.5, 0.1, 0.8], dargs, ddiffs, [("a",), ("b",)]


def _masked_score_zero(kind, state):
    return (kind == "mask" and not state) or False


def _structural_flip_body(data):
    """Flag flips / index flips / arg changes interleaved with value
    updates: after every move the new trace is assess-consistent at the
    NEW args, and applying the backward request with REVERSED argdiffs
    restores the previous score exactly."""
    kind = data.draw(st.sampled_from(["mask", "switch", "or_else", "dimap"]))
    gen_fn, states, make_args, make_argdiffs, upd_paths = _structural_spec(kind)

    state = data.draw(st.sampled_from(states))
    tr = gen_fn.simulate(KEY, make_args(state))

    for i in range(data.draw(st.integers(1, 3))):
        step_key = jax.random.key(100 + i)
        old_score = float(tr.get_score())
        old_state = state

        move = data.draw(st.sampled_from(["flip", "update", "flip+update"]))
        if "flip" in move:
            state = data.draw(st.sampled_from(states))
        changed = state is not old_state
        if "update" in move:
            path = data.draw(st.sampled_from(upd_paths))
            v = data.draw(
                st.floats(min_value=-2, max_value=2, allow_nan=False, width=32)
            )
            req = g.Update(g.C[path].set(jnp.float32(v)))
        else:
            req = g.Update(g.C.empty())

        new_tr, w, _rd, bwd = gen_fn.edit(
            step_key, tr, req, make_argdiffs(state, changed)
        )
        assert jnp.isfinite(jnp.asarray(w)).all(), (kind, move)

        # consistency at the NEW args
        if _masked_score_zero(kind, state):
            assert float(new_tr.get_score()) == pytest.approx(0.0, abs=1e-6)
        else:
            score, _ = gen_fn.assess(new_tr.get_choices(), make_args(state))
            assert float(new_tr.get_score()) == pytest.approx(
                float(score), abs=2e-3
            ), (kind, move)

        # reversal with reversed argdiffs restores the previous score
        back, _wb, _, _ = gen_fn.edit(
            jax.random.fold_in(step_key, 7),
            new_tr,
            bwd,
            make_argdiffs(old_state, changed),
        )
        assert float(back.get_score()) == pytest.approx(
            old_score, abs=2e-3
        ), (kind, move)

        tr = new_tr


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_structural_flip_invariants(data):
    _structural_flip_body(data)


@pytest.mark.slow
@settings(max_examples=60, deadline=None)
@given(st.data())
def test_structural_flip_invariants_full(data):
    _structural_flip_body(data)


# ----------------------------------------------------------------------
# upstream Regenerate driving a switch index change (repo-native:
# Switch._edit_regenerate; the reference asserts Update-only at
# switch.py:265 and would refuse this model)
# ----------------------------------------------------------------------


@g.gen
def _indexed_model(mu):
    z = g.categorical(jnp.log(jnp.array([0.5, 0.5]))) @ "z"
    v = g.switch(branch_pos, branch_neg)(z, (mu,), (mu,)) @ "v"
    vv = v.unmask() if isinstance(v, g.Mask) else v
    obs = g.normal(vv, 1.0) @ "obs"
    return obs


def _regenerate_switch_body(seed):
    tr = _indexed_model.simulate(jax.random.key(seed), (0.3,))
    kk = jax.random.key(seed + 1)
    new_tr, _w, _rd, bwd = tr.edit(kk, g.Regenerate(g.S["z"]))
    score, _ = _indexed_model.assess(new_tr.get_choices(), (0.3,))
    assert float(new_tr.get_score()) == pytest.approx(float(score), abs=2e-3)
    back, _wb, _, _ = new_tr.edit(jax.random.fold_in(kk, 9), bwd)
    assert float(back.get_score()) == pytest.approx(
        float(tr.get_score()), abs=2e-3
    )


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 10_000))
def test_regenerate_through_switch_index(seed):
    _regenerate_switch_body(seed)


@pytest.mark.slow
@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000))
def test_regenerate_through_switch_index_full(seed):
    _regenerate_switch_body(seed)
