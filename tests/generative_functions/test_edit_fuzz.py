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


@st.composite
def models(draw):
    """A small grammar of compositions; returns (gen_fn, args, addr_paths)
    where addr_paths lists editable address paths."""
    kind = draw(
        st.sampled_from(
            ["plain", "nested", "scan", "vmap", "partial", "local_closure"]
        )
    )
    if kind == "plain":
        return base_block, (0.3,), [("a",), ("b",)]
    if kind == "partial":
        # the callee is re-partial_apply-ed per execution: its closed-over
        # pytree leaves ride dispatch_edit's merge path
        @g.gen
        def curried(mu):
            k = base_block.partial_apply(mu * 2.0)
            u = k() @ "sub"
            v = g.normal(u, 1.0) @ "top"
            return v

        return curried, (0.3,), [("sub", "a"), ("sub", "b"), ("top",)]
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

        return closure_model, (0.3,), [("root",), ("dep", "c")]
    if kind == "nested":

        @g.gen
        def nested(mu):
            u = base_block(mu) @ "inner"
            v = g.normal(u, 1.0) @ "top"
            return v

        return nested, (0.3,), [("inner", "a"), ("inner", "b"), ("top",)]
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
        )
    # vmap
    n = draw(st.integers(2, 3))
    return (
        base_block.vmap(in_axes=(0,)),
        (jnp.linspace(-1, 1, n),),
        [(i, a) for i in range(n) for a in ("a", "b")],
    )


@st.composite
def edit_programs(draw, paths):
    ops = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["update", "regenerate"]))
        path = draw(st.sampled_from(paths))
        if kind == "update":
            v = draw(
                st.floats(
                    min_value=-3, max_value=3, allow_nan=False, width=32
                )
            )
            ops.append(("update", path, v))
        else:
            ops.append(("regenerate", path, None))
    return ops


def read(chm, path):
    v = chm.get_submap(*path).get_value()
    return v.unmask() if isinstance(v, g.Mask) else v


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_edit_sequences_preserve_invariants(data):
    gen_fn, args, paths = data.draw(models())
    program = data.draw(edit_programs(paths))

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
        assert float(w + wb) == pytest.approx(0.0, abs=2e-3), (kind, path)
        assert float(back.get_score()) == pytest.approx(
            old_score, abs=2e-3
        ), (kind, path)

        tr = new_tr
