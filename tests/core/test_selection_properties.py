"""Property tests of the Selection algebra as pure address predicates.

A selection denotes a predicate over address paths; the test builds random
selection EXPRESSIONS together with a reference predicate (evaluated in
plain Python over the same expression tree) and checks the implementation
pointwise over random paths — De Morgan, complement involution,
identity/annihilator laws all follow from pointwise equality.
"""

import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import genjax_tpu as g
from genjax_tpu.generative.selection import Selection

KEYS = ["a", "b", "c"]
PATHS = [
    (k1,) for k1 in KEYS
] + [(k1, k2) for k1 in KEYS for k2 in KEYS] + [
    (k1, k2, k3) for k1 in KEYS for k2 in KEYS for k3 in KEYS[:2]
]


@st.composite
def sel_exprs(draw, depth=3):
    """Returns (Selection, predicate: path -> bool)."""
    kind = draw(
        st.sampled_from(
            ["leafpath", "all", "none"]
            if depth == 0
            else ["leafpath", "all", "none", "or", "and", "not", "extend"]
        )
    )
    if kind == "leafpath":
        path = draw(st.sampled_from(PATHS))
        sel = g.S[path]

        def pred(p, path=path):
            # S[path] selects the subtree at `path`
            return p[: len(path)] == path

        return sel, pred
    if kind == "all":
        return Selection.all(), lambda p: True
    if kind == "none":
        return Selection.none(), lambda p: False
    if kind == "or":
        s1, p1 = draw(sel_exprs(depth=depth - 1))
        s2, p2 = draw(sel_exprs(depth=depth - 1))
        return s1 | s2, lambda p: p1(p) or p2(p)
    if kind == "and":
        s1, p1 = draw(sel_exprs(depth=depth - 1))
        s2, p2 = draw(sel_exprs(depth=depth - 1))
        return s1 & s2, lambda p: p1(p) and p2(p)
    if kind == "not":
        s1, p1 = draw(sel_exprs(depth=depth - 1))
        return ~s1, lambda p: not p1(p)
    # extend
    k = draw(st.sampled_from(KEYS))
    s1, p1 = draw(sel_exprs(depth=depth - 1))
    return s1.extend(k), lambda p: len(p) >= 1 and p[0] == k and p1(p[1:])


def check_of(sel, path):
    s = sel
    for comp in path:
        s = s.get_subselection(comp)
    c = s.check()
    return bool(jnp.all(jnp.asarray(c)))


@settings(max_examples=150, deadline=None)
@given(sel_exprs())
def test_selection_matches_predicate_model(expr):
    sel, pred = expr
    for path in PATHS:
        assert check_of(sel, path) == pred(path), path


@settings(max_examples=80, deadline=None)
@given(sel_exprs(), sel_exprs())
def test_de_morgan(e1, e2):
    s1, _ = e1
    s2, _ = e2
    for path in PATHS[:12]:
        assert check_of(~(s1 | s2), path) == check_of(~s1 & ~s2, path)
        assert check_of(~(s1 & s2), path) == check_of(~s1 | ~s2, path)


@settings(max_examples=80, deadline=None)
@given(sel_exprs())
def test_complement_involution_and_units(expr):
    sel, _ = expr
    for path in PATHS[:12]:
        assert check_of(~~sel, path) == check_of(sel, path)
        assert check_of(sel | Selection.none(), path) == check_of(sel, path)
        assert check_of(sel & Selection.all(), path) == check_of(sel, path)
        assert check_of(sel & Selection.none(), path) is False
        assert check_of(sel | Selection.all(), path) is True


def test_extend_routes_dynamic_ints_to_idxsel():
    import jax
    """Selection.extend with a traced int must not put a tracer in
    StaticSel's static treedef (same dispatch as the S[...] builder)."""
    import genjax_tpu as g

    @jax.jit
    def build_and_check(i):
        sel = g.Selection.all().extend(i, "x")
        return sel[(3, "x")]

    assert bool(build_and_check(jnp.asarray(3)))
    assert not bool(build_and_check(jnp.asarray(4)))


def test_contains_traced_flag_raises_targeted_error():
    import jax
    import genjax_tpu as g
    from genjax_tpu.core.handlers import GenJAXError

    @jax.jit
    def probe(i):
        sel = g.Selection.all().extend(i)
        try:
            _ = 3 in sel
        except GenJAXError:
            return jnp.asarray(1)
        return jnp.asarray(0)

    assert int(probe(jnp.asarray(3))) == 1
