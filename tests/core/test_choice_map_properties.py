"""Property-based tests of the ChoiceMap/Selection algebra.

Modeled on reference tests/core/test_choice_maps.py (1202 LoC, hypothesis):
algebraic laws checked over randomly generated address trees and values
(SURVEY.md §4 style 1; ChoiceMap algebra is called out as a 'hard part' in
§7 — property tests are the safety net).
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

import genjax_tpu as g
from genjax_tpu.generative.choice_map import ChoiceMap

# ----------------------------------------------------------------------
# strategies
# ----------------------------------------------------------------------

addr_component = st.sampled_from(["a", "b", "c", "x", "y"])
paths = st.lists(addr_component, min_size=1, max_size=3).map(tuple)
values = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@st.composite
def flat_mappings(draw):
    """A dict of path -> value with no path being a prefix of another."""
    n = draw(st.integers(min_value=1, max_value=5))
    entries = {}
    for _ in range(n):
        p = draw(paths)
        if any(
            p[: len(q)] == q or q[: len(p)] == p for q in entries if q != p
        ):
            continue
        entries[p] = draw(values)
    if not entries:
        entries[("a",)] = draw(values)
    return entries


def build(mapping) -> ChoiceMap:
    acc = ChoiceMap.empty()
    for path, v in mapping.items():
        acc |= ChoiceMap.entry(jnp.asarray(v), *path)
    return acc


def read(chm, path):
    sub = chm.get_submap(*path)
    v = sub.get_value()
    if isinstance(v, g.Mask):
        flag = np.asarray(v.primal_flag())
        return float(np.asarray(v.value)) if flag else None
    return None if v is None else float(np.asarray(v))


# ----------------------------------------------------------------------
# properties
# ----------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_roundtrip_reads(mapping):
    chm = build(mapping)
    for path, v in mapping.items():
        assert read(chm, path) == float(np.float32(v))


@settings(max_examples=50, deadline=None)
@given(flat_mappings(), flat_mappings())
def test_merge_left_priority(m1, m2):
    c1, c2 = build(m1), build(m2)
    merged = c1 | c2
    for path in set(m1) | set(m2):
        got = read(merged, path)
        if path in m1:
            assert got == float(np.float32(m1[path]))
        elif path in m2:
            # only guaranteed when m1 holds nothing on the path's prefix tree
            prefix_clash = any(
                q[: len(path)] == path or path[: len(q)] == q for q in m1
            )
            if not prefix_clash:
                assert got == float(np.float32(m2[path]))


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_filter_partition(mapping):
    """filter(sel) and filter(~sel) partition the choices."""
    chm = build(mapping)
    some_path = next(iter(mapping))
    sel = g.S[some_path]
    inside = chm.filter(sel)
    outside = chm.filter(~sel)
    for path, v in mapping.items():
        expected = float(np.float32(v))
        if path == some_path:
            assert read(inside, path) == expected
            assert read(outside, path) is None
        else:
            assert read(inside, path) is None
            assert read(outside, path) == expected


@settings(max_examples=50, deadline=None)
@given(flat_mappings(), paths)
def test_extend_then_submap(mapping, prefix):
    chm = build(mapping)
    nested = chm.extend(*prefix)
    recovered = nested.get_submap(*prefix)
    for path, v in mapping.items():
        assert read(recovered, path) == float(np.float32(v))


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_mask_true_false(mapping):
    chm = build(mapping)
    assert chm.mask(True) is chm
    assert chm.mask(False).static_is_empty()
    masked = chm.mask(jnp.asarray(True))
    for path, v in mapping.items():
        assert read(masked, path) == float(np.float32(v))


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_chm_selection_covers_choices(mapping):
    chm = build(mapping)
    sel = chm.get_selection()
    refiltered = chm.filter(sel)
    for path, v in mapping.items():
        assert read(refiltered, path) == float(np.float32(v))


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_empty_is_identity_for_merge(mapping):
    chm = build(mapping)
    assert (chm | ChoiceMap.empty()) is chm
    assert (ChoiceMap.empty() | chm) is chm


@settings(max_examples=30, deadline=None)
@given(
    st.lists(values, min_size=2, max_size=6),
    addr_component,
)
def test_indexed_dense_reads(vals, name):
    arr = jnp.asarray(vals, dtype=jnp.float32)
    chm = g.C[:, name].set(arr)
    for i, v in enumerate(vals):
        assert read(chm, (i, name)) == float(np.float32(v))
    # dynamic index read is Mask-wrapped but valid
    got = chm.get_submap(jnp.asarray(1), name).get_value()
    assert isinstance(got, g.Mask)
    assert bool(got.primal_flag())


@settings(max_examples=30, deadline=None)
@given(flat_mappings())
def test_switch_chm_selects_branch(mapping):
    c0 = build(mapping)
    c1 = build({p: v + 1.0 for p, v in mapping.items()})
    sw = ChoiceMap.switch(jnp.asarray(0), [c0, c1])
    for path, v in mapping.items():
        assert read(sw, path) == float(np.float32(v))
    sw1 = ChoiceMap.switch(jnp.asarray(1), [c0, c1])
    for path, v in mapping.items():
        assert read(sw1, path) == float(np.float32(v + 1.0))


@settings(max_examples=50, deadline=None)
@given(flat_mappings())
def test_selection_complement_involution(mapping):
    chm = build(mapping)
    some_path = next(iter(mapping))
    sel = g.S[some_path]
    double_comp = ~~sel
    filtered = chm.filter(double_comp)
    for path, v in mapping.items():
        expected = float(np.float32(v)) if path == some_path else None
        assert read(filtered, path) == expected
