"""Deep property-based tests of the ChoiceMap node algebra.

VERDICT round-1 item 5: the round-1 property suite generated only flat
string→scalar mappings; the subtle code — lazy Or/Mask value resolution
(choice_map.py OrChm truth table), the `_or_build` switch-distribution
rules, dynamic Indexed Mask-on-mismatch — is exactly what hypothesis
should stress. Reference analog: tests/core/test_choice_maps.py (1202 LoC).

Strategy: generate a random nested TREE spec (Static / scalar-Indexed /
Switch / Masked / Or nodes, depth ≥3) together with its *expected
contents* — a map ``path -> (value, valid)`` computed by a straightforward
model semantics — then check every read path of the real implementation
against the model.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import genjax_tpu as g
from genjax_tpu.generative.choice_map import ChoiceMap
from genjax_tpu.generative.mask import Mask

# ----------------------------------------------------------------------
# spec generation: (builder, expected-contents) pairs
# ----------------------------------------------------------------------

KEYS = ["a", "b", "c"]
IDXS = [0, 1, 2]


@st.composite
def tree_specs(draw, depth=3):
    """Returns (chm, contents) where contents: path -> (value, valid:bool).

    valid=False entries are *present but masked out*; absent paths are not
    listed at all.
    """
    kind = draw(
        st.sampled_from(
            ["leaf"]
            if depth == 0
            else ["leaf", "static", "indexed", "masked", "or", "switch"]
        )
    )
    if kind == "leaf":
        v = draw(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False, width=32,
            )
        )
        return ChoiceMap.choice(jnp.asarray(v, jnp.float32)), {
            (): (np.float32(v), True)
        }
    if kind == "static":
        n = draw(st.integers(1, 3))
        keys = draw(
            st.lists(st.sampled_from(KEYS), min_size=n, max_size=n, unique=True)
        )
        chm = ChoiceMap.empty()
        contents = {}
        for k in keys:
            sub, sub_c = draw(tree_specs(depth=depth - 1))
            chm |= sub.extend(k)
            for p, (v, ok) in sub_c.items():
                contents[(k,) + p] = (v, ok)
        return chm, contents
    if kind == "indexed":
        idx = draw(st.sampled_from(IDXS))
        sub, sub_c = draw(tree_specs(depth=depth - 1))
        chm = sub.extend(idx)
        return chm, {(idx,) + p: (v, ok) for p, (v, ok) in sub_c.items()}
    if kind == "masked":
        flag = draw(st.booleans())
        sub, sub_c = draw(tree_specs(depth=depth - 1))
        # traced flag: the lazy MaskedChm wrapper path (concrete flags
        # short-circuit in ChoiceMap.mask)
        chm = sub.mask(jnp.asarray(flag))
        return chm, {p: (v, ok and flag) for p, (v, ok) in sub_c.items()}
    if kind == "or":
        a, a_c = draw(tree_specs(depth=depth - 1))
        b, b_c = draw(tree_specs(depth=depth - 1))
        chm = a | b
        contents = dict(b_c)
        for p, (v, ok) in a_c.items():
            if p in contents:
                # left priority where the left entry is valid
                bv, bok = contents[p]
                contents[p] = (v, True) if ok else (bv, bok)
            else:
                contents[p] = (v, ok)
        # left-invalid/right-valid pairs resolve to the right value;
        # entries only in one side keep their validity
        return chm, contents
    # switch
    n = draw(st.integers(2, 3))
    branches = []
    branch_contents = []
    for _ in range(n):
        sub, sub_c = draw(tree_specs(depth=depth - 1))
        branches.append(sub)
        branch_contents.append(sub_c)
    sel = draw(st.integers(0, n - 1))
    chm = ChoiceMap.switch(jnp.asarray(sel), branches)  # traced index
    contents = {}
    for i, sub_c in enumerate(branch_contents):
        for p, (v, ok) in sub_c.items():
            prev = contents.get(p, (None, False))
            if i == sel and ok:
                contents[p] = (v, True)
            elif p not in contents:
                contents[p] = (v if i == sel else prev[0], False)
    return chm, contents


def read(chm: ChoiceMap, path):
    v = chm.get_submap(*path).get_value() if path else chm.get_value()
    return v


def check_entry(chm, path, value, valid):
    v = read(chm, path)
    if v is None:
        assert not valid, f"path {path}: expected value {value}, got None"
        return
    if isinstance(v, Mask):
        flag = bool(jnp.all(jnp.asarray(v.primal_flag())))
        if valid:
            assert flag, f"path {path}: valid entry read back masked-out"
            assert np.allclose(np.asarray(v.value), value), (path, v, value)
        else:
            assert not flag, f"path {path}: invalid entry read back valid"
    else:
        assert valid, f"path {path}: masked-out entry read back raw {v}"
        assert np.allclose(np.asarray(v), value), (path, v, value)


# ----------------------------------------------------------------------
# the laws
# ----------------------------------------------------------------------


@settings(max_examples=120, deadline=None)
@given(tree_specs())
def test_read_consistency(spec):
    """Every generated entry reads back with the model's value+validity."""
    chm, contents = spec
    for path, (value, valid) in contents.items():
        check_entry(chm, path, value, valid)


@settings(max_examples=80, deadline=None)
@given(tree_specs(), st.sampled_from(KEYS + IDXS))
def test_filter_by_prefix_partition(spec, comp):
    """filter(S[comp]) keeps exactly the entries under comp; filter(~S[comp])
    keeps exactly the rest — a partition."""
    chm, contents = spec
    sel = g.S[comp]
    kept = chm.filter(sel)
    dropped = chm.filter(~sel)
    for path, (value, valid) in contents.items():
        under = len(path) > 0 and path[0] == comp
        check_entry(kept, path, value, valid and under)
        check_entry(dropped, path, value, valid and not under)


@settings(max_examples=80, deadline=None)
@given(tree_specs(), tree_specs())
def test_merge_left_priority(a_spec, b_spec):
    """(a | b): a's valid entries win; b fills the rest."""
    a, a_c = a_spec
    b, b_c = b_spec
    merged = a | b
    for path in set(a_c) | set(b_c):
        av, aok = a_c.get(path, (None, False))
        bv, bok = b_c.get(path, (None, False))
        if aok:
            expected, ok = av, True
        elif bok:
            expected, ok = bv, True
        else:
            expected, ok = (av if path in a_c else bv), False
        # skip paths where one side stores a value and the other a subtree
        # (prefix conflicts are undefined in the reference algebra too)
        prefix_clash = any(
            (p != path and (p[: len(path)] == path or path[: len(p)] == p))
            for p in set(a_c) | set(b_c)
        )
        if prefix_clash:
            continue
        check_entry(merged, path, expected, ok)


@settings(max_examples=60, deadline=None)
@given(tree_specs())
def test_selection_of_choices_covers_exactly_valid(spec):
    """chm.get_selection() checks True exactly on the valid entries."""
    chm, contents = spec
    sel = chm.get_selection()
    for path, (_v, valid) in contents.items():
        got = sel[path]
        got = bool(jnp.all(jnp.asarray(got)))
        assert got == valid, (path, got, valid)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from(range(8)), min_size=1, max_size=4, unique=True),
    st.integers(0, 7),
)
def test_dynamic_indexed_mask_on_mismatch(idx_list, probe):
    """Sparse dynamic Indexed: reads at stored indices give Mask(True),
    reads elsewhere give an invalid Mask (reference argwhere trick,
    choice_map.py:1501-1531)."""
    idx = jnp.asarray(idx_list)
    vals = jnp.asarray([float(i) * 10.0 for i in idx_list])
    chm = g.C[idx, "x"].set(vals)
    v = chm.get_submap(jnp.asarray(probe), "x").get_value()
    assert isinstance(v, Mask)
    present = probe in idx_list
    assert bool(v.primal_flag()) == present
    if present:
        assert float(v.value) == pytest.approx(probe * 10.0)


@settings(max_examples=60, deadline=None)
@given(tree_specs(), st.integers(0, 2))
def test_extend_then_submap_roundtrip(spec, idx):
    """chm.extend(addr).get_submap(addr) preserves all contents."""
    chm, contents = spec
    for addr in ("z", idx):
        nested = chm.extend(addr)
        back = nested.get_submap(addr)
        for path, (value, valid) in contents.items():
            check_entry(back, path, value, valid)
