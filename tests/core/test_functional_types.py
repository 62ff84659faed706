"""Mask functional-type tests (reference:
tests/core/generative/test_functional_types.py, 366 LoC)."""

import jax.numpy as jnp
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genjax_tpu import Mask


class TestMaskBasics:
    def test_nested_flattening(self):
        m = Mask(Mask(5.0, True), jnp.asarray(True))
        assert not isinstance(m.value, Mask)

    def test_maybe_mask(self):
        assert Mask.maybe_mask(5.0, True) == 5.0
        assert Mask.maybe_mask(5.0, False) is None
        m = Mask.maybe_mask(5.0, jnp.asarray(True))
        assert isinstance(m, Mask)

    def test_unmask_default(self):
        m = Mask(jnp.asarray(5.0), jnp.asarray(False))
        assert m.unmask(default=jnp.asarray(-1.0)) == -1.0
        m = Mask(jnp.asarray(5.0), jnp.asarray(True))
        assert m.unmask(default=jnp.asarray(-1.0)) == 5.0

    def test_vectorized_flag_prefix(self):
        m = Mask(jnp.ones((3, 2)), jnp.array([True, False, True]))
        out = m.unmask(default=jnp.zeros((3, 2)))
        assert jnp.all(out[0] == 1.0) and jnp.all(out[1] == 0.0)

    def test_bad_flag_shape_raises(self):
        with pytest.raises(ValueError):
            Mask(jnp.ones((3, 2)), jnp.array([True, False]))


class TestMaskCombination:
    def test_or_concrete(self):
        a = Mask(1.0, True)
        b = Mask(2.0, False)
        assert (a | b).value == 1.0
        assert (b | a).value == 1.0
        assert (b | a).flag

    def test_or_traced(self):
        a = Mask(jnp.asarray(1.0), jnp.asarray(False))
        b = Mask(jnp.asarray(2.0), jnp.asarray(True))
        c = a | b
        assert c.value == 2.0
        assert c.flag

    def test_xor(self):
        a = Mask(jnp.asarray(1.0), jnp.asarray(True))
        b = Mask(jnp.asarray(2.0), jnp.asarray(True))
        c = a ^ b
        assert not c.flag

    def test_invert(self):
        a = Mask(1.0, True)
        assert not (~a).flag


class TestMaskPytrees:
    def test_unmask_pytree(self):
        tree = {"a": jnp.asarray(1.0), "b": (jnp.asarray(2.0), jnp.asarray(3.0))}
        m = Mask(tree, jnp.asarray(True))
        out = m.unmask()
        assert float(out["a"]) == 1.0 and float(out["b"][1]) == 3.0

    def test_combine_different_pytree_shapes_raises(self):
        a = Mask({"a": jnp.asarray(1.0)}, jnp.asarray(True))
        b = Mask({"b": jnp.asarray(2.0)}, jnp.asarray(True))
        with pytest.raises(Exception):
            _ = a | b

    def test_combine_different_array_shapes_raises(self):
        a = Mask(jnp.ones((2,)), jnp.asarray(True))
        b = Mask(jnp.ones((3,)), jnp.asarray(True))
        with pytest.raises(Exception):
            _ = a | b


@settings(deadline=None, max_examples=50)
@given(f1=st.booleans(), f2=st.booleans())
def test_property_or_flag_table(f1, f2):
    a = Mask(jnp.asarray(1.0), jnp.asarray(f1))
    b = Mask(jnp.asarray(2.0), jnp.asarray(f2))
    c = a | b
    assert bool(c.flag) == (f1 or f2)
    if f1:
        assert c.value == 1.0
    elif f2:
        assert c.value == 2.0


@settings(deadline=None, max_examples=50)
@given(f1=st.booleans(), f2=st.booleans())
def test_property_xor_flag_table(f1, f2):
    a = Mask(jnp.asarray(1.0), jnp.asarray(f1))
    b = Mask(jnp.asarray(2.0), jnp.asarray(f2))
    c = a ^ b
    assert bool(c.flag) == (f1 != f2)
    if f1 and not f2:
        assert c.value == 1.0
    elif f2 and not f1:
        assert c.value == 2.0


@settings(deadline=None, max_examples=60)
@given(
    flags=st.lists(st.booleans(), min_size=1, max_size=6),
    default=st.floats(
        min_value=-10, max_value=10, allow_nan=False, width=32
    ),
)
def test_property_vectorized_unmask(flags, default):
    n = len(flags)
    vals = jnp.arange(float(n))
    m = Mask(vals, jnp.asarray(flags))
    out = m.unmask(default=jnp.full((n,), default))
    for i, f in enumerate(flags):
        expected = float(i) if f else default
        assert float(out[i]) == pytest.approx(expected, abs=1e-5)
