"""Constraint-address validation (VERDICT round-1 item 2).

Parity: reference ``ChoiceMap.invalid_subset`` (choice_map.py:1358) and the
address-validation machinery (:699-749). A misspelled constraint address
must not be silently ignored: under ``do_checkify()`` it raises at trace
time; ``invalid_subset`` is also available directly as in the reference.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.checkify import do_checkify
from genjax_tpu.generative.choice_map import (
    ChoiceMapInvalidAddress,
    exists_flag,
    shape_selection,
)


@g.gen
def model(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.flip(0.5) @ "y"
    return x


@g.gen
def nested(mu):
    a = model(mu) @ "sub"
    b = g.normal(a, 1.0) @ "top"
    return b


class TestInvalidSubset:
    def test_reference_example(self):
        # reference docstring example, choice_map.py:1377-1387
        chm = g.ChoiceMap.d({"y": 1, "z": 2})
        extras = chm.invalid_subset(model, (0.0,))
        assert extras is not None
        assert "z" in extras
        assert "y" not in extras

    def test_valid_constraint_returns_none(self):
        chm = g.C["x"].set(1.0) | g.C["y"].set(True)
        assert chm.invalid_subset(model, (0.0,)) is None

    def test_nested_typo_detected(self):
        chm = g.C["sub", "typo"].set(1.0)
        extras = chm.invalid_subset(nested, (0.0,))
        assert extras is not None
        assert ("sub", "typo") in extras
        ok = g.C["sub", "x"].set(1.0) | g.C["top"].set(0.5)
        assert ok.invalid_subset(nested, (0.0,)) is None

    def test_value_where_submap_expected(self):
        chm = g.C["sub"].set(1.0)  # "sub" is a compound address
        extras = chm.invalid_subset(nested, (0.0,))
        assert extras is not None

    def test_scan_constraint_validation(self):
        @g.gen
        def kern(c, x):
            z = g.normal(c, 1.0) @ "z"
            return (z, z)

        sc = kern.scan(n=4)
        ok = g.C[:, "z"].set(jnp.zeros(4))
        assert ok.invalid_subset(sc, (0.0, None)) is None
        bad = g.C[:, "nope"].set(jnp.zeros(4))
        assert bad.invalid_subset(sc, (0.0, None)) is not None


class TestGenerateValidation:
    def test_typo_raises_under_checkify(self):
        key = jax.random.key(0)
        with do_checkify():
            with pytest.raises(ChoiceMapInvalidAddress):
                model.generate(key, g.C["typo"].set(1.0), (0.0,))

    def test_valid_constraint_passes_under_checkify(self):
        key = jax.random.key(0)
        with do_checkify():
            tr, w = model.generate(key, g.C["x"].set(1.0), (0.0,))
        assert jnp.isfinite(w)

    def test_no_checkify_no_validation(self):
        # default: reference-compatible silent behavior
        key = jax.random.key(0)
        tr, w = model.generate(key, g.C["typo"].set(1.0), (0.0,))
        assert float(w) == 0.0

    def test_assess_extra_address_raises_under_checkify(self):
        chm = g.C["x"].set(1.0) | g.C["y"].set(True) | g.C["zz"].set(2.0)
        with do_checkify():
            with pytest.raises(ChoiceMapInvalidAddress):
                model.assess(chm, (0.0,))

    def test_switch_sibling_addresses_not_flagged(self):
        @g.gen
        def b0():
            return g.normal(0.0, 1.0) @ "a"

        @g.gen
        def b1():
            return g.normal(0.0, 1.0) @ "b"

        sw = g.switch(b0, b1)
        key = jax.random.key(0)
        with do_checkify():
            # constraining branch 1's address while selecting branch 0 is
            # legitimate switch usage — no false positive
            tr, w = sw.generate(key, g.C["b"].set(0.3), (0, (), ()))
        assert jnp.isfinite(w)

    def test_distribution_subaddressed_constraint_raises(self):
        key = jax.random.key(0)
        with do_checkify():
            with pytest.raises(ChoiceMapInvalidAddress):
                g.normal.generate(key, g.C["oops"].set(1.0), (0.0, 1.0))

    def test_nested_generate_typo_detected_at_top_level(self):
        key = jax.random.key(0)
        with do_checkify():
            with pytest.raises(ChoiceMapInvalidAddress):
                nested.generate(key, g.C["sub", "typo"].set(1.0), (0.0,))


class TestShapeSelectionAndExists:
    def test_shape_selection_covers_model(self):
        sel = shape_selection(model.get_zero_trace(0.0).get_choices())
        assert sel["x"]
        assert sel["y"]
        assert not sel["z"]

    def test_exists_flag_static(self):
        assert exists_flag(g.C["x"].set(1.0)) is True
        assert exists_flag(g.ChoiceMap.empty()) is False
        masked = g.C["x"].set(1.0).mask(jnp.asarray(True))
        f = exists_flag(masked)
        assert bool(f)
