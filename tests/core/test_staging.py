"""Staging / flag-algebra tests (reference: tests/core/test_staging.py)."""

import jax
import jax.numpy as jnp
import pytest

from genjax_tpu.core.staging import (
    FlagOp,
    multi_switch,
    staged_check,
    to_shape_fn,
    tree_choose,
)


class TestFlagOp:
    def test_concrete_shortcuts(self):
        assert FlagOp.and_(True, True) is True
        assert FlagOp.and_(True, False) is False
        assert FlagOp.or_(False, True) is True
        assert FlagOp.not_(True) is False
        assert staged_check(True)
        assert not staged_check(jnp.asarray(True))  # traced-ish: not concrete

    def test_mixed(self):
        t = jnp.asarray(True)
        assert FlagOp.and_(True, t) is t
        assert FlagOp.and_(False, t) is False
        assert FlagOp.or_(True, t) is True
        out = FlagOp.or_(False, t)
        assert out is t

    def test_where_cond(self):
        assert FlagOp.where(True, 1.0, 2.0) == 1.0
        assert FlagOp.where(False, 1.0, 2.0) == 2.0
        assert FlagOp.where(jnp.asarray(True), 1.0, 2.0) == 1.0
        assert FlagOp.cond(True, lambda: 1.0, lambda: 2.0) == 1.0
        assert FlagOp.cond(jnp.asarray(False), lambda: 1.0, lambda: 2.0) == 2.0


class TestTreeChoose:
    def test_concrete_idx(self):
        trees = [{"a": jnp.array(i * 1.0)} for i in range(3)]
        assert tree_choose(1, trees)["a"] == 1.0

    def test_traced_idx(self):
        trees = [{"a": jnp.array(i * 1.0)} for i in range(3)]
        out = jax.jit(lambda i: tree_choose(i, trees))(jnp.asarray(2))
        assert out["a"] == 2.0

    def test_dtype_promotion(self):
        out = tree_choose(jnp.asarray(1), [jnp.asarray(1), jnp.asarray(2.5)])
        assert out == 2.5


class TestMultiSwitch:
    def test_different_shapes(self):
        def b0(x):
            return {"s": x + 1.0}

        def b1(x):
            return {"v": jnp.ones(3) * x, "s": x}

        outs = multi_switch(jnp.asarray(1), [b0, b1], [(2.0,), (3.0,)])
        # branch 1 selected: slot 0 zero-filled, slot 1 real
        assert outs[0]["s"] == 0.0
        assert jnp.allclose(outs[1]["v"], 3.0)

        outs = multi_switch(0, [b0, b1], [(2.0,), (3.0,)])
        assert outs[0]["s"] == 3.0


class TestToShapeFn:
    def test_zero_fill(self):
        f = to_shape_fn(lambda x: x * 2, jnp.zeros)
        out = f(jnp.ones((2, 3)))
        assert out.shape == (2, 3)
        assert jnp.all(out == 0.0)
