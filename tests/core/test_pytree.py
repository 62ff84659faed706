"""Pytree substrate tests (reference: tests/core/test_pytree.py)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from genjax_tpu import Const, Closure, Pytree
from genjax_tpu.core.pytree import PythonicPytree, tree_const, tree_const_unwrap


@Pytree.dataclass
class Point(Pytree):
    x: jnp.ndarray
    y: jnp.ndarray
    label: str = Pytree.static(default="pt")


class TestPytreeDataclass:
    def test_flatten_roundtrip(self):
        p = Point(jnp.array(1.0), jnp.array(2.0))
        leaves, treedef = jtu.tree_flatten(p)
        assert len(leaves) == 2
        p2 = jtu.tree_unflatten(treedef, leaves)
        assert p2.label == "pt"
        assert p2.x == 1.0

    def test_static_field_in_treedef(self):
        p1 = Point(jnp.array(1.0), jnp.array(2.0), "a")
        p2 = Point(jnp.array(1.0), jnp.array(2.0), "b")
        assert jtu.tree_structure(p1) != jtu.tree_structure(p2)

    def test_jit_through(self):
        p = Point(jnp.array(1.0), jnp.array(2.0))

        @jax.jit
        def f(p):
            return p.x + p.y

        assert f(p) == 3.0

    def test_replace(self):
        p = Point(jnp.array(1.0), jnp.array(2.0))
        q = p.replace(x=jnp.array(5.0))
        assert q.x == 5.0 and q.y == 2.0


class TestConst:
    def test_const_no_leaves(self):
        c = Const(3)
        assert jtu.tree_leaves(c) == []
        assert c.unwrap() == 3

    def test_const_through_jit(self):
        @jax.jit
        def f(c):
            assert isinstance(c.val, int)  # concrete inside jit
            return jnp.zeros(c.val)

        assert f(Const(4)).shape == (4,)

    def test_tree_const(self):
        t = tree_const({"a": 1, "b": 2})
        assert jtu.tree_leaves(t) == []
        assert tree_const_unwrap(t) == {"a": 1, "b": 2}

    def test_pytree_const(self):
        assert Pytree.const(3).unwrap() == 3
        c = Pytree.const(Pytree.const(3))
        assert c.unwrap() == 3


class TestClosure:
    def test_closure_dynamic_args(self):
        clo = Closure((jnp.array(2.0),), lambda a, b: a * b)
        assert clo(3.0) == 6.0
        assert len(jtu.tree_leaves(clo)) == 1

    def test_pytree_partial(self):
        @Pytree.partial(jnp.array(10.0))
        def f(ten, x):
            return ten + x

        assert f(5.0) == 15.0

        @jax.jit
        def g(clo, x):
            return clo(x)

        assert g(f, 5.0) == 15.0


@Pytree.dataclass
class Batch(PythonicPytree):
    vals: jnp.ndarray


class TestPythonicPytree:
    def test_len_getitem_iter_concat(self):
        b = Batch(jnp.arange(5.0))
        assert len(b) == 5
        assert b[2].vals == 2.0
        assert [x.vals for x in b] == [0, 1, 2, 3, 4]
        c = b + b
        assert len(c) == 10
