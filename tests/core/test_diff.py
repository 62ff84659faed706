"""Diff / change-tangent tests (reference: tests/core/test_diff.py)."""

import jax.numpy as jnp

from genjax_tpu import Diff, NoChange, UnknownChange


class TestDiff:
    def test_constructors(self):
        d = Diff.unknown_change(jnp.array(1.0))
        assert d.tangent is UnknownChange
        d = Diff.no_change(jnp.array(1.0))
        assert d.tangent is NoChange

    def test_tree_primal(self):
        args = (Diff.no_change(1.0), Diff.unknown_change(2.0))
        assert Diff.tree_primal(args) == (1.0, 2.0)

    def test_static_check_no_change(self):
        args = (Diff.no_change(1.0), Diff.no_change((2.0, 3.0)))
        assert Diff.static_check_no_change(args)
        args = (Diff.no_change(1.0), Diff.unknown_change(2.0))
        assert not Diff.static_check_no_change(args)

    def test_idempotent_wrap(self):
        d = Diff.no_change(Diff.unknown_change(5.0))
        assert d.primal == 5.0
        assert d.tangent is NoChange

    def test_tree_diff_helpers(self):
        tree = {"a": 1.0, "b": (2.0, 3.0)}
        d = Diff.tree_diff_unknown_change(tree)
        assert not Diff.static_check_no_change(d)
        assert Diff.tree_primal(d) == tree
