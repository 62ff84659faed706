"""Change tangents (``Diff``) for incremental computation.

Parity: reference ``/root/reference/src/genjax/_src/core/compiler/interpreters/
incremental.py`` — ``ChangeTangent`` :57, ``Diff`` :89, ``NoChange``/
``UnknownChange``, and the propagation rule :300.

TPU-first design: instead of a Jaxpr-level forward interpreter, diffs are
propagated *structurally* at Python trace time. Under ``jit`` this is free —
the payoff of ``NoChange`` is that edit handlers can skip re-binding whole
sub-programs (e.g. ``Scan``'s O(1) index edit), which is where the real
asymptotic wins live on accelerators.
"""

from __future__ import annotations

from typing import Any

import jax.tree_util as jtu

from .pytree import Pytree


class _ChangeTangent:
    _instances: dict[str, "_ChangeTangent"] = {}

    def __new__(cls, name: str):
        if name not in cls._instances:
            inst = super().__new__(cls)
            inst.name = name
            cls._instances[name] = inst
        return cls._instances[name]

    def __repr__(self):
        return self.name


NoChange = _ChangeTangent("NoChange")
UnknownChange = _ChangeTangent("UnknownChange")


@Pytree.dataclass
class Diff(Pytree):
    """A primal value paired with a change tangent."""

    primal: Any
    tangent: _ChangeTangent = Pytree.static(default=UnknownChange)

    # ----- constructors -----

    @staticmethod
    def unknown_change(v: Any) -> "Diff":
        v = Diff.tree_primal(v)
        return Diff(v, UnknownChange)

    @staticmethod
    def no_change(v: Any) -> "Diff":
        v = Diff.tree_primal(v)
        return Diff(v, NoChange)

    # ----- predicates -----

    @staticmethod
    def static_check_tree_diff(v: Any) -> bool:
        """True if every leaf-level node of ``v`` is a Diff."""
        leaves = jtu.tree_leaves(v, is_leaf=lambda x: isinstance(x, Diff))
        return all(isinstance(l, Diff) for l in leaves) and len(leaves) > 0

    @staticmethod
    def static_check_no_change(v: Any) -> bool:
        """True if every Diff in ``v`` carries NoChange."""

        def check(x):
            if isinstance(x, Diff):
                return x.tangent is NoChange
            return True

        leaves = jtu.tree_leaves(v, is_leaf=lambda x: isinstance(x, Diff))
        return all(check(l) for l in leaves)

    # ----- tree ops -----

    @staticmethod
    def tree_primal(v: Any) -> Any:
        """Strip all Diff wrappers, leaving primal values."""

        def _unwrap(x):
            return x.primal if isinstance(x, Diff) else x

        return jtu.tree_map(_unwrap, v, is_leaf=lambda x: isinstance(x, Diff))

    @staticmethod
    def tree_tangent(v: Any) -> Any:
        def _t(x):
            return x.tangent if isinstance(x, Diff) else NoChange

        return jtu.tree_map(_t, v, is_leaf=lambda x: isinstance(x, Diff))

    @staticmethod
    def tree_diff(tree: Any, tangent_tree: Any) -> Any:
        return jtu.tree_map(lambda p, t: Diff(p, t), tree, tangent_tree)

    @staticmethod
    def tree_diff_unknown_change(tree: Any) -> Any:
        tree = Diff.tree_primal(tree)
        return jtu.tree_map(lambda p: Diff(p, UnknownChange), tree)

    @staticmethod
    def tree_diff_no_change(tree: Any) -> Any:
        tree = Diff.tree_primal(tree)
        return jtu.tree_map(lambda p: Diff(p, NoChange), tree)


# Short aliases used throughout combinator edit code.
def tree_diff_primal(v: Any) -> Any:
    return Diff.tree_primal(v)


def tree_diff_no_change(v: Any) -> Any:
    return Diff.tree_diff_no_change(v)


def tree_diff_unknown_change(v: Any) -> Any:
    return Diff.tree_diff_unknown_change(v)


Argdiffs = Any  # tuple of Diff-annotated arguments
Retdiff = Any  # Diff-annotated return value
