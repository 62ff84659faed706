"""``Dimap`` combinator: pre-/post-transform arguments and return value.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/dimap.py`` (359 LoC) — ``DimapTrace`` :46, ``Dimap`` :72, edit
diff propagation :148-190, decorators ``dimap`` :220, ``map`` :275,
``contramap`` :320.
"""

from __future__ import annotations

from typing import Any, Callable

from ..core.diff import Diff, changed_through
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap
from ..generative.concepts import (
    EditRequest,
    Retdiff,
    Update,
    Weight,
)
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection
from ..generative.trace import Trace


@Pytree.dataclass
class DimapTrace(Trace):
    gen_fn: "DimapCombinator"
    inner: Trace
    args: tuple
    retval: Any

    def get_args(self) -> tuple:
        return self.args

    def get_retval(self) -> Any:
        return self.retval

    def get_score(self):
        return self.inner.get_score()

    def get_gen_fn(self) -> "DimapCombinator":
        return self.gen_fn

    def get_choices(self) -> ChoiceMap:
        return self.inner.get_choices()

    def get_inner_trace(self, address) -> Trace:
        return self.inner.get_inner_trace(address)


@Pytree.dataclass
class DimapCombinator(GenerativeFunction):
    gen_fn: GenerativeFunction
    pre: Callable = Pytree.static(default=lambda *args: args)
    post: Callable = Pytree.static(default=lambda args, retval: retval)
    info: str | None = Pytree.static(default=None)

    def _pre(self, args: tuple) -> tuple:
        inner_args = self.pre(*args)
        assert isinstance(inner_args, tuple), (
            f"dimap pre ({self.info}) must return an argument tuple."
        )
        return inner_args

    def simulate(self, key: PRNGKey, args: tuple) -> DimapTrace:
        inner = self.gen_fn.simulate(key, self._pre(args))
        return DimapTrace(self, inner, args, self.post(args, inner.get_retval()))

    def assess(self, chm: ChoiceMap, args: tuple):
        score, retval = self.gen_fn.assess(chm, self._pre(args))
        return score, self.post(args, retval)

    def generate(self, key: PRNGKey, constraint: ChoiceMap, args: tuple):
        inner, w = self.gen_fn.generate(key, constraint, self._pre(args))
        return DimapTrace(self, inner, args, self.post(args, inner.get_retval())), w

    def project(self, key: PRNGKey, trace: DimapTrace, selection: Selection) -> Weight:
        return self.gen_fn.project(key, trace.inner, selection)

    def edit(
        self,
        key: PRNGKey,
        trace: DimapTrace,
        request: EditRequest,
        argdiffs: Any,
    ) -> tuple[DimapTrace, Weight, Retdiff, EditRequest]:
        primals = Diff.tree_primal(argdiffs)
        no_change = Diff.static_check_no_change(argdiffs)
        if no_change:
            inner_argdiffs = Diff.tree_diff_no_change(self._pre(primals))
        else:
            # Per-leaf change propagation through the pre mapping (the
            # reference runs ``pre`` under its incremental interpreter,
            # dimap.py:148-190): an inner arg stays NoChange unless it
            # depends on a changed outer leaf. Collapsing to blanket
            # UnknownChange here made a Switch under ``or_else`` take its
            # index-CHANGED path (resampling unconstrained choices) when
            # only a branch argument changed.
            inner_argdiffs = changed_through(
                lambda *a: self._pre(a), argdiffs
            )
            if inner_argdiffs is None:
                inner_argdiffs = Diff.tree_diff_unknown_change(
                    self._pre(primals)
                )
        new_inner, w, inner_retdiff, bwd = self.gen_fn.edit(
            key, trace.inner, request, inner_argdiffs
        )
        retdiff = changed_through(
            lambda a, r: self.post(a, r), (argdiffs, inner_retdiff)
        )
        if retdiff is None:
            new_retval = self.post(primals, Diff.tree_primal(inner_retdiff))
            retdiff = (
                Diff.tree_diff_no_change(new_retval)
                if no_change and Diff.static_check_no_change(inner_retdiff)
                else Diff.tree_diff_unknown_change(new_retval)
            )
        new_retval = Diff.tree_primal(retdiff)
        return DimapTrace(self, new_inner, primals, new_retval), w, retdiff, bwd


def dimap(
    *,
    pre: Callable = lambda *args: args,
    post: Callable = lambda args, retval: retval,
    info: str | None = None,
):
    """Decorator form (reference dimap.py:220): map the arguments in with
    ``pre`` and the return value out with ``post`` (choices unchanged).

    >>> import jax
    >>> import genjax_tpu as g
    >>> @g.dimap(pre=lambda a: (a * 2.0,), post=lambda args, r: r + 100.0)
    ... @g.gen
    ... def shifted(mu):
    ...     return g.normal(mu, 0.01) @ "x"
    >>> tr = shifted.simulate(jax.random.key(0), (1.0,))
    >>> bool(abs(tr.get_retval() - 102.0) < 1.0)  # pre doubles, post +100
    True
    """

    def decorator(gen_fn: GenerativeFunction) -> DimapCombinator:
        return DimapCombinator(gen_fn, pre, post, info)

    return decorator


def map(f: Callable, *, info: str | None = None):
    """Post-transform the return value (reference dimap.py:275)."""

    def decorator(gen_fn: GenerativeFunction) -> DimapCombinator:
        return DimapCombinator(
            gen_fn, post=lambda _args, retval: f(retval), info=info
        )

    return decorator


def contramap(f: Callable, *, info: str | None = None):
    """Pre-transform the arguments (reference dimap.py:320)."""

    def decorator(gen_fn: GenerativeFunction) -> DimapCombinator:
        return DimapCombinator(gen_fn, pre=f, info=info)

    return decorator
