"""The ``Trace`` abstract base: a record of one execution of a generative
function.

Parity: reference ``/root/reference/src/genjax/_src/core/generative/
generative_function.py`` — ``Trace`` :72, score spec :92-136,
``edit/update/project`` :153-194, ``get_subtrace/get_inner_trace`` :196-222.

Invariant: ``get_score()`` is an estimate of ``log 1 / P(choices | args)``
(exactly the log-density for exact-density generative functions). All fields
are pytree leaves, so a vmapped/sharded trace is just a trace whose leaves
carry a leading chain/particle axis.
"""

from __future__ import annotations

import abc
from typing import Any

from ..core.diff import Diff
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from .concepts import Arguments, EditRequest, Retdiff, Score, Weight


class Trace(Pytree):
    @abc.abstractmethod
    def get_args(self) -> Arguments:
        ...

    @abc.abstractmethod
    def get_retval(self) -> Any:
        ...

    @abc.abstractmethod
    def get_score(self) -> Score:
        ...

    @abc.abstractmethod
    def get_choices(self) -> Any:
        """The addressed random choices as a ChoiceMap."""

    @abc.abstractmethod
    def get_gen_fn(self) -> Any:
        ...

    # ----- derived -----

    def get_sample(self) -> Any:
        return self.get_choices()

    def edit(
        self,
        key: PRNGKey,
        request: EditRequest,
        argdiffs: Any = None,
    ) -> tuple["Trace", Weight, Retdiff, EditRequest]:
        if argdiffs is None:
            argdiffs = Diff.tree_diff_no_change(self.get_args())
        return request.edit(key, self, argdiffs)

    def update(
        self,
        key: PRNGKey,
        constraint: Any,
        argdiffs: Any = None,
    ) -> tuple["Trace", Weight, Retdiff, Any]:
        """Constraint-driven edit; returns the backward request's constraint
        (the *discard*) as the final element, mirroring Gen's update.
        Delegates to ``GenerativeFunction.update`` (single source of the
        discard-extraction logic)."""
        return self.get_gen_fn().update(key, self, constraint, argdiffs)

    def project(self, key: PRNGKey, selection: Any) -> Weight:
        gen_fn = self.get_gen_fn()
        return gen_fn.project(key, self, selection)

    def get_subtrace(self, *addresses) -> "Trace":
        tr: Trace = self
        for addr in addresses:
            if isinstance(addr, tuple):
                # a tuple may itself BE the recorded address (a model
                # tracing at `@ ("a", "b")` stores it whole — reference
                # generative_function.py:217-222). Only traces that record
                # named addresses (StaticTrace) expose `.addresses`; for
                # index-structured traces (Scan/Vmap) tuple components
                # must traverse one level each.
                recorded = getattr(tr, "addresses", None)
                if recorded is not None and addr in recorded:
                    tr = tr.get_inner_trace(addr)
                    continue
                for comp in addr:
                    tr = tr.get_inner_trace(comp)
            else:
                tr = tr.get_inner_trace(addr)
        return tr

    def with_gen_fn(self, gen_fn) -> "Trace":
        """A copy of this trace bound to ``gen_fn`` (same choices, score,
        retval). Edit paths use this when the callee itself carried
        changed dynamic leaves (e.g. a re-``partial_apply``-ed closure):
        the sub-edit must score under the NEW closure values, not the
        stale ones recorded in the previous trace."""
        import dataclasses

        return dataclasses.replace(self, gen_fn=gen_fn)

    def get_inner_trace(self, address: Any) -> "Trace":
        raise NotImplementedError(
            f"{type(self).__name__} has no subtraces (not a compound trace)."
        )

    def __getitem__(self, addr):
        return self.get_choices()[addr]
