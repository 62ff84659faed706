"""GFI value concepts and edit-request base classes.

Parity: reference ``/root/reference/src/genjax/_src/core/generative/
concepts.py`` — ``Weight`` :48, ``Score`` :54, ``Arguments`` :61, ``Argdiffs``
:66, ``Retdiff`` :77, ``EditRequest.edit`` :95-109, ``PrimitiveEditRequest``
:135, ``IndexRequest`` :154, ``NotSupportedEditRequest`` :167; plus the extra
requests from ``requests.py`` — ``EmptyRequest`` :49, ``Regenerate`` :64,
``DiffAnnotate`` :70 — and ``Update`` from ``generative_function.py`` :1688.

Weights follow SMCP3 semantics: for an edit moving ``(x, args)`` to
``(x', args')`` the returned weight is
``log [ P(x'; args') q(x; bwd) / P(x; args) q(x'; fwd) ]`` so that importance
weights of particle collections remain properly calibrated under edits.
"""

from __future__ import annotations

import abc
from typing import TYPE_CHECKING, Any, Callable

from ..core.diff import Argdiffs, Diff, Retdiff
from ..core.handlers import GenJAXError
from ..core.pytree import Pytree
from ..core.typing_ import FloatArray, PRNGKey

if TYPE_CHECKING:
    from .trace import Trace

# ----- value aliases (concepts.py:48-88) -----

Weight = FloatArray
Score = FloatArray
Arguments = tuple
Retval = Any

__all__ = [
    "Arguments",
    "Argdiffs",
    "DiffAnnotate",
    "EditRequest",
    "EmptyRequest",
    "IndexRequest",
    "NotSupportedEditRequest",
    "PrimitiveEditRequest",
    "Regenerate",
    "Retdiff",
    "Retval",
    "Score",
    "Update",
    "VectorRequest",
    "Weight",
]


class NotSupportedEditRequest(GenJAXError):
    """Raised when a generative function cannot serve an edit request."""


class EditRequest(Pytree):
    """A request to transform a trace into a new trace, with SMCP3 weight
    accounting. ``edit`` returns ``(new_trace, weight, retdiff, bwd_request)``
    where applying ``bwd_request`` to ``new_trace`` recovers the original."""

    @abc.abstractmethod
    def edit(
        self,
        key: PRNGKey,
        tr: "Trace",
        argdiffs: Argdiffs,
    ) -> tuple["Trace", Weight, Retdiff, "EditRequest"]:
        ...

    def dimap(
        self,
        argdiff_fn: Callable = lambda d: d,
        retdiff_fn: Callable = lambda d: d,
    ) -> "DiffAnnotate":
        return DiffAnnotate(self, argdiff_fn, retdiff_fn)

    def map(self, retdiff_fn: Callable) -> "DiffAnnotate":
        return DiffAnnotate(self, lambda d: d, retdiff_fn)

    def contramap(self, argdiff_fn: Callable) -> "DiffAnnotate":
        return DiffAnnotate(self, argdiff_fn, lambda d: d)


class PrimitiveEditRequest(EditRequest):
    """An edit request whose semantics are implemented by the generative
    function itself: defers to ``gen_fn.edit`` (concepts.py:135-152)."""

    def edit(self, key, tr, argdiffs):
        gen_fn = tr.get_gen_fn()
        return gen_fn.edit(key, tr, self, argdiffs)


@Pytree.dataclass
class Update(PrimitiveEditRequest):
    """Constraint-driven edit: overwrite addressed choices with the values in
    ``constraint`` (generative_function.py:1688)."""

    constraint: Any  # ChoiceMap


@Pytree.dataclass
class Regenerate(PrimitiveEditRequest):
    """Resample the selected addresses from their priors (requests.py:64)."""

    selection: Any  # Selection


@Pytree.dataclass
class IndexRequest(PrimitiveEditRequest):
    """Apply a sub-request at a dynamic index of a ``Scan``/``Vmap`` trace —
    the O(1) single-slice edit (concepts.py:154)."""

    index: Any
    request: EditRequest


@Pytree.dataclass
class VectorRequest(PrimitiveEditRequest):
    """Per-lane (vmap) / per-step (scan) edit requests: one request pytree
    whose array leaves carry the batch/time axis in front; slice ``t`` is
    the request for lane/step ``t`` (reference scan.py:100). This is how
    combinator edits return *lossless* backward requests when the kernel's
    backward move is not a plain Update (e.g. a @gen kernel's Regenerate
    produces per-address ``StaticRequest``s)."""

    request: EditRequest


@Pytree.dataclass
class EmptyRequest(EditRequest):
    """No-op unless argdiffs changed, in which case it falls back to an empty
    Update (requests.py:49)."""

    def edit(self, key, tr, argdiffs):
        if Diff.static_check_no_change(argdiffs):
            retdiff = Diff.tree_diff_no_change(tr.get_retval())
            return tr, 0.0, retdiff, EmptyRequest()
        from .choice_map import ChoiceMap

        return Update(ChoiceMap.empty()).edit(key, tr, argdiffs)


@Pytree.dataclass
class DiffAnnotate(EditRequest):
    """Unsafe coercion of argdiff/retdiff annotations around an inner request
    (requests.py:70). The caller asserts the coercions are sound."""

    request: EditRequest
    argdiff_fn: Callable = Pytree.static(default=lambda d: d)
    retdiff_fn: Callable = Pytree.static(default=lambda d: d)

    def edit(self, key, tr, argdiffs):
        new_argdiffs = self.argdiff_fn(argdiffs)
        new_tr, w, retdiff, bwd = self.request.edit(key, tr, new_argdiffs)
        return new_tr, w, self.retdiff_fn(retdiff), bwd
