"""``Mask`` combinator: gate a generative function's existence on a runtime
boolean.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/mask.py`` (322 LoC) — ``MaskTrace.build`` :62-89 (score =
``check * inner_score`` :87), ``MaskCombinator`` :111, ``edit`` :179 (the
four-transition weight table), ``assess`` :285, decorator ``mask`` :285.

The masked function takes one extra leading boolean argument. When it is
False the inner function still *runs* (fixed shapes!) but contributes zero
score, and its retval/choices are ``Mask``-wrapped invalid.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.diff import Diff
from ..core.pytree import Pytree
from ..core.staging import FlagOp
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap
from ..generative.concepts import (
    EditRequest,
    NotSupportedEditRequest,
    Retdiff,
    Update,
    Weight,
)
from ..generative.gfi import GenerativeFunction
from ..generative.mask import Mask
from ..generative.selection import Selection
from ..generative.trace import Trace


@Pytree.dataclass
class MaskTrace(Trace):
    gen_fn: "MaskCombinator"
    inner: Trace
    check: Any

    def get_args(self) -> tuple:
        return (self.check, *self.inner.get_args())

    def get_retval(self) -> Mask:
        return Mask(self.inner.get_retval(), self.check)

    def get_score(self):
        return jnp.asarray(self.check) * self.inner.get_score()

    def get_gen_fn(self) -> "MaskCombinator":
        return self.gen_fn

    def get_choices(self) -> ChoiceMap:
        return self.inner.get_choices().mask(self.check)

    def get_inner_trace(self, address) -> Trace:
        return self.inner.get_inner_trace(address)


@Pytree.dataclass
class MaskCombinator(GenerativeFunction):
    gen_fn: GenerativeFunction

    def simulate(self, key: PRNGKey, args: tuple) -> MaskTrace:
        check, inner_args = args[0], args[1:]
        inner = self.gen_fn.simulate(key, inner_args)
        return MaskTrace(self, inner, check)

    def assess(self, chm: ChoiceMap, args: tuple):
        check, inner_args = args[0], args[1:]
        score, retval = self.gen_fn.assess(chm, inner_args)
        return jnp.asarray(check) * score, Mask(retval, check)

    def generate(self, key: PRNGKey, constraint: ChoiceMap, args: tuple):
        check, inner_args = args[0], args[1:]
        inner, w = self.gen_fn.generate(key, constraint, inner_args)
        return MaskTrace(self, inner, check), jnp.asarray(check) * w

    def project(self, key: PRNGKey, trace: MaskTrace, selection: Selection) -> Weight:
        w = self.gen_fn.project(key, trace.inner, selection)
        return jnp.asarray(trace.check) * w

    def edit(
        self,
        key: PRNGKey,
        trace: MaskTrace,
        request: EditRequest,
        argdiffs: Any,
    ) -> tuple[MaskTrace, Weight, Retdiff, EditRequest]:
        if not isinstance(request, Update):
            raise NotSupportedEditRequest(
                f"MaskCombinator cannot serve {type(request).__name__}."
            )
        check_diff, inner_argdiffs = argdiffs[0], argdiffs[1:]
        post_check = Diff.tree_primal(check_diff)
        pre_check = trace.check
        original = trace.inner

        new_inner, weight, retdiff, bwd = self.gen_fn.edit(
            key, original, request, inner_argdiffs
        )

        # The four-transition weight table (reference mask.py:205-255):
        #   False→True : the whole new trace's score enters.
        #   True→False : the original trace's score leaves.
        #   False→False: zero.
        #   True→True  : the inner move's weight.
        t_to_t = FlagOp.and_(pre_check, post_check)
        t_to_f = FlagOp.and_(pre_check, FlagOp.not_(post_check))
        f_to_t = FlagOp.and_(FlagOp.not_(pre_check), post_check)

        final_weight = (
            jnp.asarray(f_to_t) * new_inner.get_score()
            + jnp.asarray(t_to_f) * -original.get_score()
            + jnp.asarray(t_to_t) * weight
        )

        bwd_chm = bwd.constraint if isinstance(bwd, Update) else ChoiceMap.empty()
        # DEVIATION (documented, ARCHITECTURE.md §Deviations): the reference
        # masks the backward constraint by *post_check* (mask.py:262-264),
        # which erases the inner restore-values exactly when the flag turns
        # off — a True→False flip combined with an inner update then cannot
        # be reversed (the dormant inner keeps the mutated value, and the
        # reverse False→True flip turns the WRONG score back on; caught by
        # test_edit_fuzz.py::test_structural_flip_invariants). The inner
        # edit always runs regardless of the flag (fixed shapes), so its
        # backward constraint must always apply on the way back.
        return (
            MaskTrace(self, new_inner, post_check),
            final_weight,
            Mask(retdiff, check_diff),
            Update(bwd_chm),
        )


def mask(gen_fn: GenerativeFunction) -> MaskCombinator:
    """Decorator form (reference mask.py:285)."""
    return MaskCombinator(gen_fn)
