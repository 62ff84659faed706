"""``Rejuvenate``: Metropolis-Hastings-with-custom-proposal as an edit
request (no accept step; the weight is the log-acceptance ratio).

Parity: reference ``/root/reference/src/genjax/_src/inference/requests/
rejuvenate.py`` (94 LoC) — propose via a generative function, ``Update`` the
trace, score the backward move :45-94.
"""

from __future__ import annotations

from typing import Callable

import jax.random as jr

from ...core.pytree import Pytree
from ...core.typing_ import PRNGKey
from ...generative.concepts import (
    Argdiffs,
    EditRequest,
    Retdiff,
    Update,
    Weight,
)
from ...generative.gfi import GenerativeFunction
from ...generative.trace import Trace


@Pytree.dataclass
class Rejuvenate(EditRequest):
    """Propose a trace change from ``proposal`` (a generative function over
    the same addresses), with SMCP3 weight = the MH log-acceptance ratio.

    ``argument_mapping`` maps the current trace's choices to the proposal's
    arguments (e.g. a random-walk kernel centered at the old value).
    """

    proposal: GenerativeFunction
    argument_mapping: Callable = Pytree.static()

    def edit(
        self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        chm = tr.get_choices()
        fwd_args = self.argument_mapping(chm)
        key, sub_key = jr.split(key)
        proposed, fwd_score, _ = self.proposal.propose(sub_key, fwd_args)
        new_tr, w, retdiff, bwd_request = Update(proposed).edit(key, tr, argdiffs)
        assert isinstance(bwd_request, Update)
        bwd_chm = bwd_request.constraint
        # Backward-move proposal arguments come from the NEW trace's choices:
        # the reverse kernel proposes the old values from the new state, so
        # the weight is the exact MH log-ratio (for a symmetric proposal the
        # proposal terms cancel). The reference (rejuvenate.py:86-88) maps
        # the backward arguments from the *discarded* values instead, which
        # scores q(old | old) rather than q(old | new); we deviate to match
        # the documented MH semantics.
        bwd_args = self.argument_mapping(new_tr.get_choices())
        bwd_score, _ = self.proposal.assess(bwd_chm, bwd_args)
        final_weight = w + bwd_score - fwd_score
        return new_tr, final_weight, retdiff, Rejuvenate(
            self.proposal, self.argument_mapping
        )
