"""No-U-Turn sampling as an edit request over arbitrary traces.

No reference counterpart (the reference ships plain HMC only,
hmc.py:139). This lifts the fused column NUTS transition
(``kernels/nuts.py`` — iterative, fixed-shape, checkpoint-stack U-turn
detection) to the GFI: the selected continuous choices are raveled to one
position vector, the log-joint comes from ``assess``, and the resulting
kernel leaves the model posterior invariant.

As an ``EditRequest`` the move is its own reverse and the target is
stationary under it, so the SMCP3 weight is 0 (unlike ``HMC``, which
returns the MH log-α for an external accept step — NUTS's multinomial
trajectory sampling has acceptance built in). Use directly with
``tr.edit``/``run_chain(s)``; ``mh()`` composes too (the α=0 accept is a
no-op).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import jax.random as jr

from ...core.diff import Diff
from ...core.pytree import Pytree
from ...core.typing_ import PRNGKey
from ...generative.concepts import (
    Argdiffs,
    EditRequest,
    Retdiff,
    Update,
    Weight,
)
from ...generative.selection import Selection
from ...generative.trace import Trace
from .grad_view import selected_logdensity


@Pytree.dataclass
class NUTS(EditRequest):
    """One No-U-Turn transition over the selected (continuous) choices.

    ``inv_mass``: optional diagonal inverse mass over the *raveled*
    selected-choice vector (e.g. from ``inference.adaptation.
    cross_chain_inv_mass`` on a batch of raveled positions)."""

    selection: Selection
    eps: Any
    max_depth: int = Pytree.static(default=8)
    divergence_threshold: float = Pytree.static(default=1000.0)
    inv_mass: Any = None

    def edit_with_info(self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs):
        """Like ``edit`` but also returns the transition's ``NUTSInfo``
        (accept statistic, leapfrog count, divergence flag, tree depth) —
        used by drivers that surface sampler health (``sample_posterior``).
        """
        if not Diff.static_check_no_change(argdiffs):
            raise NotImplementedError("NUTS requires unchanged arguments.")
        from ...kernels.nuts import nuts_transition

        z0, logdensity, to_choices = selected_logdensity(
            tr.get_gen_fn(),
            tr.get_choices(),
            self.selection,
            Diff.tree_primal(argdiffs),
        )
        k_move, k_update = jr.split(key)
        z_new, info = nuts_transition(
            logdensity,
            z0.astype(jnp.float32),
            k_move,
            self.eps,
            max_depth=self.max_depth,
            divergence_threshold=self.divergence_threshold,
            inv_mass=self.inv_mass,
        )
        new_tr, _w, retdiff, _bwd = Update(to_choices(z_new)).edit(
            k_update, tr, argdiffs
        )
        bwd = NUTS(
            self.selection,
            self.eps,
            self.max_depth,
            self.divergence_threshold,
            self.inv_mass,
        )
        return new_tr, jnp.asarray(0.0), retdiff, bwd, info

    def edit(
        self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        new_tr, w, retdiff, bwd, _info = self.edit_with_info(
            key, tr, argdiffs
        )
        return new_tr, w, retdiff, bwd
