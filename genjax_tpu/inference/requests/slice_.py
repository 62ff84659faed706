"""Univariate slice sampling (Neal 2003) as an edit request.

No reference counterpart (its request set is gradient-based HMC/MALA plus
prior-proposal Regenerate — `/root/reference/src/genjax/_src/inference/
requests/`). Slice sampling is the tuning-free move for a SCALAR site
with arbitrary density — no step size to adapt, acceptance probability 1,
and no Gaussian-prior requirement (where `EllipticalSlice` stops): draw a
level log u < log π(x), step out an interval until it brackets the slice
(Neal §4.1, the capped variant with a randomized side budget), then
shrink until a point inside the slice is found.

The target is the joint density of the whole trace as a function of the
selected scalar (``assess`` under the hood), so conditionals over any
model structure are exact. Both loops are ``lax.while_loop``s of one
``assess`` each; under ``jax.vmap`` over chains they batch into lock-step
masked loops like the elliptical kernel's.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import jax.random as jr
from jax import lax

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
class SliceSample(EditRequest):
    """One slice-sampling transition of the selected SCALAR choice.

    ``width`` is the initial bracket size (the only — scale-free —
    parameter; mixing is robust to it within a few orders of magnitude).
    ``max_steps`` bounds the stepping-out budget (split randomly between
    the sides, Neal's capped procedure — reversible even when the cap
    binds) and the shrink loop. The transition is in detailed balance
    with the joint, so the SMCP3 weight is 0 and ``mh`` always
    accepts."""

    selection: Selection
    width: Any = 1.0
    max_steps: int = Pytree.static(default=32)

    def edit(
        self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        if not Diff.static_check_no_change(argdiffs):
            raise NotImplementedError(
                "SliceSample requires unchanged arguments."
            )

        z0, logdensity, to_choices = selected_logdensity(
            tr.get_gen_fn(),
            tr.get_choices(),
            self.selection,
            Diff.tree_primal(argdiffs),
        )
        if z0.shape != (1,):
            raise ValueError(
                "SliceSample targets exactly one scalar choice; the "
                f"selection ravels to shape {z0.shape}. Use EllipticalSlice "
                "or HMC for vector blocks."
            )

        def logp(x):
            return logdensity(x[None])

        x0 = z0[0]
        k_u, k_pos, k_dir, k_shrink, k_update = jr.split(key, 5)
        log_y = logp(x0) + jnp.log(jr.uniform(k_u))

        # --- stepping out (Neal 2003 fig. 3, the CAPPED variant): the
        # step budget max_steps is split RANDOMLY between the two sides
        # (J = floor(m·u), K = m−1−J) — required for reversibility when
        # the cap binds; a deterministic split biases the interval and
        # hence the stationary distribution near slice boundaries ---
        w = jnp.asarray(self.width, x0.dtype)
        lo = x0 - w * jr.uniform(k_pos)
        hi = lo + w
        j_budget = jnp.floor(
            self.max_steps * jr.uniform(k_dir)
        ).astype(jnp.int32)
        k_budget = self.max_steps - 1 - j_budget

        def expand(pos, budget, direction):
            # one logp eval per iteration: carry the inside-slice flag
            def cond(state):
                _pos, j, inside = state
                return jnp.logical_and(j < budget, inside)

            def body(state):
                pos, j, _ = state
                pos2 = pos + direction * w
                return pos2, j + 1, logp(pos2) > log_y

            pos, _, _ = lax.while_loop(
                cond, body, (pos, 0, logp(pos) > log_y)
            )
            return pos

        lo = expand(lo, j_budget, -1.0)
        hi = expand(hi, k_budget, 1.0)

        # --- shrink ---
        def shrink_cond(state):
            x, lo, hi, ok, j = state
            return jnp.logical_and(j < self.max_steps, ~ok)

        def shrink(state):
            x, lo, hi, ok, j = state
            x_new = lo + (hi - lo) * jr.uniform(
                jr.fold_in(k_shrink, j), dtype=x0.dtype
            )
            ok_new = logp(x_new) > log_y
            lo = jnp.where(jnp.logical_or(ok_new, x_new >= x0), lo, x_new)
            hi = jnp.where(jnp.logical_or(ok_new, x_new < x0), hi, x_new)
            x = jnp.where(ok_new, x_new, x)
            return x, lo, hi, jnp.logical_or(ok, ok_new), j + 1

        x1, _, _, ok, _ = lax.while_loop(
            shrink_cond, shrink, (x0, lo, hi, jnp.asarray(False), 0)
        )
        x1 = jnp.where(ok, x1, x0)  # cap hit ⇒ exact no-op

        final_trace, _, retdiff, _ = Update(to_choices(x1[None])).edit(
            k_update, tr, argdiffs
        )
        return (
            final_trace,
            jnp.asarray(0.0),
            retdiff,
            SliceSample(self.selection, self.width, self.max_steps),
        )
