"""Metropolis-adjusted Langevin (MALA) as an edit request.

No reference counterpart (the reference ships HMC only). One Langevin step
over the selected continuous choices:

    q' = q + (eps^2 / 2) ∇ log p(q) + eps ξ,   ξ ~ N(0, I)

with the exact MH log-ratio as the SMCP3 weight (asymmetric proposal
correction included). Gradients flow through ``assess`` like HMC's
(``selection_gradient``), so arbitrary models compose, vmapped over
thousands of chains.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu

from ...core.diff import Diff
from ...core.pytree import Pytree
from ...core.typing_ import PRNGKey
from ...generative.concepts import Argdiffs, EditRequest, Retdiff, Update, Weight
from ...generative.selection import Selection
from ...generative.trace import Trace
from ...core.typing_ import static_check_supports_grad
from .hmc import selection_gradient


def _tree_dot(a, b):
    return sum(
        jnp.sum(x * y)
        for x, y in zip(jtu.tree_leaves(a), jtu.tree_leaves(b))
    )


@Pytree.dataclass
class MALA(EditRequest):
    """One Langevin proposal + exact MH weight over ``selection``."""

    selection: Selection
    eps: Any

    def edit(
        self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        if not Diff.static_check_no_change(argdiffs):
            raise NotImplementedError("MALA requires unchanged arguments.")
        eps = self.eps
        values, grads = selection_gradient(self.selection, tr, argdiffs)
        key, noise_key = jr.split(key)
        leaves, treedef = jtu.tree_flatten(values)
        noise = jtu.tree_unflatten(
            treedef,
            [
                jr.normal(jr.fold_in(noise_key, i), jnp.shape(leaf))
                for i, leaf in enumerate(leaves)
            ],
        )
        fwd_mean = jtu.tree_map(
            lambda v, g_: v + 0.5 * eps * eps * g_, values, grads
        )

        def _perturb(v, m, x):
            # only differentiable leaves take the Langevin move; discrete
            # choices riding in the lazily-filtered tree stay fixed (the
            # HMC _move guard), keeping them on-support
            if static_check_supports_grad(v):
                return m + eps * x
            return v

        proposed = jtu.tree_map(_perturb, values, fwd_mean, noise)

        new_tr, w, retdiff, _bwd = Update(proposed).edit(key, tr, argdiffs)

        new_values, new_grads = selection_gradient(self.selection, new_tr, argdiffs)
        bwd_mean = jtu.tree_map(
            lambda v, g_: v + 0.5 * eps * eps * g_, new_values, new_grads
        )
        # Both proposal log-densities are computed from residuals of what
        # is ACTUALLY in the traces, not from the sampled noise: leaves the
        # Update cannot write (masked-out inert values in the lazy filter
        # wrapper, fixed discrete choices) read back unchanged with zero
        # gradient, so their forward and backward residuals are both zero
        # and cancel — using the raw noise for the forward term instead
        # counts +||noise_inert||^2/2 into alpha and breaks detailed
        # balance (over-acceptance growing with the inert dimension).
        fwd_resid = jtu.tree_map(
            lambda new, m: (new - m) / eps, new_values, fwd_mean
        )
        bwd_resid = jtu.tree_map(
            lambda old, m: (old - m) / eps, values, bwd_mean
        )
        fwd_lq = -_tree_dot(fwd_resid, fwd_resid) / 2.0
        bwd_lq = -_tree_dot(bwd_resid, bwd_resid) / 2.0

        alpha = w + bwd_lq - fwd_lq
        return new_tr, alpha, retdiff, MALA(self.selection, self.eps)
