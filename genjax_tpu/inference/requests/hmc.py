"""Hamiltonian Monte Carlo as an edit request.

Parity: reference ``/root/reference/src/genjax/_src/inference/requests/
hmc.py`` (223 LoC) — ``selection_gradient`` :70 (grad/nongrad pytree unzip
:49-65), ``HMC`` :139 (leapfrog in ``lax.scan`` :170-194, α accept-ratio as
weight :198-203), ``SafeHMC`` :214.

TPU-first notes: the whole trajectory is one ``lax.scan``; position updates
are ``Update`` edits of the trace, so arbitrary models (scan/vmap/static)
compose. Gradients flow through ``assess`` — pure XLA, vmappable over
thousands of chains.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
from jax import lax

from ...core.diff import Diff
from ...core.pytree import Pytree
from ...core.typing_ import PRNGKey, static_check_supports_grad
from ...generative.choice_map import ChoiceMap
from ...generative.concepts import (
    Argdiffs,
    DiffAnnotate,
    EditRequest,
    Retdiff,
    Update,
    Weight,
)
from ...generative.mask import Mask
from ...generative.selection import Selection
from ...generative.trace import Trace


# ----------------------------------------------------------------------
# grad/nongrad pytree unzip (reference hmc.py:49-65)
# ----------------------------------------------------------------------


def _leaf_value(v):
    return v.value if isinstance(v, Mask) else v


def grad_tree_unzip(tree):
    grad_tree = jtu.tree_map(
        lambda v: v if static_check_supports_grad(v) else None, tree
    )
    nongrad_tree = jtu.tree_map(
        lambda v: v if not static_check_supports_grad(v) else None, tree
    )
    return grad_tree, nongrad_tree


def grad_tree_zip(grad_tree, nongrad_tree):
    return jtu.tree_map(
        lambda v1, v2: v1 if v1 is not None else v2,
        grad_tree,
        nongrad_tree,
        is_leaf=lambda x: x is None,
    )


def selection_gradient(
    selection: Selection, trace: Trace, argdiffs: Argdiffs
) -> tuple[ChoiceMap, ChoiceMap]:
    """Differentiate ``assess`` w.r.t. the selected choices
    (reference hmc.py:70). Returns ``(selected_values, gradients)`` as
    choice-map pytrees."""
    chm = trace.get_choices()
    filtered = chm.filter(selection)
    complement = chm.filter(~selection)
    grad_tree, nongrad_tree = grad_tree_unzip(filtered)
    gen_fn = trace.get_gen_fn()

    def differentiable_assess(grad_tree):
        zipped = grad_tree_zip(grad_tree, nongrad_tree)
        full_choices = zipped.merge(complement)
        weight, _ = gen_fn.assess(full_choices, Diff.tree_primal(argdiffs))
        return weight

    def _grad_or_zero(g, v):
        if g is not None:
            return g
        if v is None:
            # structural None (e.g. a dense IndexedChm's idx slot)
            return None
        return jnp.zeros_like(jnp.asarray(v, dtype=jnp.result_type(float)))

    gradients = jtu.tree_map(
        _grad_or_zero,
        jax.grad(differentiable_assess)(grad_tree),
        nongrad_tree,
        is_leaf=lambda x: x is None,
    )
    return grad_tree_zip(grad_tree, nongrad_tree), gradients


# ----------------------------------------------------------------------
# momenta (reference hmc.py:102-131)
# ----------------------------------------------------------------------


def _normal_logpdf_sum(v):
    v = jnp.asarray(v)
    return jnp.sum(-0.5 * v * v - 0.5 * jnp.log(2.0 * jnp.pi))


def assess_momenta(momenta, mul=1.0):
    return jnp.sum(
        jnp.asarray(
            [_normal_logpdf_sum(mul * v) for v in jtu.tree_leaves(momenta)]
        )
    )


def sample_momenta(key: PRNGKey, choice_gradients):
    leaves, treedef = jtu.tree_flatten(choice_gradients)
    momenta_leaves = [
        jr.normal(jr.fold_in(key, i), jnp.shape(leaf))
        for i, leaf in enumerate(leaves)
    ]
    momenta = jtu.tree_unflatten(treedef, momenta_leaves)
    return momenta, assess_momenta(momenta)


# ----------------------------------------------------------------------
# the request
# ----------------------------------------------------------------------


@Pytree.dataclass
class HMC(EditRequest):
    """Leapfrog-integrate Hamiltonian dynamics over the selected (continuous)
    choices; the SMCP3 weight is the MH log-acceptance ratio α
    (reference hmc.py:139)."""

    selection: Selection
    eps: Any
    L: int = Pytree.static(default=10)

    def edit(
        self, key: PRNGKey, tr: Trace, argdiffs: Argdiffs
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        if not Diff.static_check_no_change(argdiffs):
            raise NotImplementedError("HMC requires unchanged arguments.")

        original_model_score = tr.get_score()

        # One differentiable log-joint over the selected values; the
        # leapfrog scan carries ONLY (values, gradients, momenta) — flat
        # arrays, no trace pytree — and each step costs one
        # value_and_grad of assess instead of the round-1 structure
        # (an Update edit re-scoring every address PLUS a separate
        # grad-of-assess ≈ 4 model evaluations per step). The trace is
        # materialized once at the end.
        chm = tr.get_choices()
        complement = chm.filter(~self.selection)
        filtered = chm.filter(self.selection)
        gen_fn = tr.get_gen_fn()
        primal_args = Diff.tree_primal(argdiffs)

        def assess_at(grad_tree, nongrad_tree):
            zipped = grad_tree_zip(grad_tree, nongrad_tree)
            full_choices = zipped.merge(complement)
            weight, _ = gen_fn.assess(full_choices, primal_args)
            return weight

        val_and_grad = jax.value_and_grad(assess_at, argnums=0)

        def full_gradients(values):
            grad_tree, nongrad_tree = grad_tree_unzip(values)
            score, g = val_and_grad(grad_tree, nongrad_tree)

            def _grad_or_zero(gv, v):
                if gv is not None:
                    return gv
                if v is None:
                    return None
                return jnp.zeros_like(
                    jnp.asarray(v, dtype=jnp.result_type(float))
                )

            gradients = jtu.tree_map(
                _grad_or_zero, g, nongrad_tree, is_leaf=lambda x: x is None
            )
            return score, grad_tree_zip(grad_tree, nongrad_tree), gradients

        _, values, gradients = full_gradients(filtered)
        key, sub_key = jr.split(key)
        momenta, original_momenta_score = sample_momenta(sub_key, gradients)

        def _move(v, m):
            # only differentiable leaves integrate; non-grad leaves (e.g.
            # discrete choices riding in the lazily-filtered tree, masked
            # out at read time) stay fixed so the scan carry keeps dtypes
            if static_check_supports_grad(v):
                return v + self.eps * m
            return v

        def leapfrog(carry, _step):
            values, gradients, momenta = carry
            # half-step momentum, full-step position
            momenta = jtu.tree_map(
                lambda m, g: m + (self.eps / 2) * g, momenta, gradients
            )
            values = jtu.tree_map(_move, values, momenta)
            _score, values, gradients = full_gradients(values)
            # second half-step momentum
            momenta = jtu.tree_map(
                lambda m, g: m + (self.eps / 2) * g, momenta, gradients
            )
            return (values, gradients, momenta), None

        (values, _, final_momenta), _ = lax.scan(
            leapfrog,
            (values, gradients, momenta),
            jnp.arange(1, self.L + 1),
            length=self.L,
        )

        final_trace, _, retdiff, _ = Update(values).edit(
            jr.fold_in(key, 0), tr, argdiffs
        )
        alpha = (
            final_trace.get_score()
            - original_model_score
            + assess_momenta(final_momenta, mul=-1.0)
            - original_momenta_score
        )
        return final_trace, alpha, retdiff, HMC(self.selection, self.eps, self.L)


def SafeHMC(selection: Selection, eps, L: int = 10) -> DiffAnnotate:
    """HMC wrapped with a retdiff no-change assertion (reference
    hmc.py:214)."""

    def retdiff_assertion(retdiff):
        assert Diff.static_check_no_change(retdiff), (
            "SafeHMC: the return value changed under the move."
        )
        return retdiff

    return HMC(selection, eps, L).map(retdiff_assertion)


def mh_accept(key: PRNGKey, trace: Trace, new_trace: Trace, alpha: Weight):
    """Metropolis-Hastings accept step over an edit's α weight: returns the
    accepted trace and the accept flag. TPU-friendly: one ``tree_map`` of
    selects, vmappable over chains."""
    log_u = jnp.log(jr.uniform(key))
    accept = log_u < alpha
    out = jtu.tree_map(
        lambda new, old: jnp.where(accept, new, old), new_trace, trace
    )
    return out, accept
