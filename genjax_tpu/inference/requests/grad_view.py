"""One shared gradient path over selected choices.

Every gradient-using move in the repo — ``HMC``, ``MALA``, ``NUTS``,
slice/elliptical samplers, MAP/Laplace fitting, involutive MH — needs the
same view of a trace: the choices picked out by a ``Selection``, with the
differentiable leaves raveled into ONE flat vector ``z`` and a scalar
log-joint ``logdensity(z)`` that XLA can differentiate, vmap, and scan.
This module is that view; the request modules contain only their own
dynamics.

Design (repo-native; replaces the round-2 transcription of reference
``hmc.py:49-96``'s paired grad/nongrad-tree unzip): the selected tree is
flattened ONCE into a leaf list plus a boolean differentiability mask, the
differentiable leaves ravel into ``z``, and ``rebuild`` splices vector
slices back into their slots — non-differentiable leaves (discrete
choices, mask flags) ride along untouched. Structural ``None``s never
appear: ``tree_flatten`` treats ``None`` as an empty subtree, so they
survive the round trip without special-casing.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.flatten_util import ravel_pytree

from ...core.diff import Diff
from ...core.typing_ import static_check_supports_grad
from ...generative.choice_map import ChoiceMap
from ...generative.concepts import Argdiffs
from ...generative.selection import Selection
from ...generative.trace import Trace


def split_ravel(
    tree,
) -> tuple[Any, Callable]:
    """Ravel the differentiable leaves of ``tree`` into one flat vector.

    Returns ``(z0, rebuild)``: ``rebuild(z)`` reassembles the full tree
    with ``z``'s slices in the differentiable slots and the original
    values everywhere else; ``rebuild(z, nongrad_fill=fn)`` replaces each
    non-differentiable leaf with ``fn(leaf)`` instead (e.g. zeros for a
    gradient tree, ``None`` to blank them out).
    """
    leaves, treedef = jtu.tree_flatten(tree)
    diff_mask = tuple(static_check_supports_grad(l) for l in leaves)
    z0, unravel = ravel_pytree(
        [l for l, d in zip(leaves, diff_mask) if d]
    )

    def rebuild(z, nongrad_fill: Callable | None = None):
        slices = iter(unravel(z))
        out = [
            next(slices)
            if d
            else (l if nongrad_fill is None else nongrad_fill(l))
            for l, d in zip(leaves, diff_mask)
        ]
        return jtu.tree_unflatten(treedef, out)

    return z0, rebuild


def selected_logdensity(
    gen_fn, chm: ChoiceMap, selection: Selection, args: tuple
) -> tuple[Any, Callable, Callable]:
    """The standard sampler entry point: eagerly materialize ``selection``'s
    choices, ravel, and close ``assess`` over the frozen complement.

    Returns ``(z0, logdensity, to_choices)`` where ``logdensity(z)`` is
    the differentiable log-joint and ``to_choices(z)`` the selected-choice
    map a position vector corresponds to (for the final ``Update``)."""
    frozen = chm.filter(~selection)
    z0, rebuild = split_ravel(chm.filter_eager(selection))

    def logdensity(z):
        weight, _ = gen_fn.assess(rebuild(z).merge(frozen), args)
        return weight

    return z0, logdensity, rebuild


def column_view(traces, selection: Selection, chain_axis: int = 0):
    """The trace↔column bridge for BATCHED samplers, shared by
    ``run_chains_hmc``/``run_chains_nuts`` and ``sample_posterior``'s
    ``hmc_sweep`` path (one implementation, one semantics — a fix to the
    density contract lands everywhere at once).

    Given a batched trace pytree (chain axis at ``chain_axis`` on every
    leaf), returns ``(z_cols, ld_cols, write_back)``:

    - ``z_cols``: the selected choices of all chains raveled into a
      ``(d, n_chains)`` column block;
    - ``ld_cols(Z)``: the batched log-joint ``(d, N) -> (N,)`` — each
      chain's GFI ``assess`` over its own frozen complement, so indexed
      selections and per-chain constraints are honored;
    - ``write_back(z_final, key)``: rebuild the trace batch with the
      final positions via one vmapped ``Update`` edit.
    """
    import jax.random as jr

    sel_chm = lambda tr: tr.get_choices().filter_eager(selection)

    def z_of(tr):
        return split_ravel(sel_chm(tr))[0]

    z_cols = jax.vmap(z_of, in_axes=chain_axis, out_axes=1)(traces)

    def ld_one(tr, z):
        chm = tr.get_choices()
        _z0, rebuild = split_ravel(chm.filter_eager(selection))
        w, _ = tr.get_gen_fn().assess(
            rebuild(z).merge(chm.filter(~selection)), tr.get_args()
        )
        return w

    def ld_cols(z):
        return jax.vmap(ld_one, in_axes=(chain_axis, 1))(traces, z)

    def write_back(z_final, key):
        def one(tr, z, k):
            _z0, rebuild = split_ravel(sel_chm(tr))
            new_tr, _w, _rd, _bwd = tr.update(k, rebuild(z))
            return new_tr

        return jax.vmap(
            one, in_axes=(chain_axis, 1, 0), out_axes=chain_axis
        )(traces, z_final, jr.split(key, z_cols.shape[1]))

    return z_cols, ld_cols, write_back


def _zero_like_float(leaf):
    return jnp.zeros_like(jnp.asarray(leaf, dtype=jnp.result_type(float)))


def selection_gradient(
    selection: Selection, trace: Trace, argdiffs: Argdiffs
) -> tuple[ChoiceMap, ChoiceMap]:
    """Value and gradient of the log-joint w.r.t. the selected choices,
    both shaped like the LAZILY filtered choice map (reference hmc.py:70
    capability; the lazy filter keeps masked-out inert leaves in the tree,
    which ``MALA`` relies on — they read back with zero gradient).

    Returns ``(values, gradients)``; non-differentiable leaves carry zero
    gradients of float dtype."""
    chm = trace.get_choices()
    target = chm.filter(selection)
    frozen = chm.filter(~selection)
    z0, rebuild = split_ravel(target)
    args = Diff.tree_primal(argdiffs)
    gen_fn = trace.get_gen_fn()

    gz = jax.grad(
        lambda z: gen_fn.assess(rebuild(z).merge(frozen), args)[0]
    )(z0)
    return rebuild(z0), rebuild(gz, nongrad_fill=_zero_like_float)
