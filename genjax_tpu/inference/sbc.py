"""Simulation-based calibration (Talts, Betancourt, Simpson, Vehtari &
Gelman 2018).

No reference counterpart (the reference validates inference only against
closed forms in its test suite,
`/root/reference/tests/inference/test_requests.py:120-258`). SBC is the PRODUCTION validation
protocol for the whole model+sampler pipeline: draw θ₀ from the prior,
simulate data y | θ₀, run the posterior sampler on y, and record the RANK
of θ₀ among the posterior draws. If the sampler targets the exact
posterior, the ranks are uniform on {0, …, L} for every parameter — any
bias, under/over-dispersion, or bug shows up as a specific rank-histogram
shape (Talts §4). The whole battery is one jitted vmap over simulations.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection
from .requests.grad_view import split_ravel


@Pytree.dataclass
class SBCResult(Pytree):
    """``ranks (n_sims, d)`` of the prior draw among ``n_draws`` posterior
    draws per raveled parameter dimension, and the draw count (ranks live
    in {0..n_draws})."""

    ranks: Any
    n_draws: int = Pytree.static()


def sbc_ranks(
    key: PRNGKey,
    model: GenerativeFunction,
    args: tuple,
    selection: Selection,
    sampler: Callable,
    *,
    n_sims: int,
) -> SBCResult:
    """Run the SBC battery.

    Args:
        model: the generative program (prior over ``selection`` +
            likelihood over its complement).
        sampler: ``(key, constraint ChoiceMap) -> (n_draws, d)`` posterior
            draws of the RAVELED selected parameters given the simulated
            observations (build ``d``'s ordering with the same
            ``filter_eager(selection)`` ravel this function uses — any
            `sample_posterior`/mcmc pipeline wrapped to ravel its output).
            Must be jit-traceable; the battery vmaps it over simulations.
        n_sims: number of prior simulations.

    For a calibrated pipeline each column of ``ranks`` is uniform —
    check with :func:`sbc_uniformity`.
    """

    meta = {}

    def one(k):
        k_sim, k_post = jr.split(k)
        tr = model.simulate(k_sim, args)
        chm = tr.get_choices()
        theta0, _ = split_ravel(chm.filter_eager(selection))
        if theta0.shape[0] == 0:
            raise ValueError(
                "sbc_ranks: the selection contains no continuous "
                "(inexact-dtype) parameters — discrete latents need "
                "tie-broken ranks and are not supported by this battery"
            )
        constraint = chm.filter(~selection)
        draws = sampler(k_post, constraint)  # (n_draws, d)
        meta["n_draws"] = draws.shape[0]  # static shape, set at trace time
        return jnp.sum(draws < theta0[None, :], axis=0)

    ranks = jax.vmap(one)(jr.split(key, n_sims))
    return SBCResult(ranks=ranks, n_draws=meta["n_draws"])


def sbc_uniformity(result_or_ranks, n_draws: int | None = None, *, n_bins: int = 20):
    """Chi-square uniformity statistic per parameter dimension: returns
    ``(pvalues (d,), counts (d, n_bins))``. Ranks in {0..L} are binned
    into ``n_bins`` equiprobable bins (choose ``n_bins`` dividing
    ``L + 1``)."""
    from jax.scipy.stats import chi2

    if hasattr(result_or_ranks, "ranks"):
        ranks = jnp.asarray(result_or_ranks.ranks)
        if n_draws is None:
            n_draws = result_or_ranks.n_draws
    else:
        ranks = jnp.asarray(result_or_ranks)
    assert n_draws is not None and n_draws > 0
    n_sims, d = ranks.shape
    edges = (n_draws + 1) * jnp.arange(1, n_bins) / n_bins
    bins = jnp.sum(ranks[..., None] >= edges[None, None, :], axis=-1)
    counts = jax.vmap(
        lambda col: jnp.bincount(col, length=n_bins), in_axes=1
    )(bins)
    expected = n_sims / n_bins
    stat = jnp.sum((counts - expected) ** 2 / expected, axis=1)
    pvals = 1.0 - chi2.cdf(stat, n_bins - 1)
    return pvals, counts
