"""Particle Gibbs (conditional SMC with ancestor sampling) and
particle-marginal Metropolis-Hastings for state-space models.

No reference counterpart: the reference stops at one-shot conditional SMC
initialization (``/root/reference/src/genjax/_src/inference/smc.py:317-351``,
``ImportanceK.run_csmc``). This module supplies the *sequential* conditional
particle filter over a scanned kernel — the retained trajectory survives
every resampling step — plus the two classic samplers built on it:

- ``particle_gibbs``: iterated CSMC (Andrieu, Doucet & Holenstein 2010),
  optionally with ancestor sampling (Lindsten, Jordan & Schön 2014), which
  breaks path degeneracy for early time steps.
- ``pmmh``: particle-marginal MH — a random-walk parameter chain accepted
  on the particle filter's unbiased marginal-likelihood estimate.

TPU-first notes: one sweep is a single ``lax.scan`` over time with all K
particles vmapped per step; a whole Gibbs run is one jitted
``lax.scan``-of-sweeps (no host round trips). Ancestor bookkeeping is
O(T·K) int32; the backward path trace is a reverse ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
from jax import lax
from jax.scipy.special import logsumexp

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection


@Pytree.dataclass
class CSMCSweepResult(Pytree):
    """One conditional-SMC pass: the freshly sampled trajectory (latent
    choices stacked time-leading), its final carry, and the sweep's
    log-marginal-likelihood estimate."""

    retained: ChoiceMap
    final_carry: Any
    log_marginal: Any


@Pytree.dataclass
class PGibbsResult(Pytree):
    """``particle_gibbs`` output: per-sweep retained trajectories (leaves
    shaped ``(n_sweeps, T, ...)``) and per-sweep logZ estimates."""

    trajectories: ChoiceMap
    log_marginals: Any


@Pytree.dataclass
class PMMHResult(Pytree):
    """``pmmh`` output: the parameter chain (leaves ``(n_steps, ...)``),
    the retained log-prior/logZ estimates, and the acceptance rate."""

    params: Any
    log_priors: Any
    log_zs: Any
    accept_rate: Any


def _take0(tree, idx):
    return jtu.tree_map(lambda v: jnp.take(v, idx, axis=0), tree)


def _set0(tree, idx, value):
    return jtu.tree_map(lambda b, s: b.at[idx].set(s), tree, value)


def csmc_sweep(
    key: PRNGKey,
    kernel: GenerativeFunction,
    init_carry: Any,
    xs: Any,
    obs: ChoiceMap,
    retained: ChoiceMap | None,
    *,
    latent_selection: Selection,
    n_particles: int,
    ancestor_sampling: bool = True,
    n_steps: int | None = None,
) -> CSMCSweepResult:
    """One (conditional) bootstrap particle-filter sweep over a scanned
    kernel ``(carry, x) -> (carry, y)``, returning a trajectory sampled by
    ancestral trace-back.

    ``obs`` is the time-indexed observation constraint (as for
    ``SSMParticleFilter``: ``obs.get_submap(t)`` per step). ``retained`` is
    either ``None`` — an unconditional sweep, valid for initializing a
    Gibbs chain — or a trajectory in the format this function returns:
    the kernel's latent choices (``latent_selection``-filtered), stacked
    with a leading time axis. With ``retained`` given, slot ``K-1`` is
    pinned to it through every resampling step (CSMC); with
    ``ancestor_sampling=True`` the retained slot's ancestor is re-sampled
    each step from ``w_j · p(z_t^ret | carry_j)`` (PGAS).

    Resampling is multinomial at every step (the textbook CSMC schedule,
    which keeps the conditional kernel's invariance argument exact).
    """
    k = n_particles
    conditional = retained is not None

    leaves = jtu.tree_leaves(xs)
    t_count = leaves[0].shape[0] if leaves else n_steps
    if t_count is None:
        raise ValueError("csmc_sweep: xs is None/empty — pass n_steps.")
    if not leaves:
        xs = jnp.zeros((t_count, 0))

    scan_key, final_key = jr.split(key)

    def broadcast(c):
        return jtu.tree_map(
            lambda v: jnp.broadcast_to(jnp.asarray(v), (k,) + jnp.shape(v)), c
        )

    def extend_free(pkey, c, t, x):
        submap = obs.get_submap(t)
        tr, w = kernel.generate(pkey, submap, (c, x))
        c_new, _y = tr.get_retval()
        lat = tr.get_choices().filter_eager(latent_selection)
        return c_new, w, lat

    def step(state, inp):
        carries, log_w, log_z = state
        if conditional:
            t, x, ret_t = inp
        else:
            t, x = inp
            ret_t = None
        kbase = jr.fold_in(scan_key, t)
        # independent streams per role; never fold_in off a key that also
        # parents a split (fold_in(k, i) == split(k, n)[i] in this JAX —
        # round-1 ADVICE finding)
        k_anc, k_ext, k_ret, k_pgas, k_proj = jr.split(kbase, 5)

        # --- resample ancestors from the current weights --------------
        log_z = log_z + logsumexp(log_w) - jnp.log(k)
        anc = jr.categorical(k_anc, log_w, shape=(k,))
        if conditional:
            if ancestor_sampling:
                # PGAS: ancestor of the retained slot ∝ w_j · p(ret_t | c_j).
                # kernel.assess wants every address constrained; the obs
                # term is constant across j so it cancels in the softmax.
                full_t = ret_t | obs.get_submap(t)

                def trans_score(c):
                    score, _ret = kernel.assess(full_t, (c, x))
                    return score

                lp_trans = jax.vmap(trans_score)(carries)
                a_ret = jr.categorical(k_pgas, log_w + lp_trans)
            else:
                a_ret = jnp.asarray(k - 1)
            anc = anc.at[k - 1].set(a_ret)
        parents = _take0(carries, anc)

        # --- extend every particle through the kernel ------------------
        pkeys = jr.split(k_ext, k)
        carries, ws, lats = jax.vmap(extend_free, in_axes=(0, 0, None, None))(
            pkeys, parents, t, x
        )

        if conditional:
            # Pin slot K-1: force the retained latents; its bootstrap
            # incremental weight is the observation density alone.
            # generate's weight scores BOTH constrained latents and the
            # observation; project(latent_selection) subtracts the
            # latents' prior score, leaving log p(y_t | z_t^ret).
            parent_ret = _take0(parents, k - 1)
            submap = ret_t | obs.get_submap(t)
            tr_ret, w_full = kernel.generate(k_ret, submap, (parent_ret, x))
            proj = tr_ret.project(k_proj, latent_selection)
            c_ret, _y = tr_ret.get_retval()
            carries = _set0(carries, k - 1, c_ret)
            ws = ws.at[k - 1].set(w_full - proj)
            lats = _set0(lats, k - 1, ret_t)

        return (carries, ws, log_z), (lats, anc)

    init = (broadcast(init_carry), jnp.zeros((k,)), jnp.asarray(0.0))
    scan_xs = (jnp.arange(t_count), xs)
    if conditional:
        scan_xs = scan_xs + (retained,)
    (carries, log_w, log_z), (lat_hist, anc_hist) = lax.scan(
        step, init, scan_xs
    )
    log_marginal = log_z + logsumexp(log_w) - jnp.log(k)

    # --- ancestral trace-back: sample the output trajectory ------------
    # anc_hist[t] maps a slot at step t to its parent slot at step t-1
    # (ancestors are drawn at the START of step t from step t-1's
    # weights; anc_hist[0] points into the exchangeable initial carries
    # and is not needed). Walk back from the final categorical draw.
    b_final = jr.categorical(final_key, log_w)

    def back(b, anc_t):
        return anc_t[b], b

    b0, path_tail = lax.scan(back, b_final, anc_hist[1:], reverse=True)
    path = jnp.concatenate([b0[None], path_tail])  # [b_0, ..., b_{T-1}]
    new_retained = jtu.tree_map(
        lambda v: v[jnp.arange(t_count), path], lat_hist
    )
    final_carry = _take0(carries, b_final)
    return CSMCSweepResult(new_retained, final_carry, log_marginal)


def particle_gibbs(
    key: PRNGKey,
    kernel: GenerativeFunction,
    init_carry: Any,
    xs: Any,
    obs: ChoiceMap,
    *,
    latent_selection: Selection,
    n_particles: int,
    n_sweeps: int,
    ancestor_sampling: bool = True,
    n_steps: int | None = None,
) -> PGibbsResult:
    """Iterated conditional SMC targeting the smoothing posterior
    ``p(z_{0:T} | y_{0:T})``. Each sweep runs a conditional particle filter
    holding the previous sweep's trajectory, then ancestral-samples a new
    one — a Markov kernel that leaves the exact posterior invariant for
    any ``n_particles ≥ 2`` (Andrieu et al. 2010, thm. 5).

    Returns every sweep's trajectory (leaves ``(n_sweeps, T, ...)``); burn
    in and thin at the call site.
    """
    init_key, sweep_key = jr.split(key)
    first = csmc_sweep(
        init_key, kernel, init_carry, xs, obs, None,
        latent_selection=latent_selection, n_particles=n_particles,
        n_steps=n_steps,
    )

    def one(retained, skey):
        out = csmc_sweep(
            skey, kernel, init_carry, xs, obs, retained,
            latent_selection=latent_selection, n_particles=n_particles,
            ancestor_sampling=ancestor_sampling, n_steps=n_steps,
        )
        return out.retained, (out.retained, out.log_marginal)

    _, (trajs, log_zs) = lax.scan(
        one, first.retained, jr.split(sweep_key, n_sweeps)
    )
    return PGibbsResult(trajs, log_zs)


def pmmh(
    key: PRNGKey,
    init_params: Any,
    log_prior_fn,
    log_z_fn,
    *,
    n_steps: int,
    step_scales: Any,
) -> PMMHResult:
    """Particle-marginal Metropolis-Hastings (Andrieu et al. 2010 §2.4):
    a Gaussian random-walk chain over a parameter pytree, accepted on
    ``log_prior_fn(params) + log_z_fn(key, params)`` where ``log_z_fn`` is
    an *unbiased* marginal-likelihood estimator (e.g. a
    ``SSMParticleFilter.run(...).log_marginal``, or an exact marginal —
    then this is plain marginal MH). The current estimate is carried with
    the chain; re-estimating it for the held state each step would break
    the exact-posterior invariance.

    ``step_scales`` is a scalar or a pytree matching ``init_params``.
    """
    params0 = jtu.tree_map(jnp.asarray, init_params)
    try:
        scales = jtu.tree_map(
            lambda _v, s: jnp.asarray(s), params0, step_scales
        )
    except ValueError:
        scales = jtu.tree_map(lambda _v: jnp.asarray(step_scales), params0)

    k_init, k_chain = jr.split(key)
    lp0 = jnp.asarray(log_prior_fn(params0), jnp.float32)
    lz0 = jnp.asarray(log_z_fn(k_init, params0), jnp.float32)

    def step(state, skey):
        params, lp, lz = state
        k_prop, k_z, k_acc = jr.split(skey, 3)
        leaves, treedef = jtu.tree_flatten(params)
        noise_keys = jr.split(k_prop, len(leaves))
        prop_leaves = [
            v + s * jr.normal(nk, jnp.shape(v), jnp.result_type(v, float))
            for v, s, nk in zip(leaves, jtu.tree_leaves(scales), noise_keys)
        ]
        prop = jtu.tree_unflatten(treedef, prop_leaves)
        lp_new = jnp.asarray(log_prior_fn(prop), jnp.float32)
        lz_new = jnp.asarray(log_z_fn(k_z, prop), jnp.float32)
        log_alpha = (lp_new + lz_new) - (lp + lz)
        accept = jnp.log(jr.uniform(k_acc)) < log_alpha
        new_state = jtu.tree_map(
            lambda a, b: jnp.where(accept, a, b),
            (prop, lp_new, lz_new),
            (params, lp, lz),
        )
        return new_state, (new_state[0], new_state[1], new_state[2], accept)

    _, (chain, lps, lzs, accepts) = lax.scan(
        step, (params0, lp0, lz0), jr.split(k_chain, n_steps)
    )
    return PMMHResult(chain, lps, lzs, jnp.mean(accepts))
