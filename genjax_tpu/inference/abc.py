"""Likelihood-free inference: ABC rejection and adaptive ABC-SMC.

No reference counterpart (`/root/reference/src/genjax/_src/inference/`
stops at SMC/VI/MCMC, all of which need a tractable density) — this
module covers the remaining regime: models whose *simulator* is a
``@gen`` program but whose likelihood is never evaluated. Algorithms:

* ``abc_rejection`` — vmapped simulate-and-compare (Pritchard et al.
  1999): one fixed-shape program, results come back as a vectorized
  ``Mask`` over the batch of traces (the framework's native
  validity-flag idiom) instead of a data-dependent accepted subset.
* ``abc_smc`` — the adaptive tolerance-ladder SMC sampler (Del Moral,
  Doucet, Jasra 2012; move kernel after Beaumont et al. 2009): per
  generation, the tolerance drops to a quantile of the current
  distances, alive particles resample, and each particle takes
  ABC-MCMC moves (Gaussian perturbation scaled by twice the weighted
  particle variance, accepted on prior ratio x re-simulated hit). The
  whole ladder is ONE ``lax.scan`` — fixed shapes, no host round-trips,
  ~N parallel simulators per step on the accelerator.

Parameters ride the framework's column layout (``kernels.model_interface
.ColumnPacker``): a particle is a padded column, perturbation noise and
moment statistics are dense column-matrix ops, and the simulator is
re-entered through ``model.generate`` with the unpacked parameter
constraint — whose weight is exactly the parameter prior density, which
is what the MH correction needs.

Validation: exact — the Gaussian-model ABC posterior has a closed form
(prior x interval probability of the sufficient statistic), integrated
by quadrature in ``tests/inference/test_abc.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.gfi import GenerativeFunction
from ..generative.mask import Mask
from ..kernels.model_interface import ColumnPacker
from ..parallel.resampling import resample_particles


@Pytree.dataclass
class ABCRejectionResult(Pytree):
    """Vectorized-``Mask`` choices (flag = accepted), raw distances, and
    the acceptance rate."""

    choices: Any
    distances: Any
    accept_rate: Any


def abc_rejection(
    key: PRNGKey,
    model: GenerativeFunction,
    args: tuple,
    distance_fn: Callable[[Any], Any],
    *,
    n_samples: int,
    tolerance: float,
) -> ABCRejectionResult:
    """Simulate ``n_samples`` traces from the prior predictive and accept
    those whose ``distance_fn(trace)`` is within ``tolerance``.

    Fixed-shape: all ``n_samples`` choice maps come back, wrapped in one
    vectorized ``Mask`` whose flag marks acceptance — filter with
    ``result.choices.flag`` / ``unmask`` downstream.
    """
    return _abc_rejection_jit(
        key, model, args, distance_fn, n_samples, tolerance
    )


@functools.partial(
    jax.jit, static_argnames=("distance_fn", "n_samples")
)
def _abc_rejection_jit(key, model, args, distance_fn, n_samples, tolerance):
    def one(k):
        tr = model.simulate(k, args)
        return tr.get_choices(), distance_fn(tr)

    chms, d = jax.vmap(one)(jr.split(key, n_samples))
    accept = d <= tolerance
    return ABCRejectionResult(
        Mask(chms, accept), d, jnp.mean(accept.astype(jnp.float32))
    )


@Pytree.dataclass
class ABCSMCResult(Pytree):
    """Final parameter columns ``(D_pad, N)``, their distances, the
    realized tolerance ladder, per-generation MH acceptance, and the
    final tolerance."""

    params: Any
    distances: Any
    prior_scores: Any
    tolerance_history: Any
    move_accept_history: Any
    tolerance: Any


def abc_smc(
    key: PRNGKey,
    model: GenerativeFunction,
    args: tuple,
    distance_fn: Callable[[Any], Any],
    addresses: Sequence[Any],
    *,
    n_particles: int,
    n_generations: int,
    quantile: float = 0.5,
    mh_moves: int = 2,
    proposal_scale: float = 2.0,
    min_accept: float = 0.10,
    method: str = "systematic",
    packer: ColumnPacker | None = None,
) -> tuple[ABCSMCResult, ColumnPacker]:
    """Adaptive ABC-SMC over the parameter ``addresses`` of ``model``.

    Per generation: tolerance <- the ``quantile`` of current distances
    (clipped non-increasing), alive particles resample, then ``mh_moves``
    ABC-MCMC moves with a diagonal Gaussian proposal whose per-dimension
    variance is ``proposal_scale`` x the alive-particle variance
    (Beaumont et al. 2009's twice-the-empirical-variance kernel at the
    default). Returns the result and the ``ColumnPacker`` — unpack a
    particle with ``packer.unpack(result.params[:, j])``; pass the same
    packer back in on repeat calls to reuse the compiled program (it is
    a static jit key).
    """
    if packer is None:
        packer = ColumnPacker(model, None, args, list(addresses))
    res = _abc_smc_jit(
        key, model, args, distance_fn, packer,
        n_particles, n_generations, quantile, mh_moves, proposal_scale,
        min_accept, method,
    )
    return res, packer


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance_fn", "packer", "n_particles", "n_generations",
        "quantile", "mh_moves", "proposal_scale", "method",
    ),
)
def _abc_smc_jit(
    key, model, args, distance_fn, packer,
    n_particles, n_generations, quantile, mh_moves, proposal_scale,
    min_accept, method,
):
    d_pad, d_real = packer.padded_dim, packer.dim
    # perturbation mask: padding dimensions carry no parameter — freeze
    real = (jnp.arange(d_pad) < d_real).astype(jnp.float32)[:, None]

    def sim_one(k, q):
        """Re-simulate the model under the parameter column ``q``; the
        generate weight is the parameter prior log-density (the data
        addresses are unconstrained, so they contribute nothing)."""
        tr, w = model.generate(k, packer.unpack(q), args)
        return w, distance_fn(tr)

    def init_one(k):
        tr = model.simulate(k, args)
        q = packer.pack(tr.get_choices())
        return q, tr.get_score(), distance_fn(tr)

    k_init, k_gens = jr.split(key)
    q0, _, dist0 = jax.vmap(
        init_one, out_axes=(1, 0, 0)
    )(jr.split(k_init, n_particles))
    # prior scores of the initial columns (get_score is the full joint;
    # recompute the parameter-only prior through the same path MH uses)
    w0, _ = jax.vmap(sim_one, in_axes=(0, 1))(
        jr.split(jr.fold_in(k_init, 1), n_particles), q0
    )

    def generation(state, gk):
        q, prior_w, d, eps_prev, prev_acc = state
        k_res, k_mh = jr.split(gk)

        # 1. adaptive tolerance: the quantile of current distances, never
        #    increasing — and FROZEN while the move kernel's acceptance
        #    is below ``min_accept``: lowering the tolerance faster than
        #    the MH moves can mix collapses the population onto a few
        #    ancestors (measured: eps free-falls to ~0.003 with ~0%%
        #    acceptance and the variance estimate degenerates; the gate
        #    holds eps where moves still mix). Del Moral et al. 2012's
        #    acceptance-based stopping, as a per-generation gate.
        eps = jnp.where(
            prev_acc >= min_accept,
            jnp.minimum(jnp.quantile(d, quantile), eps_prev),
            eps_prev,
        )

        # 2. resample alive particles (indicator weights)
        log_w = jnp.where(d <= eps, 0.0, -jnp.inf)
        qT, prior_w, d = resample_particles(
            k_res, (q.T, prior_w, d), log_w, n_particles, method
        )
        q = qT.T

        # 3. proposal scale from the (resampled = alive) population
        var = jnp.var(q, axis=1, keepdims=True)
        sigma = jnp.sqrt(proposal_scale * var + 1e-12) * real

        # 4. ABC-MCMC moves
        def move(carry, mk):
            q, prior_w, d = carry
            k_prop, k_sim, k_acc = jr.split(mk, 3)
            q_prop = q + sigma * jr.normal(k_prop, q.shape)
            w_prop, d_prop = jax.vmap(sim_one, in_axes=(0, 1))(
                jr.split(k_sim, n_particles), q_prop
            )
            log_u = jnp.log(jr.uniform(k_acc, (n_particles,)))
            accept = (log_u < (w_prop - prior_w)) & (d_prop <= eps)
            q = jnp.where(accept[None, :], q_prop, q)
            prior_w = jnp.where(accept, w_prop, prior_w)
            d = jnp.where(accept, d_prop, d)
            return (q, prior_w, d), jnp.mean(accept.astype(jnp.float32))

        (q, prior_w, d), accs = lax.scan(
            move, (q, prior_w, d), jr.split(k_mh, mh_moves)
        )
        acc = jnp.mean(accs)
        return (q, prior_w, d, eps, acc), (eps, acc)

    init = (q0, w0, dist0, jnp.asarray(jnp.inf), jnp.asarray(1.0))
    (q, prior_w, d, eps, _), (eps_hist, acc_hist) = lax.scan(
        generation, init, jr.split(k_gens, n_generations)
    )
    return ABCSMCResult(q, d, prior_w, eps_hist, acc_hist, eps)


def column_weighted_moments(params, d_real: int):
    """Mean and variance over particles of the REAL (unpadded) parameter
    rows of an ABC-SMC column matrix — the post-run summary most tests
    and users want."""
    q = params[:d_real]
    return jnp.mean(q, axis=1), jnp.var(q, axis=1)
