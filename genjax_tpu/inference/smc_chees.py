"""ChEES-adaptive tempered SMC in the column layout.

Implements the SMC-sampler adaptation of the ChEES criterion
(Bon & Drovandi-line of work retrieved in PAPERS.md, "Incorporating the
ChEES Criterion into Sequential Monte Carlo Samplers", arXiv:2504.02627):
a tempered SMC sampler whose HMC rejuvenation kernel tunes itself from
the particle population at every rung —

* **temperature ladder**: on-line CESS bisection (Zhou, Johansen & Aston
  2016), as in ``inference.tempered.adaptive_tempered_smc``;
* **step size**: dual averaging on the population mean acceptance
  (``inference.adaptation``, shared with every other adaptive kernel);
* **trajectory length**: Adam ascent on the ChEES gradient estimated
  from the whole population's proposal endpoints (``kernels.chees``'s
  estimator, here fed by N particles instead of N chains) with
  Halton-jittered trajectory times;
* **mass matrix**: diagonal inverse mass from the cross-particle
  variance — at low β that is the prior scale, which IS the right metric
  for the current tempered target, so the metric anneals with the
  ladder for free.

This composes the two halves the framework already trusts: the tempered
evidence path is validated against closed forms in ``test_tempered.py``,
the ChEES machinery against posterior laws in ``test_chees.py``; the
tests here re-validate the composition against exact Gaussian evidence
and moments.

Why column-layout (``(D, N)`` positions, particles on lanes) rather than
the trace-based driver in ``inference/tempered.py``: the ChEES gradient
needs proposal endpoints and final momenta of every particle, which the
``EditRequest`` interface deliberately hides; at the column level the
sweep is the plain integrator and the whole ladder stays one
``lax.scan``. Use :func:`column_tempered_chees` to run ``@gen`` models
here through the standard packer bridge.

No reference counterpart (reference SMC is single-shard vmap,
`/root/reference/src/genjax/_src/inference/smc.py:298`; it ships no
adaptation at all, SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.scipy.special import logsumexp

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..kernels.adaptation import (
    StepSizeAdaptState,
    _halton2,
    cross_chain_inv_mass,
    dual_averaging_update,
)
from ..parallel.resampling import (
    effective_sample_size,
    resample_particles,
)


@Pytree.dataclass
class ChEESTemperedResult(Pytree):
    """Final particle columns ``(D, N)`` + evidence estimate + the full
    adaptation record. Idle tail entries of the histories (after β hits
    1) are zero; mask by ``n_rungs``."""

    particles: Any
    log_weights: Any
    log_marginal: Any
    beta_history: Any
    final_beta: Any
    n_rungs: Any
    ess_history: Any
    accept_history: Any
    eps_history: Any
    trajectory_history: Any
    leapfrog_history: Any


def chees_tempered_smc(
    key: PRNGKey,
    log_prior_cols: Callable[[Any], Any],
    log_lik_cols: Callable[[Any], Any],
    q0,
    *,
    cess_target: float = 0.9,
    max_rungs: int = 64,
    n_bisect: int = 30,
    ess_threshold: float = 0.5,
    n_rejuvenation: int = 2,
    eps0: float = 0.1,
    t0: float = 1.0,
    target_accept: float = 0.651,
    max_leapfrogs: int = 256,
    adam_lr: float = 0.025,
    adapt_mass: bool = True,
    method: str = "systematic",
) -> ChEESTemperedResult:
    """Anneal ``N`` column particles from ``log_prior_cols`` draws to the
    posterior ``prior·lik`` with a self-tuning HMC rejuvenation kernel.

    Args:
        log_prior_cols / log_lik_cols: batched column densities
            ``(D, N) -> (N,)`` in plain jnp (``jax.vjp`` must work).
        q0: ``(D, N)`` float32 — draws from the PRIOR (β = 0 population).

    Returns a :class:`ChEESTemperedResult`; ``final_beta < 1`` means the
    ladder exhausted ``max_rungs`` (raise it or lower ``cess_target``).
    """
    if not 0.0 < cess_target < 1.0:
        raise ValueError(
            f"cess_target must be in (0, 1), got {cess_target}"
        )
    d, n = q0.shape
    q0 = q0.astype(jnp.float32)

    def cess(log_w, llhs, delta):
        logW = log_w - logsumexp(log_w)
        lu = delta * llhs
        num = 2.0 * logsumexp(logW + lu)
        den = logsumexp(logW + 2.0 * lu)
        return n * jnp.exp(num - den)

    def choose_delta(log_w, llhs, beta):
        hi0 = 1.0 - beta
        target = cess_target * n

        def body(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            too_big = cess(log_w, llhs, mid) < target
            return jnp.where(too_big, lo, mid), jnp.where(too_big, mid, hi)

        full = cess(log_w, llhs, hi0) >= target
        lo, hi = lax.fori_loop(0, n_bisect, body, (jnp.asarray(0.0), hi0))
        return jnp.where(full, hi0, lo)

    def lp_g(q, beta):
        """Tempered log-density (prior + β·lik) and gradient, one
        fwd+bwd; also returns the likelihood separately (carried for the
        next rung's reweighting)."""

        def both(qq):
            lik = log_lik_cols(qq)
            return log_prior_cols(qq) + beta * lik, lik

        (lp, lik), pullback = jax.vjp(both, q)
        (g,) = pullback((jnp.ones_like(lp), jnp.zeros_like(lik)))
        return lp, g, lik

    def sweep(q, lp, g, lik, key, step_idx, beta, eps, log_t, inv_mass):
        """One jittered-trajectory HMC sweep on the tempered target; the
        integrator/accept/ChEES-gradient block is ``kernels.chees``'s,
        driven by the particle population."""
        im_col = inv_mass[:, None]
        mom_std = 1.0 / jnp.sqrt(im_col)
        kp, ku = jr.split(key)
        p = mom_std * jr.normal(kp, (d, n))

        def kinetic(p_):
            return 0.5 * jnp.sum(im_col * p_ * p_, axis=0)

        h = _halton2(step_idx)
        tau = h * jnp.exp(log_t)
        L = jnp.clip(jnp.ceil(tau / eps).astype(jnp.int32), 1, max_leapfrogs)

        def leap(_, c):
            q_, p_, g_, lp_, lik_ = c
            p_ = p_ + (eps / 2.0) * g_
            q_ = q_ + eps * im_col * p_
            lp_, g_, lik_ = lp_g(q_, beta)
            p_ = p_ + (eps / 2.0) * g_
            return (q_, p_, g_, lp_, lik_)

        q1, p1, g1, lp1, lik1 = lax.fori_loop(
            0, L, leap, (q, p, g, lp, lik)
        )
        log_alpha = (lp1 - kinetic(p1)) - (lp - kinetic(p))
        alpha = jnp.where(
            jnp.isnan(log_alpha),
            0.0,
            jnp.minimum(1.0, jnp.exp(jnp.minimum(log_alpha, 0.0))),
        )
        accept = (jnp.log(jr.uniform(ku, (n,))) < log_alpha) & jnp.all(
            jnp.isfinite(q1), axis=0
        )
        qn = jnp.where(accept[None, :], q1, q)
        lpn = jnp.where(accept, lp1, lp)
        gn = jnp.where(accept[None, :], g1, g)
        likn = jnp.where(accept, lik1, lik)

        # ChEES gradient (see kernels/chees.py for the derivation and the
        # divergence-guard rationale)
        finite_pos = jnp.all(jnp.isfinite(q1), axis=0)
        ok = finite_pos & ~jnp.isnan(lp1)
        q1s = jnp.where(ok[None, :], q1, q)
        p1s = jnp.where(ok[None, :], p1, jnp.zeros_like(p1))
        qm = jnp.mean(q, axis=1, keepdims=True)
        qm1 = jnp.mean(q1s, axis=1, keepdims=True)
        dsq0 = jnp.sum((q - qm) ** 2, axis=0)
        dsq1 = jnp.sum((q1s - qm1) ** 2, axis=0)
        v1 = im_col * p1s
        proj = jnp.sum((q1s - qm1) * v1, axis=0)
        per_chain = (dsq1 - dsq0) * proj
        contrib = jnp.where(jnp.isfinite(per_chain), alpha * per_chain, 0.0)
        grad_logt = jnp.sum(contrib) / (jnp.sum(alpha) + 1e-12) * tau
        grad_logt = jnp.where(jnp.isfinite(grad_logt), grad_logt, 0.0)
        return qn, lpn, gn, likn, jnp.mean(alpha), grad_logt, L

    def adam(mv, grad, step):
        m, v = mv
        b1, b2 = 0.9, 0.95
        m = b1 * m + (1.0 - b1) * grad
        v = b2 * v + (1.0 - b2) * grad * grad
        s = step.astype(jnp.float32) + 1.0
        mhat = m / (1.0 - b1**s)
        vhat = v / (1.0 - b2**s)
        return (m, v), mhat / (jnp.sqrt(vhat) + 1e-8)

    def clamp_logt(log_t, eps):
        return jnp.clip(log_t, jnp.log(eps), jnp.log(eps * max_leapfrogs))

    init_key, ladder_key = jr.split(jnp.asarray(key))
    lik0 = log_lik_cols(q0)

    def rung(state, t):
        (q, lik, log_w, log_z, beta, done,
         adapt, log_t, mv, inv_mass) = state
        rung_key = jr.fold_in(ladder_key, t)

        def active(operand):
            (q, lik, log_w, log_z, beta, _done,
             adapt, log_t, mv, inv_mass) = operand
            delta = choose_delta(log_w, lik, beta)
            beta_new = jnp.minimum(beta + delta, 1.0)
            log_w = log_w + delta * lik
            ess = effective_sample_size(log_w)

            def do_resample(args):
                q, lik, log_w, log_z = args
                inc = logsumexp(log_w) - jnp.log(n)
                qT, lik = resample_particles(
                    jr.fold_in(rung_key, 1), (q.T, lik), log_w, n, method
                )
                return qT.T, lik, jnp.zeros((n,)), log_z + inc

            q, lik, log_w, log_z = lax.cond(
                ess < ess_threshold * n,
                do_resample,
                lambda a: a,
                (q, lik, log_w, log_z),
            )

            # --- ChEES-HMC rejuvenation at beta_new -------------------
            lp, g, lik = lp_g(q, beta_new)

            def rejuv(carry, j):
                q, lp, g, lik, adapt, log_t, mv = carry
                eps = jnp.exp(adapt.log_eps)
                q, lp, g, lik, alpha, grad_logt, L = sweep(
                    q, lp, g, lik,
                    jr.fold_in(jr.fold_in(rung_key, 2), j),
                    t * n_rejuvenation + j,
                    beta_new, eps, log_t, inv_mass,
                )
                mv, update = adam(mv, grad_logt, adapt.step)
                log_t = clamp_logt(log_t + adam_lr * update, eps)
                adapt = dual_averaging_update(
                    adapt, alpha, target_accept=target_accept
                )
                return (q, lp, g, lik, adapt, log_t, mv), (alpha, L)

            (q, lp, g, lik, adapt, log_t, mv), (alphas, Ls) = lax.scan(
                rejuv,
                (q, lp, g, lik, adapt, log_t, mv),
                jnp.arange(n_rejuvenation),
            )
            if adapt_mass:
                inv_mass = cross_chain_inv_mass(q, chain_axis=1)
            return (
                (q, lik, log_w, log_z, beta_new, beta_new >= 1.0,
                 adapt, log_t, mv, inv_mass),
                (beta_new, ess, jnp.mean(alphas),
                 jnp.exp(adapt.log_eps), jnp.exp(log_t),
                 jnp.mean(Ls.astype(jnp.float32)), jnp.asarray(1.0)),
            )

        def idle(operand):
            beta = operand[4]
            zero = jnp.asarray(0.0)
            return operand, (beta, zero, zero, zero, zero, zero, zero)

        return lax.cond(done, idle, active, state)

    init_state = (
        q0, lik0, jnp.zeros((n,)), jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(False),
        StepSizeAdaptState.init(eps0),
        jnp.log(jnp.asarray(t0, jnp.float32)),
        (jnp.asarray(0.0), jnp.asarray(0.0)),
        jnp.ones((d,), jnp.float32),
    )
    (q, lik, log_w, log_z, final_beta, _done, *_), (
        beta_hist, ess_hist, acc_hist, eps_hist, t_hist, L_hist, active_hist
    ) = lax.scan(rung, init_state, jnp.arange(max_rungs))
    log_marginal = log_z + logsumexp(log_w) - jnp.log(n)
    return ChEESTemperedResult(
        particles=q,
        log_weights=log_w,
        log_marginal=log_marginal,
        beta_history=beta_hist,
        final_beta=final_beta,
        n_rungs=jnp.sum(active_hist),
        ess_history=ess_hist,
        accept_history=acc_hist,
        eps_history=eps_hist,
        trajectory_history=t_hist,
        leapfrog_history=L_hist,
    )


def column_tempered_chees(
    model,
    constraint,
    args: tuple,
    addresses,
    key: PRNGKey,
    n_particles: int,
    **kwargs,
):
    """Run a ``@gen`` model through :func:`chees_tempered_smc` via the
    standard column bridge.

    The tempered factorization comes from the GFI itself: the prior
    column density is the ``generate`` weight under the parameter
    constraint alone (the unconstrained data addresses contribute
    nothing), and the likelihood is the joint (``column_logdensity``)
    minus that prior — the tile-padding N(0,1) factor lives in the
    PRIOR, so padding dimensions stay well-defined at every β and cancel
    exactly from the likelihood (and hence from the evidence).

    Returns ``(result, packer)``.
    """
    from ..kernels.model_interface import ColumnPacker, column_logdensity

    packer = ColumnPacker(model, constraint, args, list(addresses))
    joint_cols = column_logdensity(model, constraint, args, packer)
    n_pad = packer.padded_dim - packer.dim

    def prior_one(q):
        _, w = model.generate(jr.key(0), packer.unpack(q), args)
        if n_pad:
            w = w - 0.5 * jnp.sum(q[packer.dim:] ** 2)
        return w

    prior_cols = jax.vmap(prior_one, in_axes=1)

    def lik_cols(q):
        return joint_cols(q) - prior_cols(q)

    k_init, k_run = jr.split(jnp.asarray(key))

    def init_one(kk):
        tr = model.simulate(kk, args)
        return packer.pack(tr.get_choices())

    q0 = jax.vmap(init_one, out_axes=1)(jr.split(k_init, n_particles))
    # pad dims of prior draws: standard normal, matching the prior factor
    if n_pad:
        pad_noise = jr.normal(jr.fold_in(k_init, 1), (n_pad, n_particles))
        q0 = q0.at[packer.dim:].set(pad_noise)
    res = chees_tempered_smc(
        k_run, prior_cols, lik_cols, q0, **kwargs
    )
    return res, packer
