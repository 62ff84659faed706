"""ChEES-HMC: adaptive trajectory lengths for massively parallel chains.

Implements the ChEES criterion (Change in the Estimator of the Expected
Square — Hoffman & Sountsov, AISTATS 2021; see PAPERS.md) on the fused
``(D, N)`` column layout. No reference counterpart (the reference ships no
adaptation at all; SURVEY §5).

Why this beats NUTS in the many-chain regime this framework targets:
trajectory length is ONE shared parameter adapted from cross-chain
statistics, so every chain runs the same jittered number of leapfrogs per
sweep — no per-lane tree bookkeeping, no doubling overshoot (NUTS wastes
~2x leapfrogs building the rejected half of its last doubling), no masked
lanes waiting for stragglers. Each sweep costs exactly ``L`` gradient
evaluations at full lane occupancy, plus one Adam update on the log
trajectory length.

The adaptation loop per sweep ``m``:

1. jitter: ``tau_m = h_m * t`` with ``h_m`` the base-2 van der Corput
   (Halton) sequence, SHARED across chains (fixed shapes, quasi-random
   coverage of [0, t]);
2. integrate ``L = clip(ceil(tau_m / eps), 1, max_leapfrogs)`` leapfrog
   steps carrying ``(logp, grad)`` (one fwd+bwd per step);
3. per-chain MH accept; NaN trajectories count as rejections;
4. ChEES gradient in trajectory time, centered on cross-chain means:
   ``g = E_alpha[ (|q'-m'|^2 - |q-m|^2) * <q'-m', v'> ] * h_m`` with
   ``v' = M^{-1} p'`` the final velocity — ascend ``log t`` with Adam;
5. dual-averaging on the step size toward the optimal-acceptance 0.651;
   diagonal inverse mass from cross-chain variance (the massive-chain
   estimator used across this framework, kernels/adaptation.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core.pytree import Pytree
from .adaptation import (
    StepSizeAdaptState,
    _halton2,
    cross_chain_inv_mass,
    dual_averaging_update,
)


@Pytree.dataclass
class ChEESInfo(Pytree):
    """Adapted settings + sweep statistics. ``draws`` is ``None`` unless
    ``collect`` was requested: then ``(n_steps, D, N)`` thinned positions."""

    eps: Any
    trajectory_length: Any
    accept_rate: Any
    mean_leapfrogs: Any
    divergence_rate: Any
    inv_mass: Any
    draws: Any


def chees_hmc(
    logdensity_cols,
    q0,
    seed,
    *,
    n_warmup: int = 300,
    n_steps: int = 200,
    eps0: float = 0.05,
    t0: float = 1.0,
    target_accept: float = 0.651,
    max_leapfrogs: int = 1000,
    adam_lr: float = 0.025,
    inv_mass: Any | None = None,
    adapt_mass: bool = True,
    rng_impl: str = "rbg",
    collect: bool = False,
):
    """Run ChEES-adaptive HMC on ``N`` column-layout chains.

    Args:
        logdensity_cols: batched log-density ``(D, N) -> (N,)``.
        q0: initial positions ``(D, N)`` float32.
        seed: an int (a fresh ``jax.random.key(seed, impl=rng_impl)`` is
            derived) or a PRNG key array used directly.
        n_warmup: adaptation sweeps (eps + trajectory length + mass).
        n_steps: sampling sweeps at the adapted settings (jitter stays on).
        collect: record every sampling sweep's positions in ``info.draws``.

    Returns ``(q_final, ChEESInfo)``.
    """
    d, n = q0.shape
    q0 = q0.astype(jnp.float32)
    if inv_mass is None:
        inv_mass0 = jnp.ones((d,), jnp.float32)
    else:
        inv_mass0 = jnp.reshape(jnp.asarray(inv_mass, jnp.float32), (d,))

    def lp_g(q):
        lp, pullback = jax.vjp(logdensity_cols, q)
        (g,) = pullback(jnp.ones_like(lp))
        return lp, g

    def sweep(q, lp, g, key, step_idx, eps, log_t, inv_mass):
        im_col = inv_mass[:, None]
        mom_std = 1.0 / jnp.sqrt(im_col)
        kp, ku = jr.split(key)
        p = mom_std * jr.normal(kp, (d, n))

        def kinetic(p_):
            return 0.5 * jnp.sum(im_col * p_ * p_, axis=0)

        h = _halton2(step_idx)
        tau = h * jnp.exp(log_t)
        L = jnp.clip(
            jnp.ceil(tau / eps).astype(jnp.int32), 1, max_leapfrogs
        )

        def leap(_, c):
            q_, p_, g_, lp_ = c
            p_ = p_ + (eps / 2.0) * g_
            q_ = q_ + eps * im_col * p_
            lp_, g_ = lp_g(q_)
            p_ = p_ + (eps / 2.0) * g_
            return (q_, p_, g_, lp_)

        q1, p1, g1, lp1 = lax.fori_loop(0, L, leap, (q, p, g, lp))
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

        # ChEES gradient in trajectory time (centered cross-chain).
        # Divergent proposals (inf/NaN positions from an exploratory eps)
        # must not poison the cross-chain MEANS — one bad lane would NaN
        # the statistic for every chain; replace them by the current
        # position (their alpha is 0, so they contribute nothing).
        finite_pos = jnp.all(jnp.isfinite(q1), axis=0)
        # -inf density at a FINITE position is an ordinary out-of-support
        # rejection; "diverged" means the integrator blew up (NUTS
        # convention elsewhere in this package)
        diverged = ~finite_pos | jnp.isnan(lp1)
        ok = ~diverged
        q1s = jnp.where(ok[None, :], q1, q)
        p1s = jnp.where(ok[None, :], p1, jnp.zeros_like(p1))
        qm = jnp.mean(q, axis=1, keepdims=True)
        qm1 = jnp.mean(q1s, axis=1, keepdims=True)
        dsq0 = jnp.sum((q - qm) ** 2, axis=0)
        dsq1 = jnp.sum((q1s - qm1) ** 2, axis=0)
        v1 = im_col * p1s  # dq/dtime at the endpoint
        proj = jnp.sum((q1s - qm1) * v1, axis=0)
        per_chain = (dsq1 - dsq0) * proj
        contrib = jnp.where(
            jnp.isfinite(per_chain), alpha * per_chain, 0.0
        )
        w_sum = jnp.sum(alpha) + 1e-12
        grad_tau = jnp.sum(contrib) / w_sum
        # d/d log t  =  dChEES/dtau * dtau/dt * t  =  grad_tau * h * t
        grad_logt = grad_tau * tau
        grad_logt = jnp.where(jnp.isfinite(grad_logt), grad_logt, 0.0)
        div = jnp.mean(diverged.astype(jnp.float32))
        return qn, lpn, gn, alpha, grad_logt, L, div

    def adam(mv, grad, step):
        m, v = mv
        b1, b2 = 0.9, 0.95
        m = b1 * m + (1.0 - b1) * grad
        v = b2 * v + (1.0 - b2) * grad * grad
        s = step.astype(jnp.float32) + 1.0
        mhat = m / (1.0 - b1**s)
        vhat = v / (1.0 - b2**s)
        return (m, v), mhat / (jnp.sqrt(vhat) + 1e-8)

    # log-trajectory-length bounds: at least one step, at most the budget
    def clamp_logt(log_t, eps):
        return jnp.clip(
            log_t,
            jnp.log(eps),
            jnp.log(eps * max_leapfrogs),
        )

    if hasattr(seed, "dtype") and jnp.issubdtype(
        jnp.asarray(seed).dtype, jax.dtypes.prng_key
    ):
        root = seed
    else:
        root = jr.key(seed, impl=rng_impl)
    lp_init, g_init = lp_g(q0)

    def warm_step(carry, inp):
        q, lp, g, adapt, log_t, mv, inv_mass = carry
        step_idx, key = inp
        eps = jnp.exp(adapt.log_eps)
        q, lp, g, alpha, grad_logt, L, _div = sweep(
            q, lp, g, key, step_idx, eps, log_t, inv_mass
        )
        mv, update = adam(mv, grad_logt, adapt.step)
        log_t = clamp_logt(log_t + adam_lr * update, eps)
        adapt = dual_averaging_update(
            adapt, jnp.mean(alpha), target_accept=target_accept
        )
        if adapt_mass:
            inv_mass = cross_chain_inv_mass(q, chain_axis=1)
        return (q, lp, g, adapt, log_t, mv, inv_mass), (
            jnp.mean(alpha),
            L,
        )

    adapt0 = StepSizeAdaptState.init(eps0)
    log_t0 = jnp.log(jnp.asarray(t0, jnp.float32))
    mv0 = (jnp.asarray(0.0), jnp.asarray(0.0))
    if n_warmup > 0:
        wkeys = jr.split(jr.fold_in(root, 1), n_warmup)
        (q, lp, g, adapt, log_t, _mv, inv_mass_f), _ = lax.scan(
            warm_step,
            (q0, lp_init, g_init, adapt0, log_t0, mv0, inv_mass0),
            (jnp.arange(n_warmup), wkeys),
        )
        eps_f = jnp.exp(adapt.log_eps_bar)
        log_t = clamp_logt(log_t, eps_f)
    else:
        # adaptation disabled: run at the caller's settings verbatim
        q, lp, g = q0, lp_init, g_init
        eps_f = jnp.asarray(eps0, jnp.float32)
        log_t = log_t0
        inv_mass_f = inv_mass0

    def sample_step(carry, inp):
        q, lp, g = carry
        step_idx, key = inp
        q, lp, g, alpha, _gl, L, div = sweep(
            q, lp, g, key, step_idx, eps_f, log_t, inv_mass_f
        )
        out = q if collect else None
        return (q, lp, g), (jnp.mean(alpha), L, div, out)

    skeys = jr.split(jr.fold_in(root, 2), n_steps)
    (q, lp, g), (accs, Ls, divs, draws) = lax.scan(
        sample_step,
        (q, lp, g),
        (jnp.arange(n_warmup, n_warmup + n_steps), skeys),
    )
    info = ChEESInfo(
        eps=eps_f,
        trajectory_length=jnp.exp(log_t),
        accept_rate=jnp.mean(accs),
        mean_leapfrogs=jnp.mean(Ls.astype(jnp.float32)),
        divergence_rate=jnp.mean(divs),
        inv_mass=inv_mass_f,
        draws=draws,
    )
    return q, info
