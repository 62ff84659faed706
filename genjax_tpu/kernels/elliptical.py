"""Elliptical slice sampling (Murray, Adams & MacKay 2010) in the column
layout — the tuning-free exact sampler for latent-Gaussian models.

No reference counterpart (the reference's only gradient-free move is
prior-proposal `Regenerate` MH — `/root/reference/src/genjax/_src/core/
generative/requests.py:64` — which mixes arbitrarily slowly when the
likelihood is informative). ESS targets

    p(f) ∝ N(f; mu, Sigma) · L(f)

with NO step size, NO trajectory length, and acceptance probability 1:
each transition draws an auxiliary ellipse through the current state and a
prior sample, then shrinks an angle bracket until the likelihood threshold
is met. It is the standard production sampler for GP latents
(`models/gp.py` provides the Gram/Cholesky machinery).

TPU batching: positions are chains-on-lanes ``(D, N)``. All chains run the
shrink loop in ONE ``lax.while_loop`` with a per-chain done mask — finished
chains idle (their state is frozen by ``jnp.where``) until the slowest
chain accepts. The expected iteration count is small and dimension-free
(geometric with rate ≈ the slice fraction), so lock-step masking wastes
little; the loop body is a likelihood evaluation, which is where the FLOPs
are anyway.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import jax.random as jr
from jax import lax

_TWO_PI = 6.283185307179586


def ess_transition_cols(
    log_lik_cols: Callable,
    q,
    key,
    *,
    chol_prior,
    mean=0.0,
    max_iters: int = 64,
):
    """One elliptical-slice transition for every chain column.

    Args:
        log_lik_cols: ``(D, N) -> (N,)`` log-likelihood (NOT including the
            Gaussian prior — the prior is sampled exactly on the ellipse).
        q: ``(D, N)`` current positions.
        chol_prior: ``(D, D)`` lower Cholesky factor of the prior
            covariance (or a ``(D,)``/scalar standard deviation for a
            diagonal prior).
        mean: prior mean — scalar, ``(D,)``, or ``(D, 1)``.
        max_iters: hard cap on shrink iterations (a safety net — the
            shrink loop terminates with probability 1; at the cap the
            current point is kept, an exact no-op move).

    Returns ``(q_new, n_iters)`` with ``n_iters`` the ``(N,)`` per-chain
    shrink-iteration counts (diagnostic; 0 = first proposal accepted).
    """
    d, n = q.shape
    mean = jnp.asarray(mean, q.dtype)
    if mean.ndim == 1:
        mean = mean.reshape(-1, 1)
    mean = jnp.broadcast_to(mean, (d, 1))
    k_nu, k_u, k_theta = jr.split(key, 3)
    z = jr.normal(k_nu, (d, n), q.dtype)
    chol_prior = jnp.asarray(chol_prior, q.dtype)
    if chol_prior.ndim == 2:
        nu = chol_prior @ z
    else:
        nu = chol_prior.reshape(-1, 1) * z if chol_prior.ndim == 1 else chol_prior * z

    log_y = log_lik_cols(q) + jnp.log(jr.uniform(k_u, (n,), q.dtype))
    theta0 = jr.uniform(k_theta, (n,), q.dtype) * _TWO_PI
    lo0, hi0 = theta0 - _TWO_PI, theta0

    centered = q - mean

    def proposal(theta):
        return mean + centered * jnp.cos(theta) + nu * jnp.sin(theta)

    q1 = proposal(theta0)
    done0 = log_lik_cols(q1) > log_y

    def cond(state):
        i, _, _, _, _, done, _counts = state
        return jnp.logical_and(i < max_iters, ~jnp.all(done))

    def body(state):
        i, qc, lo, hi, theta, done, counts = state
        # shrink the bracket toward 0 on the rejected side
        lo = jnp.where(jnp.logical_or(done, theta >= 0), lo, theta)
        hi = jnp.where(jnp.logical_or(done, theta >= 0), theta, hi)
        k = jr.fold_in(k_theta, i + 1)
        theta_new = lo + (hi - lo) * jr.uniform(k, (n,), q.dtype)
        theta = jnp.where(done, theta, theta_new)
        q_prop = proposal(theta)
        ok = log_lik_cols(q_prop) > log_y
        accept_now = jnp.logical_and(~done, ok)
        qc = jnp.where(accept_now[None, :], q_prop, qc)
        counts = counts + jnp.asarray(~done, counts.dtype)
        return i + 1, qc, lo, hi, theta, jnp.logical_or(done, ok), counts

    counts0 = jnp.zeros((n,), jnp.int32)
    _, q_new, _, _, _, done, n_iters = lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0),
            jnp.where(done0[None, :], q1, q),
            lo0,
            hi0,
            theta0,
            done0,
            counts0,
        ),
    )
    # chains that hit the cap keep their current point (exact no-op)
    q_new = jnp.where(done[None, :], q_new, q)
    return q_new, n_iters


def ess_sweep_cols(
    log_lik_cols: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    chol_prior,
    mean=0.0,
    max_iters: int = 64,
    collect: bool = False,
):
    """``n_steps`` elliptical-slice transitions in one ``lax.scan``.
    Returns ``(q_final, draws)`` with ``draws`` of shape
    ``(n_steps, D, N)`` when ``collect`` else ``None``."""
    q0 = jnp.asarray(q0, jnp.float32)
    root = jr.key(seed ^ 0xE5517)

    def step(q, i):
        q, _ = ess_transition_cols(
            log_lik_cols,
            q,
            jr.fold_in(root, i),
            chol_prior=chol_prior,
            mean=mean,
            max_iters=max_iters,
        )
        return q, (q if collect else None)

    q, draws = lax.scan(step, q0, jnp.arange(n_steps))
    return q, draws
