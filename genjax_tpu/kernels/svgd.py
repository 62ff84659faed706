"""Stein variational gradient descent (Liu & Wang 2016) in the column
layout.

No reference counterpart (its variational layer is ADEV-gradient ELBO
maximization over parametric guides — `/root/reference/src/genjax/_src/
inference/vi.py`). SVGD is the non-parametric alternative: a set of
interacting particles deterministically flows along the kernelized Stein
discrepancy's steepest descent,

    φ(q_i) = (1/N) Σ_j [ k(q_j, q_i) ∇ log p(q_j) + ∇_{q_j} k(q_j, q_i) ],

so the empirical measure converges to the target without any sampling
noise — useful when a moderate number of high-quality representative
points beats many correlated MCMC draws.

TPU shape: particles are chains-on-lanes ``(D, N)``; one update is an
``(N, N)`` RBF Gram matrix plus two matmuls against it — MXU-resident —
and the gradient batch is one ``jax.vjp`` of the standard column
log-density, so sharded (``data_sharded_logdensity``) targets drop in.

Bandwidth heuristic cost: an exact ``jnp.median`` over the full N×N Gram
is an O(N² log N) sort per step that swamps the two MXU matmuls at
N=4096 (16.7M-element sort). The flow only needs a *scale*, so the
median is estimated from a k×N row slice of the distance matrix
(particles are exchangeable — any k rows are an unbiased sample of the
pairwise-distance distribution) and refreshed every ``bandwidth_every``
steps, holding it in the scan carry between refreshes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_sq_dists(qa, qb):
    """Squared distances between columns: (Na, Nb)."""
    d2 = (
        jnp.sum(qa**2, axis=0)[:, None]
        + jnp.sum(qb**2, axis=0)[None, :]
        - 2.0 * (qa.T @ qb)
    )
    return jnp.maximum(d2, 0.0)


def median_bandwidth(q, subsample: int | None = 64):
    """The Liu & Wang median heuristic ``h = med² / log(N + 1)``.

    With ``subsample=k`` the median is taken over the k×N distance slice
    against every ``N // k``-th particle column — an O(kN log kN) sort
    instead of O(N² log N²). ``subsample=None`` uses the exact full-Gram
    median."""
    n = q.shape[1]
    if subsample is None or subsample >= n:
        d2 = _pairwise_sq_dists(q, q)
        med2 = jnp.median(d2)
    else:
        stride = max(1, n // subsample)
        d2 = _pairwise_sq_dists(q[:, ::stride], q)
        med2 = jnp.median(d2)
    return med2 / jnp.log(jnp.asarray(n + 1.0)) + 1e-8


def rbf_kernel_and_grad(q, bandwidth=None, *, h=None):
    """RBF Gram matrix K(i, j) = exp(−‖q_i − q_j‖²/h) over particle
    COLUMNS plus the repulsion term Σ_j ∇_{q_j} k(q_j, q_i), with the
    median heuristic ``h = med² / log(N + 1)`` (Liu & Wang's released
    code) when neither ``bandwidth`` (a length scale, squared internally)
    nor ``h`` (the squared scale, used as-is) is given."""
    d2 = _pairwise_sq_dists(q, q)
    if h is None:
        if bandwidth is None:
            n = q.shape[1]
            h = jnp.median(d2) / jnp.log(jnp.asarray(n + 1.0)) + 1e-8
        else:
            h = jnp.asarray(bandwidth) ** 2
    K = jnp.exp(-d2 / h)
    # Σ_j ∇_{q_j} k(q_j, q_i) = (2/h) (q K − q @ diag(K 1))... columnwise:
    # grad_term[:, i] = (2/h) Σ_j K(j, i) (q_i − q_j)
    sum_k = jnp.sum(K, axis=0)  # (N,)
    grad_term = (2.0 / h) * (q * sum_k[None, :] - q @ K)
    return K, grad_term


def svgd(
    logdensity_cols: Callable,
    q0,
    *,
    n_steps: int,
    step_size: float = 0.1,
    bandwidth=None,
    adagrad: bool = True,
    alpha: float = 0.9,
    bandwidth_subsample: int | None = 64,
    bandwidth_every: int = 10,
):
    """Run SVGD from particle columns ``q0 (D, N)``. Deterministic — no
    PRNG key. Uses the AdaGrad-with-momentum step from the original paper
    when ``adagrad`` (robust default); plain gradient steps otherwise.

    ``bandwidth=None`` uses the median heuristic, estimated from a
    ``bandwidth_subsample``×N distance slice and refreshed every
    ``bandwidth_every`` steps (the kernel scale drifts slowly along the
    flow; refreshing every step re-sorts millions of distances for a
    near-identical answer). Pass ``bandwidth_subsample=None`` and
    ``bandwidth_every=1`` to recover the exact per-step heuristic, or an
    explicit ``bandwidth`` to pin the scale. Returns the final particles
    ``(D, N)``.
    """
    q0 = jnp.asarray(q0, jnp.float32)
    n = q0.shape[1]
    fixed_h = None if bandwidth is None else jnp.asarray(bandwidth) ** 2

    def phi(q, h):
        g = jax.grad(lambda qq: jnp.sum(logdensity_cols(qq)))(q)
        K, repulse = rbf_kernel_and_grad(q, h=h)
        return (g @ K + repulse) / n

    def step(carry, i):
        q, hist, h = carry
        if fixed_h is None:
            h = lax.cond(
                i % bandwidth_every == 0,
                lambda qq: median_bandwidth(qq, bandwidth_subsample),
                lambda _qq: h,
                q,
            )
        p = phi(q, h)
        if adagrad:
            hist = jnp.where(
                i == 0, p**2, alpha * hist + (1.0 - alpha) * p**2
            )
            q = q + step_size * p / (1e-6 + jnp.sqrt(hist))
        else:
            q = q + step_size * p
        return (q, hist, h), None

    h0 = jnp.asarray(1.0) if fixed_h is None else fixed_h
    (q, _, _), _ = lax.scan(
        step, (q0, jnp.zeros_like(q0), h0), jnp.arange(n_steps)
    )
    return q
