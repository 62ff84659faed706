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
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def rbf_kernel_and_grad(q, bandwidth=None):
    """RBF Gram matrix K(i, j) = exp(−‖q_i − q_j‖²/h) over particle
    COLUMNS plus the repulsion term Σ_j ∇_{q_j} k(q_j, q_i), with the
    median heuristic ``h = med² / log(N + 1)`` (Liu & Wang's released
    code) when ``bandwidth`` is None."""
    d2 = (
        jnp.sum(q**2, axis=0)[:, None]
        + jnp.sum(q**2, axis=0)[None, :]
        - 2.0 * (q.T @ q)
    )
    d2 = jnp.maximum(d2, 0.0)
    n = q.shape[1]
    if bandwidth is None:
        med2 = jnp.median(d2)
        h = med2 / jnp.log(jnp.asarray(n + 1.0)) + 1e-8
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
):
    """Run SVGD from particle columns ``q0 (D, N)``. Deterministic — no
    PRNG key. Uses the AdaGrad-with-momentum step from the original paper
    when ``adagrad`` (robust default); plain gradient steps otherwise.
    Returns the final particles ``(D, N)``.
    """
    q0 = jnp.asarray(q0, jnp.float32)
    n = q0.shape[1]

    def phi(q):
        g = jax.grad(lambda qq: jnp.sum(logdensity_cols(qq)))(q)
        K, repulse = rbf_kernel_and_grad(q, bandwidth)
        return (g @ K + repulse) / n

    def step(carry, i):
        q, hist = carry
        p = phi(q)
        if adagrad:
            hist = jnp.where(
                i == 0, p**2, alpha * hist + (1.0 - alpha) * p**2
            )
            q = q + step_size * p / (1e-6 + jnp.sqrt(hist))
        else:
            q = q + step_size * p
        return (q, hist), None

    (q, _), _ = lax.scan(
        step, (q0, jnp.zeros_like(q0)), jnp.arange(n_steps)
    )
    return q
