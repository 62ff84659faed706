"""Stochastic-gradient MCMC in the column layout: SGLD, pSGLD, SGHMC.

No reference counterpart (the reference has no big-data story; its MCMC is
exact-gradient HMC over full traces — `/root/reference/src/genjax/_src/
inference/requests/hmc.py`). These samplers are the standard large-scale
production family (Welling & Teh 2011; Li et al. 2016 pSGLD; Chen et al.
2014 SGHMC): each step uses an unbiased minibatch gradient of the log
posterior, so cost per step is O(batch) instead of O(dataset).

Layout and contract match the other column kernels (`kernels/hmc.py`):
positions are chains-on-lanes ``(D, N)`` float32, the whole sweep is one
``lax.scan`` (no host round trips), and gradient functions are plain jnp so
they compose with ``parallel.data.data_sharded_logdensity`` (exact sharded
full-batch gradients) or :func:`minibatch_grad_cols` (per-step subsampled
gradients — the stochastic-gradient path proper).

Bias note (documented, by design): constant-step SGLD/SGHMC sample a
perturbation of the posterior with O(eps) bias (no MH correction — that is
what removes the O(dataset) per-step cost). Tests validate against the
EXACT closed-form stationary distribution of the full-batch (ULA) chain on
Gaussian targets, where the discretization bias has a known closed form.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
from jax import lax


def minibatch_grad_cols(
    log_prior: Callable,
    log_lik: Callable,
    data: Any,
    batch_size: int,
    *,
    n_total: int | None = None,
) -> Callable:
    """Build an unbiased stochastic gradient estimator in column layout.

    Returns ``grad_fn(q (D, N), key) -> (D, N)`` estimating
    ``∇_q [log_prior(q) + Σ_i log_lik(q, x_i)]`` from ``batch_size`` rows
    drawn uniformly with replacement each call, the likelihood gradient
    scaled by ``n_total / batch_size``. ``log_prior``/``log_lik`` follow the
    `parallel.data` contract: ``log_prior(q) -> (N,)``,
    ``log_lik(q, data_rows) -> (N,)`` summed over the rows given.
    """
    leaves = jtu.tree_leaves(data)
    m = leaves[0].shape[0]
    if n_total is None:
        n_total = m
    scale = n_total / batch_size

    def grad_fn(q, key):
        idx = jr.randint(key, (batch_size,), 0, m)
        batch = jtu.tree_map(lambda x: x[idx], data)

        def obj(qq):
            return jnp.sum(log_prior(qq) + scale * log_lik(qq, batch))

        return jax.grad(obj)(q)

    return grad_fn


def full_grad_cols(logdensity_cols: Callable) -> Callable:
    """Exact-gradient adapter: wrap a column log-density ``(D, N) -> (N,)``
    (e.g. from ``column_logdensity`` or ``data_sharded_logdensity``) as a
    ``grad_fn(q, key)`` that ignores the key — SGLD with this becomes ULA,
    SGHMC becomes underdamped Langevin."""

    def grad_fn(q, key):
        return jax.grad(lambda qq: jnp.sum(logdensity_cols(qq)))(q)

    return grad_fn


def sgld_sweep_cols(
    grad_fn: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    eps: float,
    collect: bool = False,
    precondition: bool = False,
    rms_alpha: float = 0.99,
    rms_lambda: float = 1e-5,
):
    """SGLD sweep: ``q ← q + (eps/2)·G·ĝ(q) + N(0, eps·G)`` for ``n_steps``.

    With ``precondition=True`` this is pSGLD (Li et al. 2016): ``G`` is the
    RMSprop diagonal ``1/(λ + sqrt(v̂))`` maintained from the stochastic
    gradients (the Γ correction term is omitted, standard practice — it is
    O(eps) like the discretization bias). Returns ``(q_final, draws)`` where
    ``draws`` is ``(n_steps, D, N)`` if ``collect`` else ``None``.
    """
    q0 = jnp.asarray(q0, jnp.float32)
    root = jr.key(seed)
    v0 = jnp.ones_like(q0)

    def step(carry, i):
        q, v = carry
        k = jr.fold_in(root, i)
        k_grad, k_noise = jr.split(k)
        g = grad_fn(q, k_grad)
        if precondition:
            v = rms_alpha * v + (1.0 - rms_alpha) * g * g
            G = 1.0 / (rms_lambda + jnp.sqrt(v))
        else:
            G = 1.0
        noise = jr.normal(k_noise, q.shape, q.dtype)
        q = q + 0.5 * eps * G * g + jnp.sqrt(eps * G) * noise
        return (q, v), (q if collect else None)

    (q, _), draws = lax.scan(step, (q0, v0), jnp.arange(n_steps))
    return q, draws


def sghmc_sweep_cols(
    grad_fn: Callable,
    q0,
    seed: int,
    *,
    n_steps: int,
    eps: float,
    friction: float = 1.0,
):
    """SGHMC sweep (Chen et al. 2014, eq. 15 with B̂=0): underdamped
    Langevin with momentum ``p``:

        p ← (1 − eps·C)·p + eps·ĝ(q) + N(0, 2·C·eps)
        q ← q + eps·p

    ``friction`` is C. Returns ``(q_final, p_final)``.
    """
    q0 = jnp.asarray(q0, jnp.float32)
    root = jr.key(seed ^ 0x5A17)
    # step keys are fold_in(root, 0..n_steps-1); n_steps is out of that range
    p0 = jr.normal(jr.fold_in(root, n_steps), q0.shape, q0.dtype)

    def step(carry, i):
        q, p = carry
        k = jr.fold_in(root, i)
        k_grad, k_noise = jr.split(k)
        g = grad_fn(q, k_grad)
        noise = jr.normal(k_noise, q.shape, q.dtype)
        p = (
            (1.0 - eps * friction) * p
            + eps * g
            + jnp.sqrt(2.0 * friction * eps) * noise
        )
        q = q + eps * p
        return (q, p), None

    (q, p), _ = lax.scan(step, (q0, p0), jnp.arange(n_steps))
    return q, p
