"""Gradient-based point estimation over selected choices.

No reference counterpart (the reference ships sampling and VI only).
``fit_map`` maximizes the model's log-joint over the selected (continuous)
choices — MAP estimation, or MLE when the selection has a flat prior —
with optax, reusing the same ravel machinery as the NUTS/HMC requests, so
it works on any ``@gen`` model through ``assess``. Batched restarts ride
a vmapped axis; the best restart wins.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection
from .requests.grad_view import split_ravel


@Pytree.dataclass
class MAPResult(Pytree):
    """``choices``: the optimized selected choices (a choice-map pytree);
    ``log_joint``: the achieved log-density; ``trajectory``: per-step
    best-restart log-joint."""

    choices: Any
    log_joint: Any
    trajectory: Any

    def __getitem__(self, addr):
        from ..generative.mask import Mask

        path = addr if isinstance(addr, tuple) else (addr,)
        v = self.choices.get_submap(*path).get_value()
        return v.value if isinstance(v, Mask) else v


def fit_map(
    key: PRNGKey,
    model: GenerativeFunction,
    constraint: ChoiceMap,
    args: tuple,
    selection: Selection,
    *,
    n_steps: int = 300,
    learning_rate: float = 0.05,
    n_restarts: int = 8,
) -> MAPResult:
    """Maximize ``log p(selection, constraint)`` over the selected choices.

    Initializes ``n_restarts`` points from the prior (vmapped), runs Adam
    on each, and returns the best. One jitted program.
    """
    import optax

    tr, _ = model.generate(key, constraint, args)
    chm = tr.get_choices()
    frozen = chm.filter(~selection)
    _z0, rebuild = split_ravel(chm.filter_eager(selection))

    def log_joint(z):
        w, _ = model.assess(rebuild(z).merge(frozen), args)
        return w

    opt = optax.adam(learning_rate)
    neg_val_grad = jax.value_and_grad(lambda z: -log_joint(z))

    @jax.jit
    def run(key):
        def init_one(k):
            t, _ = model.generate(k, constraint, args)
            z, _ = split_ravel(t.get_choices().filter_eager(selection))
            return z.astype(jnp.float32)

        zs = jax.vmap(init_one)(jr.split(key, n_restarts))
        states = jax.vmap(opt.init)(zs)

        def step(carry, _):
            zs, states = carry

            def one(z, s):
                loss, g = neg_val_grad(z)
                updates, s = opt.update(g, s, z)
                return optax.apply_updates(z, updates), s, -loss

            zs, states, ljs = jax.vmap(one)(zs, states)
            return (zs, states), jnp.max(ljs)

        (zs, _), traj = lax.scan(step, (zs, states), None, length=n_steps)
        ljs = jax.vmap(log_joint)(zs)
        best = jnp.argmax(ljs)
        return zs[best], ljs[best], traj

    z_best, lj, traj = run(key)
    return MAPResult(
        choices=rebuild(z_best),
        log_joint=lj,
        trajectory=traj,
    )


@Pytree.dataclass
class LaplaceResult(Pytree):
    """Gaussian posterior approximation at the MAP point: ``mean``/``cov``
    over the raveled selection (``unpack`` maps a raveled vector back to
    the selection's choice-map structure), plus the Laplace evidence
    estimate ``log_marginal`` = log p(y, ẑ) + d/2·log 2π − ½·log|H|."""

    map_result: MAPResult
    mean: Any
    cov: Any
    log_marginal: Any

    def unpack(self, z):
        # mean/cov live on the GRAD-ONLY ravel (the same one fit_map and
        # the Hessian use); split_ravel keeps any non-differentiable leaf
        # in the selection out of the vector, so the layout matches
        _flat, rebuild = split_ravel(self.map_result.choices)
        return rebuild(z)


def laplace_approximation(
    key: PRNGKey,
    model: GenerativeFunction,
    constraint: ChoiceMap,
    args: tuple,
    selection: Selection,
    **fit_kwargs,
) -> LaplaceResult:
    """MAP + Gaussian curvature: fit the mode with ``fit_map``, then invert
    the negative Hessian of the log-joint at the mode for the approximate
    posterior covariance and the Laplace evidence estimate. Exact for
    Gaussian posteriors; the standard fast approximation elsewhere."""
    res = fit_map(key, model, constraint, args, selection, **fit_kwargs)

    tr, _ = model.generate(key, constraint, args)
    chm = tr.get_choices()
    frozen = chm.filter(~selection)
    _z0, rebuild = split_ravel(chm.filter_eager(selection))
    z_hat, _ = split_ravel(res.choices)

    def log_joint(z):
        w, _ = model.assess(rebuild(z).merge(frozen), args)
        return w

    h = jax.hessian(log_joint)(z_hat)
    prec = -h
    d = z_hat.shape[0]
    # The Gaussian approximation only exists where -H is positive
    # definite; at a saddle (or an unconverged fit) slogdet's sign goes
    # non-positive and log|det| would be a finite but meaningless number.
    # Check definiteness via the Cholesky route (sign alone misses
    # even-signature saddles) and surface NaN instead of garbage.
    chol = jnp.linalg.cholesky(prec)
    pos_def = jnp.all(jnp.isfinite(chol))
    _sign, logdet = jnp.linalg.slogdet(prec)
    logdet = jnp.where(pos_def, logdet, jnp.nan)
    cov = jnp.where(pos_def, jnp.linalg.inv(prec), jnp.nan)
    log_marginal = (
        res.log_joint + 0.5 * d * jnp.log(2.0 * jnp.pi) - 0.5 * logdet
    )
    return LaplaceResult(
        map_result=res, mean=z_hat, cov=cov, log_marginal=log_marginal
    )
