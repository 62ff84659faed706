"""Variational inference: ADEV-differentiable guide distributions and
gradient-estimating loss builders.

Parity: reference ``/root/reference/src/genjax/_src/inference/vi.py``
(232 LoC) — ``adev_distribution`` :61, wrapped primitives :90-116, ``ELBO``
:129, ``IWELBO`` :154, ``PWake`` :180, ``QWake`` :207. Each loss wraps an
``@expectation`` program that invokes SMC's ``estimate_normalizing_constant``
(GRASP gradient estimators).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..adev import core as adev_core
from ..adev import primitives as adev_prims
from ..adev.core import ADEVPrimitive, expectation
from ..core.typing_ import PRNGKey
from ..dists import catalog as _catalog
from ..dists.distribution import ExactDensity, exact_density
from .smc import Importance, ImportanceK
from .sp import SampleDistribution, Target

GradientEstimate = Any


def adev_distribution(
    adev_primitive: ADEVPrimitive,
    differentiable_logpdf: Callable,
    name: str,
) -> ExactDensity:
    """An ``ExactDensity`` whose sampler is an ADEV primitive — usable as a
    distribution in guide programs, differentiable through ``@expectation``
    losses (reference vi.py:61)."""

    def sampler(key: PRNGKey, *args):
        return adev_core.sample_primitive(adev_primitive, *args, key=key)

    def logpdf(v, *args):
        lp = differentiable_logpdf(v, *args)
        return jnp.sum(lp) if jnp.shape(lp) else lp

    return exact_density(sampler, logpdf, name)


def _logpdf_of(dist) -> Callable:
    return lambda v, *args: dist.logpdf(v, *args)


flip_enum = adev_distribution(
    adev_prims.flip_enum, _logpdf_of(_catalog.flip), "flip_enum"
)
flip_mvd = adev_distribution(
    adev_prims.flip_mvd, _logpdf_of(_catalog.flip), "flip_mvd"
)
flip_reinforce = adev_distribution(
    adev_prims.flip_reinforce, _logpdf_of(_catalog.flip), "flip_reinforce"
)
categorical_enum = adev_distribution(
    adev_prims.categorical_enum_parallel,
    _logpdf_of(_catalog.categorical),
    "categorical_enum",
)
normal_reinforce = adev_distribution(
    adev_prims.normal_reinforce, _logpdf_of(_catalog.normal), "normal_reinforce"
)
normal_reparam = adev_distribution(
    adev_prims.normal_reparam, _logpdf_of(_catalog.normal), "normal_reparam"
)
mv_normal_diag_reparam = adev_distribution(
    adev_prims.mv_normal_diag_reparam,
    _logpdf_of(_catalog.mv_normal_diag),
    "mv_normal_diag_reparam",
)
geometric_reinforce = adev_distribution(
    adev_prims.geometric_reinforce,
    lambda v, p: _catalog.geometric.logpdf(v, jnp.log(p) - jnp.log1p(-p)),
    "geometric_reinforce",
)
beta_implicit = adev_distribution(
    adev_prims.beta_implicit, _logpdf_of(_catalog.beta), "beta_implicit"
)


# ----------------------------------------------------------------------
# loss builders (reference vi.py:129-232)
# ----------------------------------------------------------------------


def fit(
    grad_estimate,
    phi0,
    *,
    key,
    n_steps: int = 500,
    learning_rate: float = 0.05,
    batch_size: int = 16,
):
    """Convenience optimizer driver for any loss builder's gradient
    estimator (ELBO/IWELBO/PWake/QWake): optax Adam on batch-averaged
    gradient samples, the whole loop jitted. Returns the parameters after
    ``n_steps``."""
    import optax
    import jax.tree_util as jtu
    from jax import lax

    opt = optax.adam(learning_rate)

    def batched_grad(k, phi):
        gs = jax.vmap(lambda kk: grad_estimate(kk, (phi,))[0])(
            jax.random.split(k, batch_size)
        )
        return jtu.tree_map(lambda g_: jnp.mean(g_, axis=0), gs)

    @jax.jit
    def run(key, phi):
        state = opt.init(phi)

        def step(carry, k):
            phi, state = carry
            g_ = batched_grad(k, phi)
            updates, state = opt.update(g_, state)
            phi = optax.apply_updates(phi, updates)
            return (phi, state), None

        (phi, _), _ = lax.scan(step, (phi, state), jax.random.split(key, n_steps))
        return phi

    return run(key, phi0)


def ELBO(
    guide: SampleDistribution,
    make_target: Callable[..., Target],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """∇ of the negative evidence lower bound: −E_q[log p/q]
    (reference vi.py:129)."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        # distinct streams for the closed-over model/SMC randomness and the
        # ADEV transform key (the tail-call strategies split the transform
        # key exactly as estimate_normalizing_constant splits the model
        # key, so sharing one parent correlates guide noise with the
        # target's importance fills)
        model_key, adev_key = jax.random.split(key)

        @expectation
        def _loss(*args):
            target = make_target(*args)
            alg = Importance(target, guide)
            w = alg.estimate_normalizing_constant(model_key, target)
            return -w

        return _loss.grad_estimate(adev_key, args)

    return grad_estimate


def IWELBO(
    proposal: SampleDistribution,
    make_target: Callable[..., Target],
    N: int,
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """∇ of the negative importance-weighted ELBO with N particles
    (reference vi.py:154)."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        # see ELBO: separate the SMC stream from the ADEV transform stream
        model_key, adev_key = jax.random.split(key)

        @expectation
        def _loss(*args):
            target = make_target(*args)
            alg = ImportanceK(target, proposal, N)
            w = alg.estimate_normalizing_constant(model_key, target)
            return -w

        return _loss.grad_estimate(adev_key, args)

    return grad_estimate


def PWake(
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """∇ of the wake-phase model-learning loss: −E_{z~approx}[log p(z, x)]
    (reference vi.py:180)."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        key, k1, k2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(k1, target)
            tr, _ = target.importance(k2, sample)
            return -tr.get_score()

        return _loss.grad_estimate(key, args)

    return grad_estimate


def QWake(
    proposal: SampleDistribution,
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """∇ of the wake-phase guide-learning loss: −E_{z~approx}[log q(z | x)]
    (reference vi.py:207)."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        key, k1, k2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(k1, target)
            w = proposal.estimate_logpdf(k2, sample, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate
