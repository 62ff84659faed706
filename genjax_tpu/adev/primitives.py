"""The ADEV gradient-estimator zoo.

Parity: reference ``/root/reference/src/genjax/_src/adev/primitives.py``
(500 LoC) — ``REINFORCE`` :78, ``FlipEnum`` :117, ``FlipMVD`` :157,
``FlipEnumParallel`` :184, ``CategoricalEnumParallel`` :221,
``flip/geometric/normal_reinforce`` :255-268, ``NormalREPARAM`` :272,
``MvNormalDiagREPARAM`` :302, ``MvNormalREPARAM`` :339 (Cholesky),
``Uniform`` :374, ``BetaIMPLICIT`` :393, ``Baseline`` :424, ``AddCost``
:480. Samplers/log-densities are implemented on ``jax.random`` directly
(no TFP).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.pytree import Pytree
from .core import (
    ADEVPrimitive,
    Dual,
    TailCallADEVPrimitive,
    float0_zero_tangent,
)


# ----------------------------------------------------------------------
# score-function (REINFORCE)
# ----------------------------------------------------------------------


@Pytree.dataclass
class REINFORCE(ADEVPrimitive):
    """Score-function estimator: correlates the continuation's value with the
    score ∂θ log q(v; θ) (reference primitives.py:78)."""

    sample_function: Callable = Pytree.static()
    differentiable_logpdf: Callable = Pytree.static()

    def sample(self, key, *args):
        return self.sample_function(key, *args)

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        primals = Dual.tree_primal(dual_tree)
        tangents = Dual.tree_tangent(dual_tree)
        key, sub_key = jr.split(key)
        v = self.sample(sub_key, *primals)
        out = kdual(key, Dual.tree_pure(v))
        (out_primal,), (out_tangent,) = Dual.tree_unzip(out)
        zero_v = jax.tree_util.tree_map(float0_zero_tangent, v)
        _, lp_tangent = jax.jvp(
            lambda v_, *a: self.differentiable_logpdf(v_, *a),
            (v, *primals),
            (zero_v, *tangents),
        )
        return Dual(out_primal, out_tangent + out_primal * lp_tangent)


def reinforce(sample_func, logpdf_func) -> REINFORCE:
    return REINFORCE(sample_func, logpdf_func)


# ----------------------------------------------------------------------
# exact enumeration
# ----------------------------------------------------------------------


@Pytree.dataclass
class FlipEnum(ADEVPrimitive):
    """Exact 2-branch enumeration of a Bernoulli: runs the continuation for
    both outcomes and mixes by probability (reference primitives.py:117)."""

    def sample(self, key, *args):
        (p,) = args
        return jr.bernoulli(key, p)

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        t = jnp.asarray(True)
        f = jnp.asarray(False)
        true_out = kdual(key, Dual(t, jnp.zeros_like(t)))
        false_out = kdual(key, Dual(f, jnp.zeros_like(f)))
        (tp,), (tt,) = Dual.tree_unzip(true_out)
        (fp,), (ft,) = Dual.tree_unzip(false_out)
        out_p, out_t = jax.jvp(
            lambda p, tl, fl: p * tl + (1.0 - p) * fl,
            (p_primal, tp, fp),
            (p_tangent, tt, ft),
        )
        return Dual(out_p, out_t)


flip_enum = FlipEnum()


@Pytree.dataclass
class FlipEnumParallel(ADEVPrimitive):
    """Both Bernoulli branches evaluated in one vmapped continuation call
    (reference primitives.py:184)."""

    def sample(self, key, *args):
        (p,) = args
        return jr.bernoulli(key, p)

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        vs = jnp.asarray([True, False])
        keys = jr.split(key, 2)
        outs = jax.vmap(
            lambda k, v: kdual(k, Dual(v, jnp.zeros_like(v)))
        )(keys, vs)
        out_p, out_t = jax.jvp(
            lambda p, rets: jnp.sum(jnp.stack([p, 1.0 - p]) * rets),
            (p_primal, outs.primal),
            (p_tangent, outs.tangent),
        )
        return Dual(out_p, out_t)


flip_enum_parallel = FlipEnumParallel()


@Pytree.dataclass
class CategoricalEnumParallel(ADEVPrimitive):
    """Exact enumeration over a categorical's support, vmapped
    (reference primitives.py:221). Args: ``(logits,)``."""

    def sample(self, key, *args):
        (logits,) = args
        return jr.categorical(key, logits)

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        (logits_primal,) = Dual.tree_primal(dual_tree)
        (logits_tangent,) = Dual.tree_tangent(dual_tree)
        n = logits_primal.shape[-1]
        idxs = jnp.arange(n)
        keys = jr.split(key, n)
        outs = jax.vmap(
            lambda k, i: kdual(k, Dual(i, jnp.zeros_like(i)))
        )(keys, idxs)
        out_p, out_t = jax.jvp(
            lambda logits, rets: jnp.sum(jax.nn.softmax(logits) * rets),
            (logits_primal, outs.primal),
            (logits_tangent, outs.tangent),
        )
        return Dual(out_p, out_t)


categorical_enum_parallel = CategoricalEnumParallel()


# ----------------------------------------------------------------------
# measure-valued derivatives
# ----------------------------------------------------------------------


@Pytree.dataclass
class FlipMVD(ADEVPrimitive):
    """Measure-valued derivative for a Bernoulli: compares the continuation
    at the sampled branch against the flipped branch
    (reference primitives.py:157; the reference implementation has a broken
    continuation call — fixed here)."""

    def sample(self, key, *args):
        (p,) = args
        return jr.bernoulli(key, p)

    def jvp_estimate(self, key, dual_tree, konts):
        kpure, kdual = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        key, sub_key = jr.split(key)
        b = jr.bernoulli(sub_key, p_primal)
        out = kdual(key, Dual(b, jnp.zeros_like(b)))
        other = kpure(key, jnp.logical_not(b))
        sign = jnp.where(b, 1.0, -1.0)
        est = sign * (out.primal - other)
        return Dual(out.primal, out.tangent + est * p_tangent)


flip_mvd = FlipMVD()


# ----------------------------------------------------------------------
# reparameterization (tail-call strategies)
# ----------------------------------------------------------------------


@Pytree.dataclass
class NormalREPARAM(TailCallADEVPrimitive):
    """Location-scale reparameterization of the normal
    (reference primitives.py:272)."""

    def sample(self, key, *args):
        loc, scale = args
        return loc + scale * jr.normal(key, jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale)))

    def before_tail_call(self, key, dual_tree):
        (mu_p, sigma_p) = Dual.tree_primal(dual_tree)
        (mu_t, sigma_t) = Dual.tree_tangent(dual_tree)
        _, sub_key = jr.split(key)
        eps = jr.normal(
            sub_key, jnp.broadcast_shapes(jnp.shape(mu_p), jnp.shape(sigma_p))
        )
        p, t = jax.jvp(
            lambda mu, sigma: mu + sigma * eps, (mu_p, sigma_p), (mu_t, sigma_t)
        )
        return Dual(p, t)


normal_reparam = NormalREPARAM()


@Pytree.dataclass
class MvNormalDiagREPARAM(TailCallADEVPrimitive):
    """Diagonal-covariance multivariate normal reparameterization
    (reference primitives.py:302)."""

    def sample(self, key, *args):
        loc, scale_diag = args
        return loc + scale_diag * jr.normal(key, jnp.shape(loc))

    def before_tail_call(self, key, dual_tree):
        (loc_p, diag_p) = Dual.tree_primal(dual_tree)
        (loc_t, diag_t) = Dual.tree_tangent(dual_tree)
        _, sub_key = jr.split(key)
        eps = jr.normal(sub_key, jnp.shape(loc_p))
        p, t = jax.jvp(
            lambda loc, diag: loc + diag * eps, (loc_p, diag_p), (loc_t, diag_t)
        )
        return Dual(p, t)


mv_normal_diag_reparam = MvNormalDiagREPARAM()


@Pytree.dataclass
class MvNormalREPARAM(TailCallADEVPrimitive):
    """Full-covariance multivariate normal via Cholesky reparameterization
    (reference primitives.py:339)."""

    def sample(self, key, *args):
        mu, cov = args
        L = jnp.linalg.cholesky(cov)
        return mu + L @ jr.normal(key, jnp.shape(mu))

    def before_tail_call(self, key, dual_tree):
        (mu_p, cov_p) = Dual.tree_primal(dual_tree)
        (mu_t, cov_t) = Dual.tree_tangent(dual_tree)
        _, sub_key = jr.split(key)
        eps = jr.normal(sub_key, jnp.shape(mu_p))

        def transform(mu, cov):
            L = jnp.linalg.cholesky(cov)
            return mu + L @ eps

        p, t = jax.jvp(transform, (mu_p, cov_p), (mu_t, cov_t))
        return Dual(p, t)


mv_normal_reparam = MvNormalREPARAM()


@Pytree.dataclass
class Uniform(TailCallADEVPrimitive):
    """Parameterless uniform(0,1) draw (reference primitives.py:374)."""

    def sample(self, key, *_args):
        return jr.uniform(key)

    def before_tail_call(self, key, dual_tree):
        _, sub_key = jr.split(key)
        x = jr.uniform(sub_key)
        return Dual(x, jnp.zeros_like(x))


uniform = Uniform()


@Pytree.dataclass
class BetaIMPLICIT(TailCallADEVPrimitive):
    """Beta with implicit reparameterization (Figurnov et al. 2018):
    differentiate the sample path via the inverse-CDF identity
    dv/dθ = −(∂F/∂θ) / f(v), computed with JAX's gamma-sampler derivative
    (``jax.random.beta`` is differentiable w.r.t. its parameters)
    (reference primitives.py:393, which defers to TFP's implicit rule)."""

    def sample(self, key, *args):
        alpha, beta_ = args
        return jr.beta(key, alpha, beta_)

    def before_tail_call(self, key, dual_tree):
        primals = Dual.tree_primal(dual_tree)
        tangents = Dual.tree_tangent(dual_tree)
        p, t = jax.jvp(
            lambda a, b: jr.beta(key, a, b), tuple(primals), tuple(tangents)
        )
        return Dual(p, t)


beta_implicit = BetaIMPLICIT()


# ----------------------------------------------------------------------
# ready-made REINFORCE samplers
# ----------------------------------------------------------------------


def _bernoulli_logpdf(v, p):
    vf = jnp.asarray(v, jnp.float32)
    return vf * jnp.log(p) + (1.0 - vf) * jnp.log1p(-p)


flip_reinforce = reinforce(
    lambda key, p: jr.bernoulli(key, p),
    _bernoulli_logpdf,
)


def _geometric_logpdf(v, p):
    # TFP Geometric: number of failures before the first success
    vf = jnp.asarray(v, jnp.float32)
    return vf * jnp.log1p(-p) + jnp.log(p)


geometric_reinforce = reinforce(
    lambda key, p: jr.geometric(key, p) - 1,
    _geometric_logpdf,
)


def _normal_logpdf(v, loc, scale):
    z = (v - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi)


normal_reinforce = reinforce(
    lambda key, loc, scale: loc + scale * jr.normal(key),
    _normal_logpdf,
)


# ----------------------------------------------------------------------
# variance reduction & loss accumulation
# ----------------------------------------------------------------------


@Pytree.dataclass
class Baseline(ADEVPrimitive):
    """Control variate: subtract a baseline ``b`` from the continuation value
    inside the inner strategy, add it back outside
    (reference primitives.py:424). Args: ``(b, *prim_args)``."""

    prim: ADEVPrimitive

    def sample(self, key, *args):
        return self.prim.sample(key, *args[1:])

    def pure_sample(self, key, *args):
        return self.prim.pure_sample(key, *args[1:])

    def pure_cost(self, *args):
        return self.prim.pure_cost(*args[1:])

    def jvp_estimate(self, key, dual_tree, konts):
        kpure, kdual = konts
        (b_primal, *prim_primals) = Dual.tree_primal(dual_tree)
        (b_tangent, *prim_tangents) = Dual.tree_tangent(dual_tree)

        def shifted_kdual(key, dual):
            ret = kdual(key, dual)
            p, t = jax.jvp(
                lambda r, b: r - b, (ret.primal, b_primal), (ret.tangent, b_tangent)
            )
            return Dual(p, t)

        def shifted_kpure(key, v):
            # the PURE continuation must see the same shifted loss: MVD /
            # enumeration strategies evaluate alternative branches through
            # kpure, and an unshifted branch leaves a -(2p-1)*b bias in
            # the difference estimator
            return kpure(key, v) - b_primal

        inner = self.prim.jvp_estimate(
            key,
            Dual.dual_tree(tuple(prim_primals), tuple(prim_tangents)),
            (shifted_kpure, shifted_kdual),
        )
        p, t = jax.jvp(
            lambda l, b: l + b, (inner.primal, b_primal), (inner.tangent, b_tangent)
        )
        return Dual(p, t)


def baseline(prim: ADEVPrimitive) -> Baseline:
    return Baseline(prim)


@Pytree.dataclass
class AddCost(ADEVPrimitive):
    """Add a (differentiable) cost term to the enclosing expectation
    (reference primitives.py:480)."""

    def sample(self, key, *args):
        (w,) = args
        return w

    def pure_cost(self, *args):
        # the cost must also reach PURE continuation values (the
        # alternative-sample evaluations of enumeration/MVD strategies),
        # or every estimator upstream of an add_cost is silently biased
        (w,) = args
        return w

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        (w_primal,) = Dual.tree_primal(dual_tree)
        (w_tangent,) = Dual.tree_tangent(dual_tree)
        rest = kdual(key, Dual(w_primal, w_tangent))
        return Dual(w_primal + rest.primal, w_tangent + rest.tangent)


def add_cost(w):
    """Statement form: ``add_cost(w)`` inside an ``@expectation`` program."""
    AddCost()(w)
