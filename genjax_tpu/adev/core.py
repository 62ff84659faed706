"""ADEV core: forward-mode AD through probabilistic programs, where each
sampling primitive carries its own unbiased gradient-estimation strategy.

Parity: reference ``/root/reference/src/genjax/_src/adev/core.py`` (519 LoC)
— ``ADEVPrimitive`` :56, ``TailCallADEVPrimitive`` :86, ``sample_p``
:140-155, ``Dual`` :172, ``ADInterpreter`` :236 (continuation capture at
``sample_p`` :289-328, ``cond_p`` branch transformation :331-363, default
JVP rules :366-380), ``ADEVProgram`` :439, ``Expectation`` :466,
``@expectation`` :493, ``jax.custom_jvp`` integration :505-519.

Algorithm (Lew, Huot, Staton, Mansinghka 2023 — "ADEV: Sound Automatic
Differentiation of Expected Values"): the loss program is staged to a Jaxpr;
a CPS interpreter pushes dual numbers through deterministic equations using
JAX's registered JVP rules, and at each ``sample_p`` equation builds the
pure and dual *continuations* (the rest of the program) and hands them to
the primitive's strategy — enumeration runs the continuation per branch,
REINFORCE correlates the continuation value with the score function,
reparameterization pushes duals straight through. Under ``jit`` the whole
transformed program is one XLA computation.
"""

from __future__ import annotations

import abc
from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.extend.core import jaxpr_as_fun

from ..core.environment import Environment
from ..core.primitive import initial_style_bind, initial_style_primitive
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey


@Pytree.dataclass
class Dual(Pytree):
    """A (primal, tangent) pair; the unit of forward-mode propagation."""

    primal: Any
    tangent: Any

    # ----- tree helpers -----

    @staticmethod
    def _is(v) -> bool:
        return isinstance(v, Dual)

    @staticmethod
    def tree_pure(v):
        """Wrap every non-Dual leaf with a zero tangent."""
        return jtu.tree_map(
            lambda x: x if isinstance(x, Dual) else Dual(x, jnp.zeros_like(x)),
            v,
            is_leaf=Dual._is,
        )

    @staticmethod
    def dual_tree(primals, tangents):
        return jtu.tree_map(Dual, primals, tangents)

    @staticmethod
    def tree_primal(v):
        return jtu.tree_map(
            lambda x: x.primal if isinstance(x, Dual) else x, v, is_leaf=Dual._is
        )

    @staticmethod
    def tree_tangent(v):
        return jtu.tree_map(
            lambda x: x.tangent if isinstance(x, Dual) else x, v, is_leaf=Dual._is
        )

    @staticmethod
    def tree_leaves(v):
        return jtu.tree_leaves(Dual.tree_pure(v), is_leaf=Dual._is)

    @staticmethod
    def tree_unzip(v):
        primals = jtu.tree_leaves(Dual.tree_primal(v))
        tangents = jtu.tree_leaves(Dual.tree_tangent(v))
        return tuple(primals), tuple(tangents)

    @staticmethod
    def static_check_dual_tree(v) -> bool:
        return all(
            isinstance(leaf, Dual)
            for leaf in jtu.tree_leaves(v, is_leaf=Dual._is)
        )


# ----------------------------------------------------------------------
# primitives
# ----------------------------------------------------------------------


class ADEVPrimitive(Pytree):
    """A sampler paired with a JVP gradient-estimation strategy
    (reference core.py:56)."""

    @abc.abstractmethod
    def sample(self, key: PRNGKey, *args) -> Any:
        ...

    @abc.abstractmethod
    def jvp_estimate(
        self,
        key: PRNGKey,
        dual_tree: Any,
        konts: tuple[Callable, Callable],
    ) -> Dual:
        """Estimate the JVP of ``E[continuation(sample)]``.

        ``konts = (kpure, kdual)``: ``kpure(key, *sample)`` evaluates the
        rest of the program without tangents; ``kdual(key, dual)`` continues
        dual propagation from this sample's output.
        """

    def __call__(self, *args):
        return sample_primitive(self, *args)

    def pure_sample(self, key: PRNGKey, *args) -> Any:
        """Sample inside a PURE continuation, where only the transform's
        scalar key is available (the key operand that rode in at bind time
        was consumed). Overridden by batched primitives that need a key per
        lane."""
        return self.sample(key, *args)

    def pure_cost(self, *args):
        """Additive contribution of this primitive to the value of a PURE
        continuation — ``None`` except for cost-accumulating primitives
        (``AddCost``), whose effect otherwise lives only in
        ``jvp_estimate`` and would be silently dropped from the
        alternative-sample evaluations of enumeration/MVD strategies."""
        return None


class TailCallADEVPrimitive(ADEVPrimitive):
    """A strategy that needs no continuation (e.g. reparameterization): it
    produces an output dual directly and tail-calls ``kdual``
    (reference core.py:86)."""

    @abc.abstractmethod
    def before_tail_call(self, key: PRNGKey, dual_tree: Any) -> Dual:
        ...

    def jvp_estimate(self, key, dual_tree, konts):
        _, kdual = konts
        # Distinct streams for this draw and the continuation: passing the
        # same key to both makes consecutive tail-call draws produce
        # IDENTICAL noise (e.g. two normal_reparam latents in one guide).
        import jax.random as jr

        self_key, cont_key = jr.split(key)
        return kdual(cont_key, self.before_tail_call(self_key, dual_tree))


@Pytree.dataclass
class BatchedTailCallPrimitive(TailCallADEVPrimitive):
    """A vmapped tail-call primitive: sampling and the pre-continuation dual
    computation are both vmapped over the batch dims (reference
    ``TailCallBatchedADEVPrimitive``, core.py:109). Continuation-requiring
    strategies (enumeration, REINFORCE, MVD) cannot be batched this way —
    batching them raises at the ``sample_p`` batch rule."""

    inner: ADEVPrimitive
    key_dim: Any = Pytree.static()
    arg_dims: Any = Pytree.static()
    batch_size: int = Pytree.static()

    def sample(self, key, *args):
        return jax.vmap(
            self.inner.sample, in_axes=(self.key_dim, *self.arg_dims)
        )(key, *args)

    def pure_sample(self, key, *args):
        # the transform hands a scalar key; the lanes each need one
        import jax.random as jr

        keys = jr.split(key, self.batch_size)
        return jax.vmap(
            self.inner.sample, in_axes=(0, *self.arg_dims)
        )(keys, *args)

    def before_tail_call(self, key, dual_tree):
        # `key` here is the ADEV transform's (scalar) key — the batched key
        # operand was consumed at bind time — so derive per-lane keys.
        import jax.random as jr

        primals = Dual.tree_primal(dual_tree)
        tangents = Dual.tree_tangent(dual_tree)
        keys = jr.split(key, self.batch_size)

        def inner_btc(key, primals, tangents):
            return self.inner.before_tail_call(
                key, Dual.dual_tree(primals, tangents)
            )

        out = jax.vmap(
            inner_btc,
            in_axes=(0, tuple(self.arg_dims), tuple(self.arg_dims)),
        )(keys, tuple(primals), tuple(tangents))
        return out


# ----------------------------------------------------------------------
# the sample intrinsic
# ----------------------------------------------------------------------

sample_p = initial_style_primitive("adev_sample")


def sample_primitive(adev_prim: ADEVPrimitive, *args, key: PRNGKey | None = None):
    """Embed an ADEV-primitive draw in the traced program. Under ordinary
    evaluation it samples with ``key`` (which rides as a leading operand);
    under the ADEV interpreter it triggers the primitive's strategy and the
    transform's own key discipline."""
    if key is None:
        key = jax.random.key(0)

    def call(key, adev_prim, *args):
        return adev_prim.sample(key, *args)

    return initial_style_bind(sample_p)(call)(key, adev_prim, *args)


def _sample_batch_rule(batched_args, batch_dims, **params):
    """Batching rule for ``sample_p``: re-bind with a batched primitive so
    the gradient strategy survives ``vmap`` (e.g. ImportanceK's vmapped
    proposals inside IWELBO). Tail-call (reparameterization-style)
    strategies batch exactly; continuation-requiring strategies cannot."""
    import jax.tree_util as jtu

    in_tree = params["in_tree"]
    vals = jtu.tree_unflatten(in_tree, list(batched_args))
    dims = jtu.tree_unflatten(in_tree, list(batch_dims))
    key, prim, *args = vals
    key_dim, prim_dims, *arg_dims = dims
    from jax.interpreters.batching import not_mapped

    if any(d is not not_mapped for d in jtu.tree_leaves(prim_dims)):
        raise NotImplementedError(
            "ADEV: vmap over a primitive with batched strategy parameters."
        )
    if not isinstance(prim, TailCallADEVPrimitive):
        raise NotImplementedError(
            f"ADEV: vmap over a {type(prim).__name__} draw — only "
            "reparameterization-style (tail-call) strategies support "
            "batching. Restructure enumeration/REINFORCE draws outside the "
            "vmap, or use a *_reparam primitive."
        )
    # batch size from any mapped operand (key or an argument leaf)
    size = None
    if key_dim is not not_mapped:
        size = jnp.shape(key)[key_dim]
    else:
        for a, d in zip(args, arg_dims):
            for leaf, ld in zip(jtu.tree_leaves(a), jtu.tree_leaves(d)):
                if ld is not not_mapped:
                    size = jnp.shape(leaf)[ld]
                    break
            if size is not None:
                break
    assert size is not None, "sample_p batch rule fired with no mapped operand"
    batched = BatchedTailCallPrimitive(
        prim,
        key_dim if key_dim is not not_mapped else None,
        tuple(d if d is not not_mapped else None for d in arg_dims),
        int(size),
    )
    out = sample_primitive(batched, *args, key=key)
    flat_out = jtu.tree_leaves(out)
    return flat_out, (0,) * len(flat_out)


from jax.interpreters import batching as _batching  # noqa: E402

_batching.primitive_batchers[sample_p] = _sample_batch_rule


# ----------------------------------------------------------------------
# the CPS forward-mode interpreter
# ----------------------------------------------------------------------


def float0_zero_tangent(x):
    """The JVP-convention zero tangent for a primal leaf: ``zeros_like``
    for inexact dtypes, a ``float0`` numpy zero for integer/bool leaves
    (what ``jax.jvp`` requires)."""
    import numpy as np

    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _dual_bind_jvp(eqn, primals, tangents):
    """Default dual propagation for a deterministic equation: re-bind the
    primitive under ``jax.jvp``, which dispatches to JAX's own JVP machinery
    (handles custom_jvp calls, pjit, integer operands via float0)."""
    subfuns, params = eqn.primitive.get_bind_params(eqn.params)

    def rebind(*vals):
        outs = eqn.primitive.bind(*subfuns, *vals, **params)
        return outs if eqn.primitive.multiple_results else [outs]

    def coerce_tangent(p, t):
        if jnp.issubdtype(jnp.result_type(p), jnp.inexact):
            return jnp.asarray(t, dtype=jnp.result_type(p))
        return float0_zero_tangent(p)

    ts = tuple(coerce_tangent(p, t) for p, t in zip(primals, tangents))
    primal_outs, tangent_outs = jax.jvp(rebind, tuple(primals), ts)
    tangent_outs = [
        jnp.zeros_like(p) if t.dtype == jax.dtypes.float0 else t
        for p, t in zip(primal_outs, tangent_outs)
    ]
    return primal_outs, tangent_outs


def _eval_pure(key, eqns, env: Environment, invars, flat_args, outvars):
    """Straight-line pure evaluation of the remaining equations (the 'pure
    continuation'). Downstream samples are drawn with derived keys;
    ``AddCost`` contributions accumulate into the (scalar) loss value just
    as ``jvp_estimate`` adds them on the dual path."""
    for var, val in zip(invars, flat_args):
        env.write(var, val)
    cost = None
    for i, eqn in enumerate(eqns):
        in_vals = [env.read(v) for v in eqn.invars]
        if eqn.primitive is sample_p:
            _key, adev_prim, *args = jtu.tree_unflatten(
                eqn.params["in_tree"], in_vals
            )
            outs = jtu.tree_leaves(
                adev_prim.pure_sample(jax.random.fold_in(key, i), *args)
            )
            c = adev_prim.pure_cost(*args)
            if c is not None:
                cost = c if cost is None else cost + c
        else:
            subfuns, params = eqn.primitive.get_bind_params(eqn.params)
            outs = eqn.primitive.bind(*subfuns, *in_vals, **params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for var, val in zip(eqn.outvars, outs):
            env.write(var, val)
    res = [env.read(v) for v in outvars]
    if cost is not None:
        (out,) = res  # loss programs return one scalar
        res = [out + cost]
    return res


def _eval_dual(key, eqns, env: Environment, invars, flat_duals, outvars):
    """CPS dual-number evaluation. Returns the output ``Dual``."""
    for var, val in zip(invars, flat_duals):
        env.write(var, val)

    for i, eqn in enumerate(eqns):
        in_duals = [env.read(v) for v in eqn.invars]

        if eqn.primitive is sample_p:
            env_snapshot = env.copy()
            pure_env = Environment()
            pure_env.env = {
                k: Dual.tree_primal(v) for k, v in env_snapshot.env.items()
            }
            rest = eqns[i + 1 :]

            def kpure(key, *sample_vals, _rest=rest, _pe=pure_env, _ov=eqn.outvars):
                outs = _eval_pure(
                    key, _rest, _pe.copy(), _ov, list(sample_vals), outvars
                )
                (out,) = outs
                return out

            def kdual(key, dual_tree, _rest=rest, _env=env_snapshot, _ov=eqn.outvars):
                dual_leaves = Dual.tree_leaves(dual_tree)
                return _eval_dual(
                    key, _rest, _env.copy(), _ov, dual_leaves, outvars
                )

            in_tree = eqn.params["in_tree"]
            flat = Dual.tree_leaves(Dual.tree_pure(in_duals))
            primals = [d.primal for d in flat]
            tangents = [d.tangent for d in flat]
            _key, adev_prim, *prim_primals = jtu.tree_unflatten(in_tree, primals)
            _, _, *prim_tangents = jtu.tree_unflatten(in_tree, tangents)
            dual_tree = Dual.dual_tree(tuple(prim_primals), tuple(prim_tangents))
            return adev_prim.jvp_estimate(key, dual_tree, (kpure, kdual))

        if eqn.primitive is lax.cond_p:
            env_snapshot = env.copy()
            rest = eqns[i + 1 :]
            # distinct streams: branch-internal draws vs the continuation
            # (sharing the key correlates a branch's samples with the first
            # post-cond sample)
            import jax.random as jr

            branch_key, cont_key = jr.split(key)

            def cond_kont(dual_tree, _rest=rest, _env=env_snapshot, _ov=eqn.outvars):
                dual_leaves = Dual.tree_pure(dual_tree)
                if not isinstance(dual_leaves, list):
                    dual_leaves = jtu.tree_leaves(dual_leaves, is_leaf=Dual._is)
                return _eval_dual(
                    cont_key, _rest, _env.copy(), _ov, dual_leaves, outvars
                )

            index_dual, *op_duals = in_duals
            branches = eqn.params["branches"]
            branch_fns = [
                transform_forward(jaxpr_as_fun(b), cond_kont) for b in branches
            ]
            idx = Dual.tree_primal(index_dual)
            return lax.switch(
                idx,
                branch_fns,
                branch_key,
                [Dual.tree_pure(d) for d in op_duals],
            )

        # default: deterministic equation — JAX's own JVP machinery
        flat = Dual.tree_leaves(Dual.tree_pure(in_duals))
        primals = [d.primal for d in flat]
        tangents = [d.tangent for d in flat]
        primal_outs, tangent_outs = _dual_bind_jvp(eqn, primals, tangents)
        for var, p, t in zip(eqn.outvars, primal_outs, tangent_outs):
            env.write(var, Dual(p, t))

    (out,) = [env.read(v) for v in outvars]
    if not isinstance(out, Dual):
        out = Dual(out, jnp.zeros_like(out))
    return out


def transform_forward(f: Callable, kont: Callable = lambda d: d) -> Callable:
    """ADEV forward-mode transform: returns ``g(key, dual_tree) -> Dual`` (or
    whatever ``kont`` maps the output dual to)."""

    def transformed(key: PRNGKey, dual_tree):
        dual_tree = jtu.tree_map(
            lambda v: jnp.asarray(v)
            if not isinstance(v, Dual)
            else Dual(jnp.asarray(v.primal), jnp.asarray(v.tangent)),
            dual_tree,
            is_leaf=Dual._is,
        )
        primals = Dual.tree_primal(dual_tree)
        flat_primals, in_tree = jtu.tree_flatten(primals)

        def flat_f(*flat):
            args = jtu.tree_unflatten(in_tree, flat)
            args = args if isinstance(args, (tuple, list)) else (args,)
            return f(*args)

        closed_jaxpr = jax.make_jaxpr(flat_f)(*flat_primals)
        jaxpr = closed_jaxpr.jaxpr
        env = Environment()
        for var, const in zip(jaxpr.constvars, closed_jaxpr.consts):
            env.write(var, Dual.tree_pure(const))
        flat_duals = Dual.tree_leaves(Dual.tree_pure(dual_tree))
        out_dual = _eval_dual(
            key, jaxpr.eqns, env, jaxpr.invars, flat_duals, jaxpr.outvars
        )
        return kont(out_dual)

    return transformed


# ----------------------------------------------------------------------
# programs and expectations
# ----------------------------------------------------------------------


@Pytree.dataclass
class ADEVProgram(Pytree):
    source: Callable = Pytree.static()

    def jvp_estimate(self, key: PRNGKey, dual_tree, dual_kont=lambda d: d) -> Dual:
        return transform_forward(self.source, dual_kont)(key, dual_tree)


@Pytree.dataclass
class Expectation(Pytree):
    """An expected-value objective ``E[source(*args)]`` with unbiased
    forward/reverse gradient estimators (reference core.py:466)."""

    prog: ADEVProgram

    def jvp_estimate(self, key: PRNGKey, dual_tree) -> Dual:
        return self.prog.jvp_estimate(key, dual_tree)

    def estimate(self, key: PRNGKey, args):
        # tangents must match primal shapes (a scalar 0.0 against an array
        # leaf crashes the first jax.jvp re-bind)
        zeros = jtu.tree_map(lambda v: jnp.zeros_like(jnp.asarray(v)), args)
        duals = Dual.dual_tree(args, zeros)
        return self.jvp_estimate(key, duals).primal

    def grad_estimate(self, key: PRNGKey, primals: tuple):
        """An unbiased estimate of ``∇ E[source(*primals)]`` via ``jax.grad``
        over the custom-JVP integration below."""

        def _invoke(primals):
            return _invoke_closed_over(self, key, primals)

        return jax.grad(_invoke)(primals)


def expectation(source: Callable) -> Expectation:
    """Decorator: a probabilistic loss program becomes an ``Expectation``
    (reference core.py:493).

    ``grad_estimate`` returns an unbiased gradient of the expected value —
    exact under enumeration estimators:

    >>> import jax
    >>> from genjax_tpu.adev import expectation, flip_enum
    >>> @expectation
    ... def obj(p):
    ...     b = flip_enum(p)
    ...     return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)
    >>> (dp,) = obj.grad_estimate(jax.random.key(0), (0.3,))
    >>> float(dp)   # E[obj] = p, so d/dp = 1 exactly
    1.0
    """
    return Expectation(ADEVProgram(source))


# jax.grad integration: a custom-JVP function whose forward rule is the ADEV
# estimator, so Expectation composes with JAX's native AD
# (reference core.py:505-519).


@jax.custom_jvp
def _invoke_closed_over(instance: Expectation, key, args):
    return instance.estimate(key, args)


def _invoke_closed_over_jvp(primals, tangents):
    (instance, key, primals) = primals
    (_, _, tangents) = tangents
    duals = Dual.dual_tree(primals, tangents)
    out = instance.jvp_estimate(key, duals)
    return out.primal, out.tangent


_invoke_closed_over.defjvp(_invoke_closed_over_jvp, symbolic_zeros=False)
