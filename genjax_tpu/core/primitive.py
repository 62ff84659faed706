"""Initial-style JAX primitives: embed effectful calls in Jaxprs so they can
be re-interpreted later.

Parity: reference ``/root/reference/src/genjax/_src/core/compiler/
initial_style_primitive.py`` (``InitialStylePrimitive`` :31,
``initial_style_bind`` :57). Used by the ADEV forward-mode interpreter
(``sample_p``) and the time-travel debugger (``record_p``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.tree_util as jtu
from jax.extend.core import Primitive
from jax.interpreters import batching, mlir


def initial_style_primitive(name: str) -> Primitive:
    """Create a multi-result primitive whose impl/abstract-eval/lowering are
    carried in its bind params (keys: ``impl``, ``abs``, plus user params)."""
    prim = Primitive(name)
    prim.multiple_results = True

    def impl(*flat_args, **params):
        return params["impl"](*flat_args, **params)

    def abstract(*flat_avals, **params):
        return params["abs"](*flat_avals, **params)

    prim.def_impl(impl)
    prim.def_abstract_eval(abstract)

    def lowering(ctx, *mlir_args, **params):
        lowered = mlir.lower_fun(
            lambda *a: params["impl"](*a, **params), multiple_results=True
        )
        return lowered(ctx, *mlir_args)

    mlir.register_lowering(prim, lowering)

    def batch_rule(batched_args, batch_dims, **params):
        axes = tuple(batch_dims)
        batched = jax.vmap(
            lambda *a: params["impl"](*a, **params),
            in_axes=axes,
        )(*batched_args)
        return batched, (0,) * len(batched)

    batching.primitive_batchers[prim] = batch_rule
    return prim


def initial_style_bind(prim: Primitive, **params) -> Callable:
    """Bind ``prim`` around a traced function:

    ``initial_style_bind(prim, **params)(fn)(*args)`` stages ``fn`` on the
    flat avals of ``args`` and binds ``prim`` carrying the staged jaxpr plus
    in/out trees, so later interpreters can re-open the call.
    """

    def bind(fn: Callable):
        def wrapped(*args, **kwargs):
            jaxpr, out_shape = jax.make_jaxpr(
                lambda *a: fn(*a, **kwargs), return_shape=True
            )(*args)
            flat_args, in_tree = jtu.tree_flatten(args)
            out_tree = jtu.tree_structure(out_shape)

            def impl(*flat, **p):
                consts = p["jaxpr"].consts
                return jax.core.eval_jaxpr(p["jaxpr"].jaxpr, consts, *flat)

            def abs_eval(*flat_avals, **p):
                return [v.aval for v in p["jaxpr"].jaxpr.outvars]

            outs = prim.bind(
                *flat_args,
                jaxpr=jaxpr,
                in_tree=in_tree,
                out_tree=out_tree,
                impl=impl,
                abs=abs_eval,
                **params,
            )
            return jtu.tree_unflatten(out_tree, outs)

        return wrapped

    return bind


# Reference-parity alias: the reference exposes a class named
# InitialStylePrimitive; here primitives are built by the factory function,
# which serves the same role.
InitialStylePrimitive = initial_style_primitive
