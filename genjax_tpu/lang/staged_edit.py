"""Jaxpr-staged incremental edit path for the ``@gen`` static language.

This is the counterpart of the reference's incremental interpreter
(``/root/reference/src/genjax/_src/core/compiler/interpreters/
incremental.py`` :300-311 ``default_propagation_rule``/:311
``IncrementalInterpreter``) driving the update transform
(``static.py:469-504``): change tangents (``NoChange``/``UnknownChange``)
are propagated *per equation* through a staged Jaxpr of the model body, so
an edit touching one address re-scores only that address's true dependents.

Architecture: the ``@gen`` hot paths (simulate/assess/generate) stay on the
handler stack (``core/handlers.py``) — no staging round-trip. ``edit`` alone
stages the body once (cached on treedef+avals), with every addressed call
embedded as an ``addr_call_p`` equation, then evaluates the Jaxpr with a
parallel boolean change-environment:

- a default equation is re-executed (cheap deterministic glue; XLA CSEs it)
  and its outputs are marked changed iff any input changed;
- an ``addr_call_p`` equation whose inputs are all unchanged and whose
  sub-request is trivial *reuses the previous subtrace* — no re-scoring, no
  density evaluation — and emits the old retval with ``changed=False``;
- otherwise the sub-request's ``edit`` runs with *per-leaf argdiffs* built
  from the change environment, and the resulting retdiff's tangents flow
  back into the environment.

The asymptotic win: editing the last address of an N-address body after
also editing the first re-scores only the two addresses and their true
dependents, not the N-1 suffix (the round-1 clean-prefix scheme degraded to
O(suffix) after the first dirty address).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
from jax.core import ShapedArray
from jax.extend.core import Literal, Primitive

from ..core.diff import Diff, NoChange, UnknownChange
from ..core.handlers import AddressReuse, TraceHandler, handle
from ..core.staging import cached_stage_dynamic
from ..generative.concepts import (
    EditRequest,
    EmptyRequest,
    dispatch_edit,
    source_changed_flags,  # noqa: F401 — re-export for static_lang
)

# ----------------------------------------------------------------------
# the addressed-call primitive
# ----------------------------------------------------------------------

addr_call_p = Primitive("addr_call")
addr_call_p.multiple_results = True


@addr_call_p.def_impl
def _addr_call_impl(*_flat, **_params):
    raise NotImplementedError(
        "addr_call_p is a staging-only primitive: it is replaced by the "
        "incremental edit evaluator and must never be executed directly."
    )


@addr_call_p.def_abstract_eval
def _addr_call_abs(*_flat_avals, **params):
    return list(params["out_avals"])


class StagingUnsupported(Exception):
    """The model body cannot be staged (Python control flow on traced
    values, etc.) — callers fall back to the handler-based edit path."""


def _value_has_tracer(v, depth: int) -> bool:
    import dataclasses
    import types

    from jax.core import Tracer

    if isinstance(v, Tracer):
        return True
    if isinstance(v, types.FunctionType) or (
        dataclasses.is_dataclass(v) and not isinstance(v, type)
    ):
        return _closure_captures_tracer(v, depth)
    try:
        leaves = jtu.tree_leaves(v)
    except Exception:
        # Cannot prove the value is tracer-free: fail CONSERVATIVE. A
        # wrong True costs one handler-path fallback (slower, sound); a
        # wrong False silently reuses stale subtraces (wrong posterior).
        return True
    return any(isinstance(l, Tracer) for l in leaves)


def _closure_captures_tracer(obj, depth: int = 0) -> bool:
    """Does this callee reach a traced value through a PYTHON closure
    (``fn.__closure__`` cells), invisibly to the pytree system?

    A body that defines a local ``@gen`` function captures upstream
    sampled values in Python cells, not pytree leaves — the staged edit
    path cannot see those dependencies (the ``addr_call`` equation gets no
    input var for them), so it would silently reuse stale values. Such
    bodies must take the handler fallback, which re-executes the body.
    Pytree *leaves* (``Closure.dyn_args``) do not count: those ARE visible
    to staging.
    """
    import dataclasses
    import types

    if obj is None:
        return False
    if depth > 8:
        # Recursion budget exhausted before the scan finished: we could
        # NOT prove the closure is tracer-free, so the give-up answer must
        # be the conservative one — report a capture so the caller raises
        # ``StagingUnsupported`` and the edit takes the (sound) handler
        # fallback, instead of silently reusing stale subtraces.
        return True
    if isinstance(obj, types.FunctionType):
        for cell in obj.__closure__ or ():
            try:
                v = cell.cell_contents
            except ValueError:  # empty cell
                continue
            if _value_has_tracer(v, depth + 1):
                return True
        return False
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return any(
            _closure_captures_tracer(getattr(obj, f.name, None), depth + 1)
            for f in dataclasses.fields(obj)
        )
    if isinstance(obj, (tuple, list)):
        return any(_closure_captures_tracer(x, depth + 1) for x in obj)
    return False


class StageHandler(TraceHandler):
    """Binds every addressed call as an ``addr_call_p`` equation while the
    body is traced by ``make_jaxpr`` (the reference's ``trace_p`` embedding,
    static.py:156-252, reconstructed only for the edit path)."""

    def __init__(self):
        self.addresses: list = []

    def handle_trace(self, addr, gen_fn, args):
        if addr in self.addresses:
            raise AddressReuse(f"Address {addr!r} was traced twice.")
        if _closure_captures_tracer(gen_fn):
            raise StagingUnsupported(
                f"addressed callee at {addr!r} captures traced values "
                "through a Python closure (e.g. a local @gen function "
                "reading an upstream sample); the staged edit path cannot "
                "track that dependency — handler fallback"
            )
        self.addresses.append(addr)
        flat, in_tree = jtu.tree_flatten((gen_fn, args))
        ret_shape = jax.eval_shape(_abstract_retval, gen_fn, args)
        out_leaves, out_tree = jtu.tree_flatten(ret_shape)
        out_avals = tuple(ShapedArray(l.shape, l.dtype) for l in out_leaves)
        outs = addr_call_p.bind(
            *flat,
            addr=addr,
            in_tree=in_tree,
            out_tree=out_tree,
            out_avals=out_avals,
        )
        return jtu.tree_unflatten(out_tree, outs)


def _abstract_retval(gen_fn, args):
    # zero-FLOP shape evaluation of the callee's return value
    return gen_fn.simulate(jr.key(0), args).get_retval()


def _staged_body(source, args):
    """Module-level staging target so ``cached_stage_dynamic``'s lru key
    (fn, in_tree, avals) stays stable across calls."""
    h = StageHandler()
    with handle(h):
        return source(*args)


_STAGE_ERRORS = (
    jax.errors.TracerBoolConversionError,
    jax.errors.TracerArrayConversionError,
    jax.errors.TracerIntegerConversionError,
    jax.errors.ConcretizationTypeError,
)


# Bodies known to be unstageable (memoized per model function so every
# edit doesn't pay a doomed re-trace; failure reasons are structural, not
# value-dependent)
import weakref

_STAGE_FAILED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def stage_body(source, args):
    """Stage ``source(*args)`` with addressed calls embedded as equations.

    Returns ``(closed_jaxpr, flat_args, out_tree)``; raises
    ``StagingUnsupported`` for bodies that require concrete values or
    reach traced values through Python closures.
    """
    fn = getattr(source, "fn", None)
    if fn is not None and fn in _STAGE_FAILED:
        raise StagingUnsupported(_STAGE_FAILED[fn])
    try:
        return cached_stage_dynamic(_staged_body, source, args)
    except StagingUnsupported as e:
        if fn is not None:
            _STAGE_FAILED[fn] = str(e)
        raise
    except _STAGE_ERRORS as e:
        if fn is not None:
            _STAGE_FAILED[fn] = str(e)
        raise StagingUnsupported(str(e)) from e


# ----------------------------------------------------------------------
# change-tangent utilities
# ----------------------------------------------------------------------


# flat_changed moved to core.diff (shared with Dimap's pre/post change
# propagation); re-exported here for existing importers.
from ..core.diff import flat_changed  # noqa: E402, F401


def _tangent_tree(primal_tree, changed_leaves):
    """Rebuild a per-leaf tangent tree aligned with ``primal_tree``."""
    leaves, treedef = jtu.tree_flatten(primal_tree)
    assert len(leaves) == len(changed_leaves)
    return jtu.tree_unflatten(
        treedef,
        [UnknownChange if c else NoChange for c in changed_leaves],
    )


# ----------------------------------------------------------------------
# the incremental evaluator
# ----------------------------------------------------------------------


def incremental_edit(
    closed_jaxpr,
    flat_args: list,
    changed_in: list[bool],
    *,
    key,
    prev_trace,
    subrequest: Callable[[Any], EditRequest],
    is_trivial: Callable[[EditRequest], bool],
    consts_changed: bool = False,
):
    """Evaluate the staged body Jaxpr, editing addressed calls incrementally.

    Returns ``(out_flat, out_changed, weight, addresses, subtraces, bwd)``.
    """
    jaxpr = closed_jaxpr.jaxpr
    env: dict = {}
    chg: dict = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    def read_chg(v) -> bool:
        return False if isinstance(v, Literal) else chg[v]

    for v, c in zip(jaxpr.constvars, closed_jaxpr.consts):
        env[v] = c
        # consts come from the CURRENT source's Python closures; when the
        # callee's function object changed (fresh local @gen), their
        # values cannot be proven equal to the previous trace's
        chg[v] = bool(consts_changed)
    for v, a, c in zip(jaxpr.invars, flat_args, changed_in):
        env[v] = a
        chg[v] = bool(c)

    count = 0
    weight = jnp.asarray(0.0)
    addresses: list = []
    subtraces: list = []
    bwd: dict = {}

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        inchg = [read_chg(v) for v in eqn.invars]
        if eqn.primitive is addr_call_p:
            params = eqn.params
            addr = params["addr"]
            gen_fn, call_args = jtu.tree_unflatten(params["in_tree"], invals)
            request = subrequest(addr)
            sub_tr = prev_trace.get_inner_trace(addr)
            sub_key = jr.fold_in(key, count)
            count += 1
            if not any(inchg) and is_trivial(request):
                # unchanged inputs, trivial request: reuse without re-scoring
                new_tr = sub_tr
                retval = sub_tr.get_retval()
                out_changed = [False] * len(eqn.outvars)
                bwd[addr] = EmptyRequest()
            else:
                gf_tan, arg_tan = jtu.tree_unflatten(
                    params["in_tree"],
                    [UnknownChange if c else NoChange for c in inchg],
                )
                if any(
                    t is UnknownChange for t in jtu.tree_leaves(gf_tan)
                ):
                    # a changed closed-over value of the callee itself:
                    # argdiffs cannot express it — degrade all args
                    arg_tan = jtu.tree_map(
                        lambda _: UnknownChange, arg_tan
                    )
                argdiffs = Diff.tree_diff(call_args, arg_tan)
                # score the sub-edit under the CURRENT callee (its dynamic
                # closure leaves may have changed; the previous subtrace
                # carries the stale values)
                new_tr, w, retdiff, b = dispatch_edit(
                    gen_fn, sub_key, sub_tr, request, argdiffs
                )
                weight = weight + w
                bwd[addr] = b
                retval = Diff.tree_primal(retdiff)
                out_changed = flat_changed(retdiff)
            addresses.append(addr)
            subtraces.append(new_tr)
            out_flat = jtu.tree_leaves(retval)
            assert len(out_flat) == len(eqn.outvars), (
                f"addr_call {addr!r}: retval arity changed under edit"
            )
            for v, val, c in zip(eqn.outvars, out_flat, out_changed):
                env[v] = val
                chg[v] = bool(c)
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            ans = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            if not eqn.primitive.multiple_results:
                ans = [ans]
            c_out = any(inchg)
            for v, val in zip(eqn.outvars, ans):
                env[v] = val
                chg[v] = c_out

    out_flat = [read(v) for v in jaxpr.outvars]
    out_changed = [read_chg(v) for v in jaxpr.outvars]
    return out_flat, out_changed, weight, addresses, subtraces, bwd
