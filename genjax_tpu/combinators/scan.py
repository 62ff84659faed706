"""``Scan`` combinator: sequential structure compiled to ``jax.lax.scan``.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/scan.py`` (1150 LoC) — ``ScanTrace`` :56, ``simulate`` :200,
``generate`` :237, ``project`` :296, ``assess`` :638, ``edit_update`` :509,
``edit_regenerate`` :418, ``edit_index`` :325 (O(1) single-slice update with
next-slice weight fixup), decorators ``scan`` :672, ``accumulate`` :791,
``reduce`` :854, ``iterate`` :916, ``iterate_final`` :980, ``masked_iterate``
:1101, ``masked_iterate_final`` :1050, ``prepend_initial_acc`` :762.

TPU-first notes: the whole sequence runs inside a single XLA while-loop
(``lax.scan``), the stacked inner trace is contiguous in HBM (time axis in
front), and ``edit_index`` costs two dynamic slices + two dynamic-update
slices per leaf regardless of sequence length.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.tree_util as jtu
from jax import lax

from ..core.diff import Diff
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap, IndexedChm
from ..generative.concepts import (
    dispatch_edit,
    EditRequest,
    IndexRequest,
    NotSupportedEditRequest,
    Regenerate,
    Retdiff,
    Update,
    VectorRequest,
    Weight,
)
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection
from ..generative.trace import Trace


@Pytree.dataclass
class ScanTrace(Trace):
    """Trace of a scanned kernel: one inner trace pytree with the time axis
    leading every leaf (reference scan.py:56)."""

    gen_fn: "ScanCombinator"
    inner: Trace
    args: tuple
    retval: Any  # (final_carry, stacked_ys)
    length: int = Pytree.static()

    def get_args(self) -> tuple:
        return self.args

    def get_retval(self) -> Any:
        return self.retval

    def get_gen_fn(self) -> "ScanCombinator":
        return self.gen_fn

    def get_score(self):
        return jnp.sum(jax.vmap(lambda tr: tr.get_score())(self.inner))

    def get_choices(self) -> ChoiceMap:
        return IndexedChm.build(self.inner.get_choices(), None)

    def get_inner_trace(self, address) -> Trace:
        return jtu.tree_map(lambda v: v[address], self.inner)


@Pytree.dataclass
class ScanCombinator(GenerativeFunction):
    """Lift a kernel ``(carry, x) -> (carry, y)`` to
    ``(carry, [x]) -> (carry, [y])`` via ``jax.lax.scan``
    (reference scan.py:110)."""

    gen_fn: GenerativeFunction
    length: int | None = Pytree.static(default=None)

    def _static_length(self, xs) -> int:
        if xs is not None:
            for leaf in jtu.tree_leaves(xs):
                return jnp.shape(leaf)[0]
        if self.length is None:
            raise ValueError(
                "scan: no `n` given and the scanned input is None — the "
                "sequence length cannot be inferred."
            )
        return self.length

    # ------------------------------------------------------------------
    # GFI
    # ------------------------------------------------------------------

    def simulate(self, key: PRNGKey, args: tuple) -> ScanTrace:
        init, xs = args
        n = self._static_length(xs)

        def step(c, inp):
            t, x = inp
            tr = self.gen_fn.simulate(jr.fold_in(key, t), (c, x))
            c_new, y = tr.get_retval()
            return c_new, (tr, y)

        c_final, (inner, ys) = lax.scan(step, init, (jnp.arange(n), xs), length=n)
        return ScanTrace(self, inner, args, (c_final, ys), n)

    def generate(self, key: PRNGKey, constraint: ChoiceMap, args: tuple):
        init, xs = args
        n = self._static_length(xs)

        def step(c, inp):
            t, x = inp
            submap = constraint.get_submap(t)
            tr, w = self.gen_fn.generate(jr.fold_in(key, t), submap, (c, x))
            c_new, y = tr.get_retval()
            return c_new, (tr, y, w)

        c_final, (inner, ys, ws) = lax.scan(step, init, (jnp.arange(n), xs), length=n)
        return ScanTrace(self, inner, args, (c_final, ys), n), jnp.sum(ws)

    def assess(self, chm: ChoiceMap, args: tuple):
        init, xs = args
        n = self._static_length(xs)

        def step(c, inp):
            t, x = inp
            score, (c_new, y) = self.gen_fn.assess(chm.get_submap(t), (c, x))
            return c_new, (score, y)

        c_final, (scores, ys) = lax.scan(step, init, (jnp.arange(n), xs), length=n)
        return jnp.sum(scores), (c_final, ys)

    def project(self, key: PRNGKey, trace: ScanTrace, selection: Selection) -> Weight:
        n = trace.length

        def step(_, inp):
            t, sub_tr = inp
            w = self.gen_fn.project(
                jr.fold_in(key, t), sub_tr, selection.get_subselection(t)
            )
            return None, w

        _, ws = lax.scan(step, None, (jnp.arange(n), trace.inner), length=n)
        return jnp.sum(ws)

    # ------------------------------------------------------------------
    # edits
    # ------------------------------------------------------------------

    def edit(
        self,
        key: PRNGKey,
        trace: ScanTrace,
        request: EditRequest,
        argdiffs: Any,
    ) -> tuple[ScanTrace, Weight, Retdiff, EditRequest]:
        if isinstance(request, Update):
            fast = self._try_edit_update_sparse(key, trace, request, argdiffs)
            if fast is not None:
                return fast
            return self._edit_dense(
                key, trace, argdiffs,
                lambda t: Update(request.constraint.get_submap(t)),
            )
        if isinstance(request, Regenerate):
            return self._edit_dense(
                key, trace, argdiffs,
                lambda t: Regenerate(request.selection.get_subselection(t)),
            )
        if isinstance(request, IndexRequest):
            return self._edit_index(
                key, trace, request.index, request.request, argdiffs
            )
        if isinstance(request, VectorRequest):
            return self._edit_dense(
                key, trace, argdiffs,
                lambda t: jtu.tree_map(lambda v: v[t], request.request),
            )
        raise NotSupportedEditRequest(
            f"ScanCombinator cannot serve {type(request).__name__}."
        )

    def _try_edit_update_sparse(self, key, trace: ScanTrace, request: Update, argdiffs):
        """O(k) Update of k constrained slices of a T-step scan (VERDICT
        round-1 item 1; reference analog: edit_index scan.py:325 generalized
        to index *sets*).

        Applies when (i) the scan's arguments are unchanged, (ii) the
        constraint addresses a strict subset of slices through a
        sparsely-indexed ``IndexedChm``, and (iii) the kernel's edit leaves
        its carry output unchanged (checked *statically* via the retdiff the
        kernel's incremental edit reports — e.g. updating an observation
        address that the carry does not depend on). Then no slice interacts
        with any other: gather the k slice traces, edit them under ``vmap``,
        scatter back. Returns None when inapplicable (caller falls back to
        the dense O(T) walk).
        """
        constraint = request.constraint
        if not Diff.static_check_no_change(argdiffs):
            return None
        if not isinstance(constraint, IndexedChm) or constraint.idx is None:
            return None
        idx = constraint.idx
        scalar = jnp.ndim(idx) == 0
        idx_arr = jnp.atleast_1d(jnp.asarray(idx))
        k = idx_arr.shape[0]
        n = trace.length

        # A sparsely-indexed map already stores its k per-slice submaps with
        # the index axis leading every leaf — vmap over it directly.
        if scalar:
            submaps = jtu.tree_map(
                lambda v: jnp.asarray(v)[None], constraint.inner
            )
        else:
            submaps = jtu.tree_map(lambda v: jnp.asarray(v), constraint.inner)

        slice_trs = jtu.tree_map(lambda v: v[idx_arr], trace.inner)
        keys = jax.vmap(lambda i: jr.fold_in(key, i))(idx_arr)

        def edit_one(k_, tr_, chm_):
            # score under the combinator's CURRENT kernel (the slice
            # trace's recorded gen_fn may carry stale closure leaves)
            return dispatch_edit(
                self.gen_fn, k_, tr_, Update(chm_),
                Diff.tree_diff_no_change(tr_.get_args()),
            )

        new_slices, ws, retdiffs, bwds = jax.vmap(edit_one)(
            keys, slice_trs, submaps
        )
        carry_rd, y_rd = retdiffs
        if not Diff.static_check_no_change(carry_rd):
            # the edit perturbs the carry chain: slice-local editing is
            # unsound, take the dense walk
            return None

        new_inner = jtu.tree_map(
            lambda v, s: v.at[idx_arr].set(s), trace.inner, new_slices
        )
        old_carry_out, old_ys = trace.get_retval()
        new_y = Diff.tree_primal(y_rd)
        new_ys = jtu.tree_map(
            lambda old, new: old.at[idx_arr].set(new), old_ys, new_y
        )
        new_tr = ScanTrace(self, new_inner, trace.args, (old_carry_out, new_ys), n)

        bwd_idx = idx if scalar else idx_arr
        if isinstance(bwds, Update):
            bwd_constraint = bwds.constraint
            if scalar:
                bwd_constraint = jtu.tree_map(lambda v: v[0], bwd_constraint)
            bwd_req: EditRequest = Update(
                IndexedChm.build(bwd_constraint, bwd_idx)
            )
        else:  # pragma: no cover — Update sub-edits return Update bwds
            bwd_req = VectorRequest(bwds)
        retdiff = (
            Diff.no_change(old_carry_out),
            Diff.unknown_change(new_ys),
        )
        return new_tr, jnp.sum(ws), retdiff, bwd_req

    def _edit_dense(self, key, trace: ScanTrace, argdiffs, subrequest_at):
        """O(T) full re-walk serving Update/Regenerate/VectorRequest: each
        step edits the old slice trace under the (possibly changed) carry
        (reference edit_update scan.py:509 / edit_regenerate :418)."""
        primals = Diff.tree_primal(argdiffs)
        init, xs = primals
        n = trace.length

        def step(c, inp):
            t, x, sub_tr = inp
            sub_argdiffs = Diff.tree_diff_unknown_change((c, x))
            new_tr, w, _rd, bwd = dispatch_edit(
                self.gen_fn, jr.fold_in(key, t), sub_tr, subrequest_at(t),
                sub_argdiffs,
            )
            c_new, y = new_tr.get_retval()
            return c_new, (new_tr, y, w, bwd)

        c_final, (inner, ys, ws, bwds) = lax.scan(
            step, init, (jnp.arange(n), xs, trace.inner), length=n
        )
        new_tr = ScanTrace(self, inner, primals, (c_final, ys), n)
        retdiff = Diff.tree_diff_unknown_change((c_final, ys))
        # backward request: Updates keep the dense-choice-map form (the
        # usual `discard`); anything else is carried losslessly per step
        if isinstance(bwds, Update):
            bwd_req: EditRequest = Update(IndexedChm.build(bwds.constraint, None))
        else:
            bwd_req = VectorRequest(bwds)
        return new_tr, jnp.sum(ws), retdiff, bwd_req

    def _edit_index(self, key, trace: ScanTrace, idx, request: EditRequest, argdiffs):
        """O(1) single-timestep edit (reference edit_index scan.py:325).

        Edits slice ``idx``, then re-scores slice ``idx+1`` under the new
        carry (an empty Update) to fix its weight. The carry flowing out of
        slice ``idx+1`` must be unchanged — i.e. the kernel's carry must not
        depend on the edited choices beyond one step.
        """
        if not Diff.static_check_no_change(argdiffs):
            raise NotSupportedEditRequest(
                "IndexRequest into Scan requires unchanged arguments."
            )
        n = trace.length
        idx = jnp.asarray(idx)
        old_carry_out, old_ys = trace.get_retval()

        slice_tr = jtu.tree_map(lambda v: v[idx], trace.inner)
        new_slice, w, retdiff, bwd = dispatch_edit(
            self.gen_fn, key, slice_tr, request,
            Diff.tree_diff_no_change(slice_tr.get_args()),
        )
        carry_rd, y_rd = retdiff

        # Fix up the following slice's score under the changed carry.
        nxt = jnp.clip(idx + 1, 0, n - 1)
        next_slice = jtu.tree_map(lambda v: v[nxt], trace.inner)
        (_c, next_x) = next_slice.get_args()
        next_new, next_w, next_rd, _ = dispatch_edit(
            self.gen_fn, jr.fold_in(key, 1), next_slice,
            Update(ChoiceMap.empty()), (carry_rd, Diff.no_change(next_x)),
        )
        # The carry flowing out of slice idx+1 must equal the old one — the
        # edit's locality assumption. Checked at runtime under
        # `do_checkify()` (the reference asserts this statically via its
        # incremental interpreter; our handler-based edits are conservative
        # about retdiffs, so the check is a value check).
        from ..checkify import optional_check

        def _carry_check():
            import jax.experimental.checkify as cf

            old_next_carry, _ = next_slice.get_retval()
            new_next_carry = Diff.tree_primal(next_rd[0])
            same = jnp.all(
                jnp.asarray([
                    jnp.all(jnp.isclose(jnp.asarray(a), jnp.asarray(b)))
                    for a, b in zip(
                        jtu.tree_leaves(old_next_carry),
                        jtu.tree_leaves(new_next_carry),
                    )
                ])
            )
            cf.check(
                jnp.logical_or(~has_next, same),
                "IndexRequest into Scan: the carry changed beyond one step.",
            )

        has_next = idx + 1 < n
        optional_check(_carry_check)

        new_inner = jtu.tree_map(
            lambda v, s: v.at[idx].set(s), trace.inner, new_slice
        )
        new_inner = jtu.tree_map(
            lambda v, s: v.at[nxt].set(jnp.where(has_next, s, v[nxt])),
            new_inner,
            next_new,
        )

        # Retval: ys gets the edited slice's y at position idx; the final
        # carry changes only if idx was the last step.
        new_y = Diff.tree_primal(y_rd)
        t_axis = jnp.arange(n)

        def splice(old, new):
            pred = (t_axis == idx).reshape((n,) + (1,) * (jnp.ndim(old) - 1))
            return jnp.where(pred, new, old)

        new_ys = jtu.tree_map(splice, old_ys, new_y)

        # Slice idx+1 re-ran under the changed carry: only its carry OUT
        # is pinned by the locality check — its y output may legitimately
        # change (e.g. a kernel whose y reads the incoming carry), so it
        # must be spliced into the stacked retval too or the trace's
        # retval goes stale against its inner traces.
        next_y = Diff.tree_primal(next_rd[1])

        def splice_next(old, new):
            pred = jnp.logical_and(has_next, t_axis == nxt).reshape(
                (n,) + (1,) * (jnp.ndim(old) - 1)
            )
            return jnp.where(pred, new, old)

        new_ys = jtu.tree_map(splice_next, new_ys, next_y)
        new_carry_out = jtu.tree_map(
            lambda old, new: jnp.where(idx == n - 1, new, old),
            old_carry_out,
            Diff.tree_primal(carry_rd),
        )
        new_tr = ScanTrace(
            self, new_inner, trace.args, (new_carry_out, new_ys), n
        )
        weight = w + jnp.where(has_next, next_w, 0.0)
        retdiff_out = (
            Diff.unknown_change(new_carry_out),
            Diff.unknown_change(new_ys),
        )
        return new_tr, weight, retdiff_out, IndexRequest(idx, bwd)


# ----------------------------------------------------------------------
# decorators (reference scan.py:672-1150)
# ----------------------------------------------------------------------


def scan(*, n: int | None = None):
    """``(c, a) -> (c, b)`` kernel ⇒ ``(c, [a]) -> (c, [b])``
    (reference scan.py:672).

    The kernel's choices stack along a leading time axis; index into them
    with the timestep:

    >>> import jax
    >>> import jax.numpy as jnp
    >>> import genjax_tpu as g
    >>> @g.scan(n=5)
    ... @g.gen
    ... def walk(pos, _):
    ...     step = g.normal(pos, 1.0) @ "step"
    ...     return step, pos
    >>> tr = walk.simulate(jax.random.key(0), (0.0, None))
    >>> tr.get_choices()[2, "step"].shape   # index by timestep
    ()
    >>> final, history = tr.get_retval()
    >>> history.shape
    (5,)
    """

    def decorator(gen_fn: GenerativeFunction) -> ScanCombinator:
        return ScanCombinator(gen_fn, length=n)

    return decorator


def prepend_initial_acc(args, ret):
    """Prepend the initial accumulator to the stacked accumulator outputs
    (reference scan.py:762)."""
    init_acc = args[0]
    accs = ret

    def cat(init, rest):
        return jnp.concatenate([jnp.asarray(init)[None], rest], axis=0)

    return jtu.tree_map(cat, init_acc, accs)


def accumulate():
    """``(c, a) -> c`` kernel ⇒ ``(c, [a]) -> [c]`` (all intermediate
    accumulations, initial included — like ``itertools.accumulate``;
    reference scan.py:791)."""

    def decorator(gen_fn: GenerativeFunction):
        return (
            gen_fn.map(lambda c: (c, c), info="accumulate: dup carry")
            .scan()
            .dimap(
                pre=lambda *args: args,
                post=lambda args, ret: prepend_initial_acc(args, ret[1]),
                info="accumulate: prepend initial",
            )
        )

    return decorator


def reduce():
    """``(c, a) -> c`` kernel ⇒ ``(c, [a]) -> c`` (final accumulation only —
    like ``functools.reduce``; reference scan.py:854)."""

    def decorator(gen_fn: GenerativeFunction):
        return (
            gen_fn.map(lambda c: (c, None), info="reduce: carry only")
            .scan()
            .map(lambda ret: ret[0], info="reduce: final carry")
        )

    return decorator


def iterate(*, n: int):
    """``a -> a`` kernel ⇒ ``a -> [a]`` — n applications, all n+1 states
    (reference scan.py:916)."""

    def decorator(gen_fn: GenerativeFunction):
        return (
            gen_fn.dimap(
                pre=lambda c, _x: (c,),
                post=lambda _args, c: (c, c),
                info="iterate: ignore scan input",
            )
            .scan(n=n)
            .dimap(
                pre=lambda c: (c, None),
                post=lambda args, ret: prepend_initial_acc(args, ret[1]),
                info="iterate: prepend initial",
            )
        )

    return decorator


def iterate_final(*, n: int):
    """``a -> a`` kernel ⇒ ``a -> a`` — n applications, final state only
    (reference scan.py:980)."""

    def decorator(gen_fn: GenerativeFunction):
        return (
            gen_fn.dimap(
                pre=lambda c, _x: (c,),
                post=lambda _args, c: (c, None),
                info="iterate_final: ignore scan input",
            )
            .scan(n=n)
            .dimap(
                pre=lambda c: (c, None),
                post=lambda _args, ret: ret[0],
                info="iterate_final: final carry",
            )
        )

    return decorator


def masked_iterate():
    """``a -> a`` kernel ⇒ ``(a, [flag]) -> [a]``: dynamic-length iteration
    inside fixed shapes — step t applies the kernel only where ``flag[t]``
    (reference scan.py:1101)."""

    def decorator(gen_fn: GenerativeFunction):
        from .mask_comb import MaskCombinator

        masked = MaskCombinator(
            gen_fn.dimap(
                pre=lambda c: (c,),
                post=lambda _args, c: c,
                info="masked_iterate: kernel",
            )
        )

        def step_pre(c, flag):
            return (flag, c)

        def step_post(args, masked_ret):
            (c, _flag) = args
            new_c = masked_ret.unmask(default=c)
            return (new_c, new_c)

        step = masked.dimap(pre=step_pre, post=step_post, info="masked_iterate: step")
        return step.scan().dimap(
            pre=lambda *args: args,
            post=lambda args, ret: prepend_initial_acc(args, ret[1]),
            info="masked_iterate: prepend initial",
        )

    return decorator


def masked_iterate_final():
    """``a -> a`` kernel ⇒ ``(a, [flag]) -> a``: dynamic-length iteration,
    final state only (reference scan.py:1050)."""

    def decorator(gen_fn: GenerativeFunction):
        from .mask_comb import MaskCombinator

        masked = MaskCombinator(
            gen_fn.dimap(
                pre=lambda c: (c,),
                post=lambda _args, c: c,
                info="masked_iterate_final: kernel",
            )
        )

        def step_pre(c, flag):
            return (flag, c)

        def step_post(args, masked_ret):
            (c, _flag) = args
            new_c = masked_ret.unmask(default=c)
            return (new_c, None)

        step = masked.dimap(
            pre=step_pre, post=step_post, info="masked_iterate_final: step"
        )
        return step.scan().map(lambda ret: ret[0], info="masked_iterate_final: final")

    return decorator
