"""Time-travel debugger: step through, rewind, and re-mix a computation at
user-tagged record points.

Parity: reference ``/root/reference/src/genjax/_src/core/compiler/
interpreters/time_travel.py`` (295 LoC) — ``record_p`` :42, ``rec``/``tag``
:82-96, the hybrid CPS interpreter :105, ``TimeTravelingDebugger`` :202
(``fwd``/``bwd``/``jump``/``remix``), ``time_machine`` :287.

Design difference: the reference collects frames by re-running the CPS
interpreter over the WHOLE program once per record point; this
implementation snapshots an environment-backed continuation at each point
and unfolds forward, so collecting frame k re-executes only the program
SUFFIX after point k (and environments are shared structurally). Total
cost is the sum of suffix lengths — at most half the reference's
full-program re-runs, identical frames.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.tree_util as jtu

from ..core.environment import Environment
from ..core.pytree import Closure, Pytree
from ..core.primitive import initial_style_bind, initial_style_primitive

record_p = initial_style_primitive("record")


@Pytree.dataclass
class FrameRecording(Pytree):
    """One captured moment: the recorded callable, its arguments, its local
    return value, and the continuation resuming the rest of the program."""

    f: Callable = Pytree.static()
    args: tuple
    local_retval: Any
    cont: Callable = Pytree.static()
    debug_tag: str | None = Pytree.static(default=None)


def rec(fn: Callable, debug_tag: str | None = None) -> Callable:
    """Mark ``fn`` as a record point: each call captures a resumable frame
    (reference time_travel.py:82)."""
    closure = fn if isinstance(fn, Closure) else Closure((), fn)

    def recorded(*args):
        def call(closure, *args):
            return closure(*args)

        # the closure flows as a traced operand (its dynamic closed-over args
        # are invars; the callable rides in the in_tree treedef)
        return initial_style_bind(record_p, debug_tag=debug_tag)(call)(
            closure, *args
        )

    return recorded


def tag(v: Any, name: str | None = None) -> Any:
    """Record the identity function on ``v`` — a pure breakpoint
    (reference time_travel.py:96)."""
    return rec(lambda x: x, name)(v)


# ----------------------------------------------------------------------
# the one-pass CPS walk
# ----------------------------------------------------------------------


def _step(f: Callable, *args):
    """Evaluate ``f`` up to its FIRST record point. Returns
    ``(final_retval, None)`` if no record point fires, else
    ``(final_retval, (tag, frame))`` where ``frame.cont`` resumes after the
    point (and, when re-staged by ``_collect``, surfaces the next point —
    nested points unfold one level per step, as in the reference)."""
    flat_args, in_tree = jtu.tree_flatten(args)
    closed_jaxpr, out_shape = jax.make_jaxpr(
        lambda *flat: f(*jtu.tree_unflatten(in_tree, flat)),
        return_shape=True,
    )(*flat_args)
    out_tree = jtu.tree_structure(out_shape)
    jaxpr = closed_jaxpr.jaxpr

    def run(eqns, env: Environment, invars, flat_vals, first: bool):
        for var, val in zip(invars, flat_vals):
            env.write(var, val)
        for i, eqn in enumerate(eqns):
            in_vals = [env.read(v) for v in eqn.invars]
            if eqn.primitive is record_p:
                dtag = eqn.params["debug_tag"]
                closure, *point_args = jtu.tree_unflatten(
                    eqn.params["in_tree"], in_vals
                )
                if first:
                    snapshot = env.copy()
                    rest = eqns[i + 1 :]
                    ov = eqn.outvars

                    def cont(*new_args, _c=closure, _rest=rest, _s=snapshot, _ov=ov):
                        # re-executes the recorded call and the rest of the
                        # program; record points re-bind, so re-staging this
                        # continuation exposes them
                        ret = _c(*new_args)
                        out, _ = run(
                            _rest, _s.copy(), _ov, jtu.tree_leaves(ret), False
                        )
                        return out

                    # run the recorded call ONCE and the suffix ONCE
                    # (calling cont here would re-execute the closure a
                    # second time)
                    local_ret = closure(*point_args)
                    final, _ = run(
                        rest, snapshot.copy(), ov,
                        jtu.tree_leaves(local_ret), False,
                    )
                    frame = FrameRecording(
                        closure, tuple(point_args), local_ret, cont, dtag
                    )
                    return final, (dtag, frame)
                # rebind mode: re-issue the primitive (eager execution runs
                # the closure; staging re-embeds the record point)
                ret = rec(closure, dtag)(*point_args)
                outs = jtu.tree_leaves(ret)
            else:
                subfuns, params = eqn.primitive.get_bind_params(eqn.params)
                outs = eqn.primitive.bind(*subfuns, *in_vals, **params)
                if not eqn.primitive.multiple_results:
                    outs = [outs]
            for var, val in zip(eqn.outvars, outs):
                env.write(var, val)
        out_vals = [env.read(v) for v in jaxpr.outvars]
        return jtu.tree_unflatten(out_tree, out_vals), None

    env = Environment()
    for var, const in zip(jaxpr.constvars, closed_jaxpr.consts):
        env.write(var, const)
    return run(jaxpr.eqns, env, jaxpr.invars, flat_args, first=True)


def _collect(f: Callable, *args) -> tuple[Any, list[FrameRecording]]:
    """Unfold all record points: step to the first point, then repeatedly
    re-stage each continuation to surface the next one."""
    retval, nxt = _step(f, *args)
    frames: list[FrameRecording] = []
    while nxt is not None:
        _tag, frame = nxt
        frames.append(frame)
        retval, nxt = _step(frame.cont, *frame.args)
    return retval, frames


class TimeTravelingDebugger:
    """A navigable recording: ``fwd``/``bwd`` step between frames, ``jump``
    goes to a tag, ``remix`` re-executes from the current frame with new
    arguments (reference time_travel.py:202).

    A host-side navigation object, deliberately NOT a Pytree: its frame
    list holds continuations and array snapshots that belong in neither
    static treedef metadata (unhashable) nor traced leaves (callables).
    """

    def __init__(self, final_retval, sequence, jump_points, ptr: int = 0):
        self.final_retval = final_retval
        self.sequence = list(sequence)
        self.jump_points = dict(jump_points)
        self.ptr = ptr

    def frame(self) -> tuple[str | None, FrameRecording]:
        frame = self.sequence[self.ptr]
        return frame.debug_tag, frame

    def summary(self):
        return self.final_retval, self.frame()

    def _at(self, ptr: int) -> "TimeTravelingDebugger":
        return TimeTravelingDebugger(
            self.final_retval, self.sequence, self.jump_points, ptr
        )

    def fwd(self) -> "TimeTravelingDebugger":
        return self if self.ptr + 1 >= len(self.sequence) else self._at(self.ptr + 1)

    def bwd(self) -> "TimeTravelingDebugger":
        return self if self.ptr == 0 else self._at(self.ptr - 1)

    def jump(self, debug_tag: str) -> "TimeTravelingDebugger":
        return self._at(self.jump_points[debug_tag])

    def remix(self, *args) -> "TimeTravelingDebugger":
        """Re-execute from the current frame with new arguments; frames after
        this point are re-recorded, frames before are kept."""
        frame = self.sequence[self.ptr]
        local_retval = frame.f(*args)

        def resumed(*args):
            return frame.cont(*args)

        new_final, new_frames = _collect(resumed, *args)
        new_frame = FrameRecording(
            frame.f, args, local_retval, frame.cont, frame.debug_tag
        )
        sequence = [*self.sequence[: self.ptr], new_frame, *new_frames]
        jump_points = {
            f.debug_tag: i
            for i, f in enumerate(sequence)
            if f.debug_tag is not None
        }
        return TimeTravelingDebugger(new_final, sequence, jump_points, self.ptr)

    def __call__(self, *args) -> "TimeTravelingDebugger":
        return self.remix(*args)


def time_machine(source: Callable) -> Callable:
    """Instrument ``source`` and return ``f(*args) -> TimeTravelingDebugger``
    with implicit entry/exit record points (reference time_travel.py:287)."""

    def instrumented(*args):
        return tag(rec(source, "_enter")(*args), "_exit")

    def build(*args) -> TimeTravelingDebugger:
        final, frames = _collect(instrumented, *args)
        jump_points = {
            f.debug_tag: i
            for i, f in enumerate(frames)
            if f.debug_tag is not None
        }
        return TimeTravelingDebugger(final, frames, jump_points, 0)

    return build
