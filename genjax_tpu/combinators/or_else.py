"""``or_else`` combinator: boolean-gated two-branch dispatch.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/or_else.py`` (84 LoC) — boolean → 2-branch switch via contramap
:77-84.

Call convention: ``or_else(if_fn, else_fn)(flag, if_args, else_args)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..generative.gfi import GenerativeFunction
from .dimap import DimapCombinator
from .switch import SwitchCombinator


def _pre(flag, if_args, else_args):
    # branch 0 = if (flag True), branch 1 = else. A concrete Python/numpy
    # bool stays a Python int index so the Switch keeps its concrete-index
    # fast path (only the selected branch compiles; get_inner_trace works).
    if isinstance(flag, (bool, np.bool_)):
        idx = 0 if flag else 1
    else:
        idx = jnp.astype(jnp.logical_not(flag), jnp.int32)
    return (idx, if_args, else_args)


def or_else(
    if_gen_fn: GenerativeFunction, else_gen_fn: GenerativeFunction
) -> GenerativeFunction:
    """Boolean-gated branching: args are ``(flag, if_args, else_args)``.

    >>> import jax
    >>> import genjax_tpu as g
    >>> oe = g.or_else(
    ...     g.gen(lambda: g.normal(0.0, 0.1) @ "x"),
    ...     g.gen(lambda: g.normal(100.0, 0.1) @ "x"),
    ... )
    >>> tr = oe.simulate(jax.random.key(0), (True, (), ()))
    >>> bool(tr.get_retval() < 50.0)   # flag=True took the if-branch
    True
    """
    switch_fn = SwitchCombinator((if_gen_fn, else_gen_fn))
    return DimapCombinator(switch_fn, pre=_pre, info="or_else")
