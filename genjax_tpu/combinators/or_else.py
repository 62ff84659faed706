"""``or_else`` combinator: boolean-gated two-branch dispatch.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/or_else.py`` (84 LoC) — boolean → 2-branch switch via contramap
:77-84.

Call convention: ``or_else(if_fn, else_fn)(flag, if_args, else_args)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..generative.gfi import GenerativeFunction
from .dimap import DimapCombinator
from .switch import SwitchCombinator


def or_else(
    if_gen_fn: GenerativeFunction, else_gen_fn: GenerativeFunction
) -> GenerativeFunction:
    switch_fn = SwitchCombinator((if_gen_fn, else_gen_fn))
    return DimapCombinator(
        switch_fn,
        # branch 0 = if (flag True), branch 1 = else
        pre=lambda flag, if_args, else_args: (
            jnp.astype(jnp.logical_not(flag), jnp.int32),
            if_args,
            else_args,
        ),
        info="or_else",
    )
