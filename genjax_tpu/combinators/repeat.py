"""``repeat`` combinator: n i.i.d. copies of a generative function.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/repeat.py`` (79 LoC) — contramap + ``vmap(in_axes=(0, None))``
over a dummy ``jnp.zeros(n)`` :28-40. Addresses gain a leading integer
component (the repetition index).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..generative.gfi import GenerativeFunction
from .dimap import DimapCombinator
from .vmap import VmapCombinator


def repeat(*, n: int):
    """``repeat(n=n)(gen_fn)``: a gen fn with the same argument signature
    whose choices/retval carry a leading axis of ``n`` i.i.d. repetitions.

    >>> import jax
    >>> import genjax_tpu as g
    >>> one = g.gen(lambda: g.normal(0.0, 1.0) @ "v")
    >>> tr = g.repeat(n=4)(one).simulate(jax.random.key(0), ())
    >>> tr.get_retval().shape
    (4,)
    >>> tr.get_choices()[2, "v"].shape
    ()
    """

    def decorator(gen_fn: GenerativeFunction):
        # Inner shape: (dummy_lane, packed_args) — dummy mapped, args shared.
        unpacked = DimapCombinator(
            gen_fn,
            pre=lambda _dummy, packed: packed,
            info=f"repeat(n={n}): unpack shared args",
        )
        vmapped = VmapCombinator(unpacked, in_axes=(0, None))
        return DimapCombinator(
            vmapped,
            pre=lambda *args: (jnp.zeros(n), args),
            info=f"repeat(n={n}): attach dummy axis",
        )

    return decorator
