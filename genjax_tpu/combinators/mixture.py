"""``mix`` combinator: a mixture model over component generative functions.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/mixture.py`` (81 LoC) — an ``@gen`` model sampling
``categorical(logits) @ "mixture_component"`` then dispatching the component
via ``switch(...) @ "component_sample"`` :74-81.

Call convention: ``mix(f1, ..., fn)(logits, args_1, ..., args_n)``.
"""

from __future__ import annotations

from ..generative.gfi import GenerativeFunction
from .switch import SwitchCombinator


def mix(*gen_fns: GenerativeFunction) -> GenerativeFunction:
    """Mixture over component generative functions:
    ``mix(f1, ..., fn)(logits, args_1, ..., args_n)``.

    >>> import jax
    >>> import jax.numpy as jnp
    >>> import genjax_tpu as g
    >>> mx = g.mix(
    ...     g.gen(lambda: g.normal(-2.0, 0.5) @ "x"),
    ...     g.gen(lambda: g.normal(2.0, 0.5) @ "x"),
    ... )
    >>> tr = mx.simulate(
    ...     jax.random.key(0), (jnp.log(jnp.array([0.5, 0.5])), (), ())
    ... )
    >>> tr.get_choices().static_addresses()
    ('mixture_component', 'component_sample')
    """
    from ..dists import categorical
    from ..lang.static_lang import gen

    switch_fn = SwitchCombinator(tuple(gen_fns))

    @gen
    def mixture_model(logits, *args):
        mix_idx = categorical(logits) @ "mixture_component"
        return switch_fn(mix_idx, *args) @ "component_sample"

    return mixture_model
