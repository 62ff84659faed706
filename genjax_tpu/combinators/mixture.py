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
    from ..dists import categorical
    from ..lang.static_lang import gen

    switch_fn = SwitchCombinator(tuple(gen_fns))

    @gen
    def mixture_model(logits, *args):
        mix_idx = categorical(logits) @ "mixture_component"
        return switch_fn(mix_idx, *args) @ "component_sample"

    return mixture_model
