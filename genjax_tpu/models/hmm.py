"""Discrete HMM model family, paired with the exact-inference machinery
(``genjax_tpu.dists.discrete_hmm``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..dists.discrete_hmm import DiscreteHMM, DiscreteHMMConfiguration
from ..lang.static_lang import gen


def discrete_hmm_model(config: DiscreteHMMConfiguration, max_length: int):
    """The scanned markov-chain model matching ``DiscreteHMM``'s exact
    posterior (addresses ``(t, "z")`` latent, ``(t, "x")`` observation).

    Returns ``(chain, config)``; use carry ``config.linear_grid_dim // 2``
    for consistency with the exact machinery's initial distribution."""
    from ..combinators.scan import ScanCombinator
    from ..dists import categorical

    transition = config.transition_tensor()
    observation = config.observation_tensor()

    @gen
    def kernel(state, _x):
        # host-numpy tensors become jaxpr constants here at trace
        # time (tracer indexing needs the jnp view)
        z = categorical(jnp.asarray(transition)[state, :]) @ "z"
        _ = categorical(jnp.asarray(observation)[z, :]) @ "x"
        return (z, None)

    return ScanCombinator(kernel, length=max_length), config
