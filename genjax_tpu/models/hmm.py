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


def dense_hmm_model(log_pi, log_trans, log_obs, length: int):
    """A ``@gen`` scanned model for an ARBITRARY dense HMM, matching the
    ``dists.hmm_tools`` convention exactly (``log_pi (N,)``,
    ``log_trans (N, N)`` rows, ``log_obs (N, M)`` rows): the first latent
    draws from ``log_pi`` (carry −1 selects it), then transitions.
    Addresses: ``(t, "z")`` latent, ``(t, "y")`` observation; constrain
    with ``C[:, "y"].set(ys)``.

    Pairs with ``hmm_log_marginal`` / ``forward_backward`` / ``viterbi``
    / ``hmm_posterior_sample`` for exact answers; returns the scanned
    model (run with initial carry ``-1`` and ``xs = None, n_steps=length``
    or ``jnp.zeros(length)``)."""
    from ..combinators.scan import ScanCombinator
    from ..dists import categorical

    log_pi = jnp.asarray(log_pi)
    log_trans = jnp.asarray(log_trans)
    log_obs = jnp.asarray(log_obs)
    # row -1 of the stacked table is the initial distribution
    table = jnp.concatenate([log_trans, log_pi[None]], axis=0)

    @gen
    def kernel(state, _x):
        z = categorical(table[state, :]) @ "z"
        y = categorical(log_obs[z, :]) @ "y"
        return (z, y)

    return ScanCombinator(kernel, length=length)
