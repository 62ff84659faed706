"""Exact-inference testbed: generate HMM inference problems whose posterior
and data marginal are exactly known, for calibrating approximate inference.

Parity: reference ``/root/reference/src/genjax/_src/inference/
exact_testbed.py`` (91 LoC) — ``DiscreteHMMInferenceProblem`` :37,
``build_test_against_exact_inference`` :45.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..dists.discrete_hmm import DiscreteHMM, DiscreteHMMConfiguration


@Pytree.dataclass
class DiscreteHMMInferenceProblem(Pytree):
    initial_state: Any
    log_posterior: Any
    log_data_marginal: Any
    latent_sequence: Any
    observation_sequence: Any


def build_test_against_exact_inference(
    max_length: int,
    state_space_size: int,
    transition_distance_truncation: int,
    observation_distance_truncation: int,
    transition_variance: float,
    observation_variance: float,
) -> tuple[Callable[[PRNGKey], DiscreteHMMInferenceProblem], Any, DiscreteHMMConfiguration]:
    """Returns ``(problem_generator, markov_chain_model, config)``.

    The model is a scanned ``@gen`` markov chain with addresses
    ``(t, "z")`` (latents) and ``(t, "x")`` (observations), matching the
    reference's test model (exact_testbed.py:61-70).
    """
    from ..dists import categorical
    from ..lang.static_lang import gen
    from ..combinators.scan import ScanCombinator

    config = DiscreteHMMConfiguration(
        state_space_size,
        transition_distance_truncation,
        observation_distance_truncation,
        transition_variance,
        observation_variance,
    )
    transition = config.transition_tensor()
    observation = config.observation_tensor()

    @gen
    def kernel(state, _x):
        # host-numpy tensors become jaxpr constants here at trace
        # time (tracer indexing needs the jnp view)
        z = categorical(jnp.asarray(transition)[state, :]) @ "z"
        _ = categorical(jnp.asarray(observation)[z, :]) @ "x"
        return (z, None)

    markov_chain = ScanCombinator(kernel, length=max_length)

    def inference_test_generator(key: PRNGKey) -> DiscreteHMMInferenceProblem:
        key, k2 = jax.random.split(key)
        # The initial state is the FIXED grid midpoint — the same prior
        # ``DiscreteHMMConfiguration.log_initial`` bakes into the exact
        # forward filter — so the returned (initial_state, sequences,
        # log_posterior, log_data_marginal) all describe ONE model. The
        # reference samples initial_state uniformly (exact_testbed.py:71)
        # while its data_logpdf still assumes the midpoint prior, making
        # the problem's advertised initial_state inconsistent with its
        # exact values (ARCHITECTURE.md §Deviations).
        initial_state = jnp.asarray(config.linear_grid_dim // 2)
        tr = markov_chain.simulate(k2, (initial_state, jnp.zeros(max_length)))
        chm = tr.get_choices()
        latent_sequence = jnp.asarray(
            [chm[t, "z"] for t in range(max_length)]
        )
        observation_sequence = jnp.asarray(
            [chm[t, "x"] for t in range(max_length)]
        )
        log_data_marginal = DiscreteHMM.data_logpdf(config, observation_sequence)
        log_posterior = DiscreteHMM.estimate_logpdf(
            key, latent_sequence, config, observation_sequence
        )
        return DiscreteHMMInferenceProblem(
            initial_state,
            log_posterior,
            log_data_marginal,
            latent_sequence,
            observation_sequence,
        )

    return inference_test_generator, markov_chain, config
