"""Unified warmup adaptation (inference/adaptation.py): shared by the
column kernels and the trace-based sharded drivers (VERDICT round-1 item 9).
"""

import jax
import jax.numpy as jnp

from genjax_tpu.inference.adaptation import (
    StepSizeAdaptState,
    cross_chain_inv_mass,
    dual_averaging_update,
    multiplicative_nudge,
    windowed_warmup,
)


def test_dual_averaging_converges_to_target():
    # accept-rate model: p(accept) = exp(-eps) (monotone in eps); dual
    # averaging should find eps with accept ~ target
    target = 0.65
    state = StepSizeAdaptState.init(0.05)
    for _ in range(200):
        eps = jnp.exp(state.log_eps)
        acc = jnp.exp(-eps)
        state = dual_averaging_update(state, acc, target_accept=target)
    eps_final = jnp.exp(state.log_eps_bar)
    assert jnp.allclose(jnp.exp(-eps_final), target, atol=0.05)


def test_multiplicative_nudge_direction():
    eps = jnp.asarray(0.1)
    assert multiplicative_nudge(eps, 0.95, target_accept=0.8) > eps
    assert multiplicative_nudge(eps, 0.5, target_accept=0.8) < eps


def test_cross_chain_inv_mass_floor():
    q = jnp.zeros((3, 100)).at[0].set(jnp.linspace(-1, 1, 100))
    im = cross_chain_inv_mass(q)
    assert im.shape == (3,)
    assert im[1] == 1e-6  # padding dims floored
    assert im[0] > 0.1


def test_windowed_warmup_is_one_compiled_program():
    # the schedule must be traceable end-to-end (single lax.scan, no host
    # sync inside)
    scales = jnp.array([0.1, 1.0, 4.0])

    def sweep(q, idx, eps, inv_mass):
        # fake sweep: move q toward the target scales, report an
        # eps-dependent accept rate
        k = jax.random.fold_in(jax.random.key(0), idx)
        q = 0.5 * q + scales[:, None] * jax.random.normal(k, q.shape)
        return q, jnp.exp(-eps)

    run = jax.jit(
        lambda q0: windowed_warmup(sweep, q0, n_windows=5, eps0=0.3)
    )
    q, eps, inv_mass, accs = run(jnp.zeros((3, 512)))
    assert accs.shape == (5,)
    assert inv_mass.shape == (3,)
    # inv_mass tracks the cross-chain variances, ordered like the scales
    assert inv_mass[0] < inv_mass[1] < inv_mass[2]
