"""End-to-end DP-mixture inference (BASELINE.json config): SMC init +
Gibbs-style rejuvenation (per-point assignment MH, HMC on means) recovers
well-separated clusters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g

K = 6
N_DATA = 30
SIGMA_OBS = 0.4


@g.gen
def dp_mixture(data):
    sticks = []
    rest = 1.0
    for i in range(K - 1):
        b = g.beta(1.0, 2.0) @ f"beta_{i}"
        sticks.append(rest * b)
        rest = rest * (1.0 - b)
    weights = jnp.stack([*sticks, rest])
    means = g.mv_normal_diag(jnp.zeros(K), 3.0 * jnp.ones(K)) @ "means"

    @g.gen
    def obs_point(i, weights, means):
        z = g.categorical(jnp.log(weights + 1e-37)) @ "z"
        x = g.normal(means[z], SIGMA_OBS) @ "x"
        return x

    _ = obs_point.vmap(in_axes=(0, None, None))(
        jnp.arange(data.shape[0]), weights, means
    ) @ "obs"
    return weights


@pytest.mark.slow
def test_cluster_recovery():
    key = jax.random.key(0)
    centers = jnp.array([-3.0, 3.0])
    comps = jax.random.categorical(key, jnp.zeros(2), shape=(N_DATA,))
    data = centers[comps] + 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), (N_DATA,)
    )

    constraint = g.C["obs", :, "x"].set(data)
    target = g.Target(dp_mixture, (data,), constraint)
    collection = jax.jit(g.ImportanceK(target, k_particles=256).run_smc)(key)
    assert jnp.isfinite(collection.get_log_marginal_likelihood_estimate())
    tr = collection.sample_particle(jax.random.fold_in(key, 2))

    def sweep(tr, key):
        def per_point(tr, inp):
            i, k = inp
            tr, _ = g.mh(k, tr, g.S["obs", i, "z"])
            return tr, None

        tr, _ = jax.lax.scan(
            per_point, tr, (jnp.arange(N_DATA), jax.random.split(key, N_DATA))
        )
        tr, _ = g.mh(
            jax.random.fold_in(key, 1), tr, g.HMC(g.S["means"], 0.05, L=5)
        )
        return tr, None

    tr, _ = jax.jit(
        lambda tr, k: jax.lax.scan(sweep, tr, jax.random.split(k, 100))
    )(tr, jax.random.fold_in(key, 3))

    means = tr.get_choices()["means"]
    means = means.unmask() if isinstance(means, g.Mask) else means
    zs = jnp.asarray(
        [
            z.unmask() if isinstance(z := tr.get_choices()["obs", i, "z"], g.Mask) else z
            for i in range(N_DATA)
        ]
    )
    # every data point's assigned cluster mean is near its own value
    assigned_means = means[zs]
    err = jnp.abs(assigned_means - data)
    assert float(jnp.mean(err < 1.0)) > 0.9
