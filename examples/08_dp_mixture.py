"""Dirichlet-process mixture (truncated stick-breaking) with SMC +
MH rejuvenation — the BASELINE.json "DP mixture, multi-host SMC with
collective resampling" config, single-chip version.

Model: weights ~ stick-breaking(alpha) truncated at K; cluster means ~
N(0, 3); assignments ~ categorical(weights); observations ~ N(mean_z, 0.5).
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g

K = 8  # truncation level
SIGMA_OBS = 0.5
N_DATA = 60


@g.gen
def dp_mixture(data):
    # stick-breaking weights (explicit loop: addresses "beta_i")
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


def make_data(key):
    """Three well-separated clusters."""
    centers = jnp.array([-4.0, 0.0, 4.0])
    comps = jax.random.categorical(key, jnp.zeros(3), shape=(N_DATA,))
    return centers[comps] + 0.4 * jax.random.normal(
        jax.random.fold_in(key, 1), (N_DATA,)
    )


def main():
    key = jax.random.key(0)
    data = make_data(key)
    constraint = g.C["obs", :, "x"].set(data)
    target = g.Target(dp_mixture, (data,), constraint)

    # SMC initialization: K-particle importance sampling
    alg = g.ImportanceK(target, k_particles=512)
    collection = jax.jit(alg.run_smc)(key)
    print(f"SMC logZ estimate: {collection.get_log_marginal_likelihood_estimate():.1f}")
    print(f"ESS: {collection.effective_sample_size():.0f} / 512")

    # Gibbs-style rejuvenation (programmable inference): per-point
    # assignment moves + HMC on the cluster means + stick updates.
    tr = collection.sample_particle(jax.random.fold_in(key, 2))

    def sweep(tr, key):
        def per_point(tr, inp):
            i, k = inp
            tr, _ = g.mh(k, tr, g.S["obs", i, "z"])
            return tr, None

        tr, _ = jax.lax.scan(
            per_point,
            tr,
            (jnp.arange(N_DATA), jax.random.split(key, N_DATA)),
        )
        tr, _ = g.mh(
            jax.random.fold_in(key, 1), tr, g.HMC(g.S["means"], 0.05, L=5)
        )
        for i in range(K - 1):
            tr, _ = g.mh(jax.random.fold_in(key, 10 + i), tr, g.S[f"beta_{i}"])
        return tr, None

    tr, _ = jax.jit(lambda tr, k: jax.lax.scan(sweep, tr, jax.random.split(k, 150)))(
        tr, jax.random.fold_in(key, 3)
    )
    means = tr.get_choices()["means"]
    means = means.unmask() if isinstance(means, g.Mask) else means

    # report clusters that carry data mass
    zs = jnp.asarray(
        [tr.get_choices()["obs", i, "z"] for i in range(N_DATA)]
    )
    zs = jnp.asarray([z.unmask() if isinstance(z, g.Mask) else z for z in zs])
    used, counts = np.unique(np.asarray(zs), return_counts=True)
    print("occupied clusters (mean, count):")
    for c, n in zip(used, counts):
        print(f"  mean {float(means[c]):+.2f}  n={n}")
    print("(true cluster centers: -4, 0, +4)")


if __name__ == "__main__":
    main()
