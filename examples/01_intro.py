"""Intro: the README beta-bernoulli model + sampling-importance-resampling.

Port of the reference quickstart (/root/reference/README.md:100-140) and
docs/cookbook/active/intro.ipynb.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g


@g.gen
def beta_bernoulli(alpha, beta):
    """p ~ Beta(alpha, beta); v ~ Bernoulli(p)."""
    p = g.beta(alpha, beta) @ "p"
    v = g.flip(p) @ "v"
    return v


def sampling_importance_resampling(key, k_particles=50):
    """Infer p given v=True by SIR."""
    obs = g.C["v"].set(True)
    keys = jax.random.split(key, k_particles)
    _, ws = jax.vmap(lambda kk: beta_bernoulli.importance(kk, obs, (2.0, 2.0)))(keys)
    trs, _ = jax.vmap(lambda kk: beta_bernoulli.importance(kk, obs, (2.0, 2.0)))(keys)
    idx = jax.random.categorical(key, ws)
    return trs.get_choices()["p"][idx]


def main():
    key = jax.random.key(314159)

    # simulate: sample a full trace
    tr = jax.jit(beta_bernoulli.simulate)(key, (2.0, 2.0))
    print("p =", tr.get_choices()["p"], " v =", tr.get_choices()["v"])
    print("log density =", tr.get_score())

    # 50 SIR trials, vmapped + jitted (the reference README demo)
    posterior_samples = jax.jit(
        jax.vmap(sampling_importance_resampling)
    )(jax.random.split(key, 50))
    print("posterior mean of p | v=True:", jnp.mean(posterior_samples))
    print("(exact: 3/5 = 0.6)")


if __name__ == "__main__":
    main()
