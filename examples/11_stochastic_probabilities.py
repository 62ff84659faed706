"""Stochastic probabilities: distributions whose densities are *unbiasedly
estimated* by nested inference (the GenSP/RAVI capability — reference
cookbook `stochastic_probabilities.ipynb`, Lew et al. 2023).

``Marginal`` turns a generative function + selection into a
``SampleDistribution``: sampling runs the model and keeps the selected
addresses; ``estimate_logpdf`` runs an inference ``Algorithm`` over the
auxiliary (marginalized) randomness. The estimates are unbiased in
density space — exactly the property that keeps importance sampling and
SMC correct when such distributions appear inside larger models.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.scipy.stats as st
from jax.scipy.special import logsumexp

import genjax_tpu as g
from genjax_tpu.inference import ImportanceK, Marginal, Target


# A two-component mixture with the discrete component auxiliary:
@g.gen
def mixture():
    z = g.flip(0.3) @ "z"
    mu = jnp.where(z, 2.0, -2.0)
    x = g.normal(mu, 0.7) @ "x"
    return x


def exact_density(x):
    return 0.3 * jnp.exp(st.norm.logpdf(x, 2.0, 0.7)) + 0.7 * jnp.exp(
        st.norm.logpdf(x, -2.0, 0.7)
    )


def main():
    # Marginal over "x": z is marginalized by nested inference
    marg = Marginal(
        mixture, g.Pytree.const(g.S["x"]), g.Pytree.const(None)
    )

    # --- sampling runs the model; the score is a density ESTIMATE -----
    score_est, chm = marg.random_weighted(jr.key(0))
    x0 = chm["x"]
    assert jnp.isfinite(score_est)

    # --- unbiasedness: E[exp(estimate_logpdf(x))] = p(x) --------------
    x_probe = jnp.asarray(1.0)
    probe_chm = g.C["x"].set(x_probe)

    def one_estimate(k):
        return marg.estimate_logpdf(k, probe_chm)

    ests = jax.jit(jax.vmap(one_estimate))(jr.split(jr.key(1), 8000))
    mean_density = jnp.exp(logsumexp(ests) - jnp.log(ests.shape[0]))
    truth = exact_density(x_probe)
    assert jnp.allclose(mean_density, truth, rtol=0.1), (
        mean_density,
        truth,
    )

    # --- a custom algorithm sharpens the estimate ---------------------
    # K-particle importance sampling over the auxiliary choice; the
    # algorithm carries a base target and is retargeted to each queried
    # conditional via ChangeTarget reweighting. The base target must
    # constrain the SAME addresses as the queries (here "x", with a
    # placeholder value) so the reweighting spaces align.
    base = Target(mixture, (), g.C["x"].set(0.0))
    marg_k = Marginal(
        mixture,
        g.Pytree.const(g.S["x"]),
        g.Pytree.const(ImportanceK(base, k_particles=64)),
    )
    ests_k = jax.jit(
        jax.vmap(lambda k: marg_k.estimate_logpdf(k, probe_chm))
    )(jr.split(jr.key(2), 500))
    # still unbiased, and much lower variance than the 1-particle default
    mean_k = jnp.exp(logsumexp(ests_k) - jnp.log(ests_k.shape[0]))
    assert jnp.allclose(mean_k, truth, rtol=0.1)
    assert jnp.var(ests_k) < jnp.var(ests)

    # --- nested use: the marginal as a prior inside another model -----
    @g.gen
    def outer():
        x_chm = marg() @ "x"
        y = g.normal(x_chm["x"], 0.5) @ "y"
        return y

    tr = outer.simulate(jr.key(3), ())
    assert jnp.isfinite(tr.get_score())

    print(
        f"p({float(x_probe)}) exact {float(truth):.4f} | "
        f"1-particle estimate {float(mean_density):.4f} | "
        f"64-particle estimate {float(mean_k):.4f}"
    )
    print("stochastic-probabilities cookbook: OK")


if __name__ == "__main__":
    main()
