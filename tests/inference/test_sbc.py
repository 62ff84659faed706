"""SBC harness: an EXACT posterior sampler must pass uniformity; a biased
or over-dispersed sampler must fail it (the harness's power), and a real
mcmc pipeline (slice sampling) must pass end-to-end."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference.sbc import sbc_ranks, sbc_uniformity

N_SIMS = 400
N_DRAWS = 99  # ranks in {0..99} -> 20 bins of 5


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    g.normal(mu, 0.5) @ "y"


def posterior_params(constraint):
    y = constraint.get_submap("y").get_value()
    v = 1.0 / (1.0 + 1.0 / 0.25)
    return v * y / 0.25, jnp.sqrt(v)


def exact_sampler(key, constraint):
    m, sd = posterior_params(constraint)
    return (m + sd * jr.normal(key, (N_DRAWS,)))[:, None]


class TestHarness:
    def test_exact_sampler_is_uniform(self):
        res = jax.jit(
            lambda k: sbc_ranks(
                k, model, (), g.S["mu"], exact_sampler, n_sims=N_SIMS
            )
        )(jr.key(0))
        assert res.ranks.shape == (N_SIMS, 1)
        pvals, counts = sbc_uniformity(res.ranks, N_DRAWS, n_bins=20)
        assert float(pvals[0]) > 0.01, (pvals, counts)

    def test_biased_sampler_detected(self):
        def biased(key, constraint):
            m, sd = posterior_params(constraint)
            return (m + 0.3 + sd * jr.normal(key, (N_DRAWS,)))[:, None]

        res = sbc_ranks(
            jr.key(1), model, (), g.S["mu"], biased, n_sims=N_SIMS
        )
        pvals, _ = sbc_uniformity(res.ranks, N_DRAWS, n_bins=20)
        assert float(pvals[0]) < 1e-3

    def test_overdispersed_sampler_detected(self):
        def wide(key, constraint):
            m, sd = posterior_params(constraint)
            return (m + 2.0 * sd * jr.normal(key, (N_DRAWS,)))[:, None]

        res = sbc_ranks(
            jr.key(2), model, (), g.S["mu"], wide, n_sims=N_SIMS
        )
        pvals, _ = sbc_uniformity(res.ranks, N_DRAWS, n_bins=20)
        assert float(pvals[0]) < 1e-3

    def test_slice_mcmc_pipeline_passes(self):
        """End-to-end: prior sim → slice-sampling chain → thinned draws.
        The whole pipeline (simulate, filter, edit machinery, sampler)
        must be calibrated."""
        from genjax_tpu.inference.mcmc import mh

        def mcmc_sampler(key, constraint):
            k0, k1 = jr.split(key)
            tr, _ = model.generate(k0, constraint, ())
            req = g.SliceSample(g.S["mu"], width=2.0)

            def step(t, kk):
                t2, _ = mh(kk, t, req)
                return t2, t2.get_choices()["mu"]

            # slice transitions decorrelate in ~1 step on a conjugate
            # normal; keep a few warmup steps then collect
            _, draws = jax.lax.scan(step, tr, jr.split(k1, N_DRAWS + 10))
            return draws[10:][:, None]

        res = jax.jit(
            lambda k: sbc_ranks(
                k, model, (), g.S["mu"], mcmc_sampler, n_sims=N_SIMS
            )
        )(jr.key(3))
        pvals, counts = sbc_uniformity(res, n_bins=20)
        assert float(pvals[0]) > 0.01, (pvals, counts)
