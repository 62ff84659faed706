"""Adaptive tempered SMC (CESS bisection) vs exact evidence: conjugate
normal-normal (analytic logZ), agreement with the fixed-ladder driver, and
ladder sanity (monotone, terminates at 1, denser where the likelihood is
steep)."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference.tempered import (
    adaptive_tempered_smc,
    geometric_ladder,
    tempered_smc,
)

N_OBS, SIGMA = 12, 0.4
rng = np.random.RandomState(0)
YS = (rng.randn(N_OBS) * SIGMA + 1.1).astype(np.float32)


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    g.mv_normal_diag(mu * jnp.ones(N_OBS), SIGMA * jnp.ones(N_OBS)) @ "y"


def exact_logz():
    """log ∫ N(mu; 0,1) Π N(y_i; mu, σ²) dmu via the marginal MVN."""
    cov = SIGMA**2 * np.eye(N_OBS) + np.ones((N_OBS, N_OBS))
    sign, logdet = np.linalg.slogdet(cov)
    r = YS
    return float(
        -0.5 * r @ np.linalg.solve(cov, r)
        - 0.5 * logdet
        - 0.5 * N_OBS * np.log(2 * np.pi)
    )


LOGZ = exact_logz()
OBS = g.C["y"].set(jnp.asarray(YS))


class TestAdaptiveTempering:
    def _run(self, seed, **kw):
        return jax.jit(
            lambda k: adaptive_tempered_smc(
                k, model, OBS, (),
                n_particles=2048,
                rejuvenation=g.HMC(g.S["mu"], 0.15, L=5),
                **kw,
            )
        )(jr.key(seed))

    @pytest.mark.slow
    def test_log_evidence_exact(self):
        lzs = [float(self._run(s).log_marginal) for s in range(4)]
        np.testing.assert_allclose(np.mean(lzs), LOGZ, atol=0.05)

    def test_ladder_properties(self):
        res = self._run(0)
        betas = np.asarray(res.beta_history)
        n = int(res.n_rungs)
        assert 1 < n < 64
        active = betas[:n]
        assert np.all(np.diff(np.concatenate([[0.0], active])) > 0)
        np.testing.assert_allclose(active[-1], 1.0)
        # idle tail stays pinned at 1
        assert np.all(betas[n:] == active[-1])

    def test_matches_fixed_ladder_evidence(self):
        res_fixed = jax.jit(
            lambda k: tempered_smc(
                k, model, OBS, (),
                n_particles=2048,
                betas=geometric_ladder(24),
                rejuvenation=g.HMC(g.S["mu"], 0.15, L=5),
            )
        )(jr.key(7))
        res_adapt = self._run(7)
        np.testing.assert_allclose(
            float(res_adapt.log_marginal),
            float(res_fixed.log_marginal),
            atol=0.1,
        )

    def test_sharper_likelihood_needs_more_rungs(self):
        @g.gen
        def sharp():
            mu = g.normal(0.0, 1.0) @ "mu"
            g.mv_normal_diag(
                mu * jnp.ones(N_OBS), 0.05 * jnp.ones(N_OBS)
            ) @ "y"

        res_soft = self._run(1)
        res_sharp = jax.jit(
            lambda k: adaptive_tempered_smc(
                k, sharp, OBS, (),
                n_particles=2048,
                rejuvenation=g.HMC(g.S["mu"], 0.05, L=5),
            )
        )(jr.key(1))
        assert int(res_sharp.n_rungs) > int(res_soft.n_rungs)

    def test_posterior_moments(self):
        res = self._run(3)
        v = 1.0 / (1.0 + N_OBS / SIGMA**2)
        m = v * YS.sum() / SIGMA**2
        w = np.exp(np.asarray(res.log_weights))
        w /= w.sum()
        mus = np.asarray(res.traces.get_choices()["mu"])
        np.testing.assert_allclose(w @ mus, m, atol=0.03)
