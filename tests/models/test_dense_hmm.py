"""dense_hmm_model vs the exact hmm_tools machinery: the @gen model's
assess must reproduce the path joint density, SMC logZ must match the
forward algorithm, and posterior path frequencies must match
forward-backward gammas."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genjax_tpu as g
from genjax_tpu.dists.hmm_tools import (
    forward_backward,
    hmm_log_marginal,
)
from genjax_tpu.models import dense_hmm_model
from genjax_tpu.parallel import SSMParticleFilter

rng = np.random.RandomState(0)
N, M, T = 3, 4, 8
PI = rng.dirichlet(np.ones(N))
TRANS = rng.dirichlet(np.ones(N), size=N)
OBS = rng.dirichlet(np.ones(M), size=N)
LP = jnp.log(jnp.asarray(PI, jnp.float32))
LT = jnp.log(jnp.asarray(TRANS, jnp.float32))
LO = jnp.log(jnp.asarray(OBS, jnp.float32))
YS = rng.randint(0, M, size=T)

MODEL = dense_hmm_model(LP, LT, LO, T)
CONSTRAINT = g.C[:, "y"].set(jnp.asarray(YS))


class TestDenseHMMModel:
    def test_assess_matches_path_joint(self):
        zs = rng.randint(0, N, size=T)
        chm = g.C[:, "z"].set(jnp.asarray(zs)) | CONSTRAINT
        score, _ = MODEL.assess(chm, (jnp.asarray(-1), jnp.zeros(T)))
        expected = np.log(PI[zs[0]]) + np.log(OBS[zs[0], YS[0]])
        for t in range(1, T):
            expected += np.log(TRANS[zs[t - 1], zs[t]]) + np.log(
                OBS[zs[t], YS[t]]
            )
        np.testing.assert_allclose(float(score), expected, rtol=1e-5)

    def test_smc_logz_matches_forward_algorithm(self):
        lm_exact = float(hmm_log_marginal(LP, LT, LO, jnp.asarray(YS)))
        pf = SSMParticleFilter(MODEL.gen_fn, n_particles=16384)
        res = pf.run(
            jr.key(0), jnp.asarray(-1), jnp.zeros(T), CONSTRAINT
        )
        np.testing.assert_allclose(
            float(res.log_marginal), lm_exact, atol=0.03
        )

    def test_importance_posterior_matches_gammas(self):
        """Self-normalized IS over full latent paths reproduces the
        forward-backward smoothed marginals."""
        n = 60000
        trs, ws = jax.jit(
            jax.vmap(
                lambda k: MODEL.generate(
                    k, CONSTRAINT, (jnp.asarray(-1), jnp.zeros(T))
                )
            )
        )(jr.split(jr.key(1), n))
        w = np.exp(np.asarray(ws) - np.asarray(ws).max())
        w /= w.sum()
        zs = np.asarray(trs.get_choices()[:, "z"])
        gammas = np.exp(
            np.asarray(
                forward_backward(LP, LT, LO, jnp.asarray(YS)).log_gammas
            )
        )
        for t in range(T):
            freq = np.asarray(
                [(w * (zs[:, t] == s)).sum() for s in range(N)]
            )
            np.testing.assert_allclose(freq, gammas[t], atol=0.02)
