"""sample_logdensity: the one-call driver over raw column log-densities —
validated on a conjugate posterior, including the data-sharded big-data
path on the 8-device mesh."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.scipy.stats import norm

from genjax_tpu.inference import sample_logdensity
from genjax_tpu.parallel import (
    data_sharded_logdensity,
    make_mesh_2d,
    shard_data,
)


class TestSampleLogdensity:
    def test_conjugate_posterior_plain(self):
        mu_post, v_post = 1.25, 0.04

        def ld(q):
            return -0.5 * (q[0] - mu_post) ** 2 / v_post - 0.5 * jnp.sum(
                q[1:] ** 2, axis=0
            )

        q0 = jnp.zeros((8, 256), jnp.float32)
        res = sample_logdensity(
            jr.key(0), ld, q0, n_warmup=200, n_samples=100
        )
        draws = np.asarray(res.draws[:, :, 0]).ravel()
        np.testing.assert_allclose(draws.mean(), mu_post, atol=0.02)
        np.testing.assert_allclose(draws.var(), v_post, rtol=0.2)
        assert float(np.asarray(res.rhat)[0]) < 1.05
        assert float(np.asarray(res.ess)[0]) > 200
        assert res.draws.shape == (256, 100, 8)

    def test_data_sharded_posterior_on_mesh(self):
        mesh = make_mesh_2d((2, 4))
        rng = np.random.RandomState(0)
        obs = np.asarray(rng.randn(40) * 0.7 + 1.3, np.float32)
        sigma = 0.7
        v_post = 1.0 / (1.0 + len(obs) / sigma**2)
        m_post = v_post * obs.sum() / sigma**2

        def lp(q):
            return -0.5 * jnp.sum(q**2, axis=0)

        def ll(q, shard):
            (ys,) = shard
            return jnp.sum(norm.logpdf(ys[:, None], q[0], sigma), axis=0)

        data = shard_data((jnp.asarray(obs),), mesh)
        ld = data_sharded_logdensity(lp, ll, data, mesh)
        q0 = jnp.asarray(rng.randn(8, 256), jnp.float32)
        res = sample_logdensity(
            jr.key(1), ld, q0, n_warmup=200, n_samples=100
        )
        draws = np.asarray(res.draws[:, :, 0]).ravel()
        np.testing.assert_allclose(draws.mean(), m_post, atol=0.02)
        np.testing.assert_allclose(draws.var(), v_post, rtol=0.25)
        assert float(np.asarray(res.rhat)[0]) < 1.05
