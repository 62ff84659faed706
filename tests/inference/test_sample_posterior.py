"""The one-call sampling driver (inference/sample.py): init → adaptive
warmup → sampling → diagnostics, validated against conjugate posteriors
on both kernels and on the sharded chain axis."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.inference.sample import sample_posterior

KEY = jax.random.key(314159)


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


OBS = g.C["y"].set(2.0)


class TestSamplePosterior:
    @pytest.mark.parametrize("alg", ["nuts", "hmc"])
    def test_conjugate_recovery_with_adaptation(self, alg):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=256, n_warmup=60, n_samples=60,
            algorithm=alg, eps0=0.02, max_depth=6, L=8,
        )
        draws = res["mu"][:, -30:]  # post-burn-in draws
        assert jnp.mean(draws) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(draws) == pytest.approx(1.0 / jnp.sqrt(2.0), abs=0.1)
        # adaptation moved eps far from the (deliberately tiny) initial
        assert float(res.eps) > 0.1
        assert float(res.rhat_of("mu")) == pytest.approx(1.0, abs=0.15)
        assert float(res.ess_of("mu")) > 100.0
        assert 0.5 < float(res.accept_rate) <= 1.0

    @pytest.mark.slow
    def test_multi_address_vector_selection(self):
        scales = jnp.array([0.2, 2.0])

        @g.gen
        def model():
            a = g.normal(0.0, 1.0) @ "a"
            _ = g.mv_normal_diag(jnp.zeros(2), scales) @ "b"
            _ = g.normal(a, 0.5) @ "y"

        res = sample_posterior(
            KEY, model, g.C["y"].set(1.0), (), g.S["a"] | g.S["b"],
            n_chains=256, n_warmup=90, n_samples=60,
            algorithm="nuts", eps0=0.05, max_depth=6,
        )
        b = res["b"][:, -30:]
        # mass adaptation recovers the anisotropic prior scales of "b"
        assert jnp.allclose(
            jnp.std(b.reshape(-1, 2), axis=0), scales, rtol=0.25
        )
        # "a" posterior: precision 1 + 4, mean 4/5
        a = res["a"][:, -30:]
        assert jnp.mean(a) == pytest.approx(0.8, abs=0.1)
        assert float(res.inv_mass[0]) != 1.0  # adapted

    def test_sharded_chain_axis(self):
        from genjax_tpu.parallel import make_mesh

        mesh = make_mesh()
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=256, n_warmup=40, n_samples=30,
            algorithm="hmc", eps0=0.1, L=5, mesh=mesh,
        )
        draws = res["mu"][:, -15:]
        assert jnp.mean(draws) == pytest.approx(1.0, abs=0.12)


class TestWarmupBudget:
    def test_zero_warmup_keeps_caller_settings(self):
        """n_warmup=0 must disable adaptation entirely: eps stays eps0 and
        the inverse mass stays the identity (previously 6 windows of 1
        step ran anyway, overwriting both with 6-transition noise)."""
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=32, n_warmup=0, n_samples=5,
            algorithm="hmc", eps0=0.237, L=3,
        )
        assert float(res.eps) == pytest.approx(0.237)
        assert jnp.all(res.inv_mass == 1.0)

    def test_small_warmup_budgets_run(self):
        # budgets that don't divide 6 evenly must still work (and adapt)
        for n_warmup in (1, 5, 7):
            res = sample_posterior(
                KEY, conjugate, OBS, (), g.S["mu"],
                n_chains=32, n_warmup=n_warmup, n_samples=4,
                algorithm="hmc", eps0=0.1, L=3,
            )
            assert jnp.isfinite(float(res.eps))


class TestChEESAlgorithm:
    def test_conjugate_posterior(self):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=512, n_warmup=200, n_samples=60, thin=2,
            algorithm="chees", eps0=0.1,
        )
        draws = res["mu"][:, 20:]
        assert draws.shape == (512, 40)
        assert jnp.mean(draws) == pytest.approx(1.0, abs=0.05)
        assert jnp.std(draws) == pytest.approx(
            1.0 / jnp.sqrt(2.0), abs=0.05
        )
        assert float(res.rhat_of("mu")) < 1.1
        assert float(res.ess_of("mu")) > 500
        assert float(res.divergence_rate) < 0.01

    def test_sharded_chain_axis(self):
        from genjax_tpu.parallel import make_mesh

        mesh = make_mesh()
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=256, n_warmup=200, n_samples=40,
            algorithm="chees", eps0=0.1, mesh=mesh,
        )
        draws = res["mu"][:, -20:]
        assert jnp.mean(draws) == pytest.approx(1.0, abs=0.12)
        assert jnp.std(draws) == pytest.approx(
            1.0 / jnp.sqrt(2.0), abs=0.1
        )

    def test_target_accept_forwarded(self):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=256, n_warmup=250, n_samples=20,
            algorithm="chees", eps0=0.1, target_accept=0.95,
        )
        assert float(res.accept_rate) > 0.85

    def test_unaddressed_model_raises(self):
        with pytest.raises(ValueError, match="ADDRESSED"):
            sample_posterior(
                KEY, g.normal, g.ChoiceMap.empty(), (0.0, 1.0),
                g.Selection.all(), n_chains=8, n_samples=4,
                algorithm="chees",
            )

    def test_indexed_selection_raises(self):
        @g.gen
        def kern(c, x):
            z = g.normal(c, 1.0) @ "z"
            return (z, None)

        model = kern.scan(n=3)
        with pytest.raises(ValueError, match="statically"):
            sample_posterior(
                KEY, model, g.ChoiceMap.empty(), (0.0, jnp.zeros(3)),
                g.S[..., "z"], n_chains=8, n_samples=4, algorithm="chees",
            )


class TestPTAlgorithm:
    def test_bimodal_mode_weights(self):
        """Symmetric bimodal posterior (mu ~ N(0,10), y ~ N(mu², 1),
        y=4 ⇒ equal mass at ±2): PT must weight the modes 50/50, which
        single-temperature kernels started in one mode cannot."""

        @g.gen
        def bimodal():
            mu = g.normal(0.0, 10.0) @ "mu"
            _ = g.normal(mu * mu, 1.0) @ "y"

        res = sample_posterior(
            KEY, bimodal, g.C["y"].set(4.0), (), g.S["mu"],
            n_chains=256, n_warmup=200, n_samples=200,
            algorithm="pt", eps0=0.05, L=8, n_rungs=5,
        )
        draws = jnp.asarray(res["mu"])  # (chains, samples)
        assert draws.shape == (256, 200)
        frac_pos = float(jnp.mean(draws[:, 100:] > 0))
        assert frac_pos == pytest.approx(0.5, abs=0.1)
        # Mode locations: |mu| concentrates near 2.
        assert float(jnp.mean(jnp.abs(draws[:, 100:]))) == pytest.approx(
            2.0, abs=0.1
        )
        assert 0.2 < float(res.accept_rate) <= 1.0
        assert float(res.divergence_rate) == 0.0

    def test_conjugate_exactness(self):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=256, n_warmup=150, n_samples=100,
            algorithm="pt", eps0=0.1, L=8, n_rungs=3,
        )
        draws = res["mu"][:, -50:]
        assert jnp.mean(draws) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(draws) == pytest.approx(
            1.0 / jnp.sqrt(2.0), abs=0.1
        )
        assert float(res.rhat_of("mu")) == pytest.approx(1.0, abs=0.15)


class TestDenseHMCAlgorithm:
    def test_correlated_posterior_exact(self):
        """Near-collinear regression: the w posterior is a strongly
        correlated Gaussian; the dense-metric driver must recover its
        mean AND full covariance with healthy diagnostics."""
        import numpy as np

        rng = np.random.RandomState(0)
        n_obs, s2 = 32, 0.25
        x1 = rng.randn(n_obs)
        X = np.stack([x1, x1 + 0.15 * rng.randn(n_obs)], axis=1).astype(
            np.float32
        )
        y = (X @ np.asarray([1.0, -0.5]) + np.sqrt(s2) * rng.randn(n_obs)
             ).astype(np.float32)
        prec_post = np.eye(2) + X.T @ X / s2
        cov_post = np.linalg.inv(prec_post)
        mean_post = cov_post @ (X.T @ y) / s2

        @g.gen
        def model():
            w = g.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = g.mv_normal_diag(
                jnp.asarray(X) @ w, jnp.full(n_obs, float(np.sqrt(s2)))
            ) @ "y"

        res = sample_posterior(
            KEY, model, g.C["y"].set(jnp.asarray(y)), (), g.S["w"],
            n_chains=512, n_warmup=200, n_samples=100, thin=2,
            algorithm="dense_hmc", eps0=0.2, L=4,
        )
        draws = res["w"]  # (chains, samples, 2)
        flat = np.asarray(draws).reshape(-1, 2).T
        np.testing.assert_allclose(flat.mean(axis=1), mean_post, atol=0.05)
        np.testing.assert_allclose(np.cov(flat), cov_post, atol=0.03)
        assert 0.5 < float(res.accept_rate) <= 1.0
        assert float(jnp.max(res.rhat_of("w"))) < 1.1
        # the adapted metric's diagonal tracks the marginal variances
        np.testing.assert_allclose(
            np.asarray(res.inv_mass), np.diag(cov_post), rtol=0.5
        )

    def test_zero_warmup_keeps_caller_settings(self):
        """dense_hmc honors the driver contract: n_warmup=0 disables
        adaptation entirely (eps stays eps0, metric stays identity)."""
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=128, n_warmup=0, n_samples=30,
            algorithm="dense_hmc", eps0=0.345, L=4,
        )
        assert float(res.eps) == pytest.approx(0.345)
        # identity metric: the reported diagonal is exactly 1
        assert float(res.inv_mass[0]) == pytest.approx(1.0)


class TestDenseNUTSAlgorithm:
    def test_correlated_posterior_exact(self):
        """dense_nuts (the Stan dense_e + NUTS pairing, via whitening):
        exact mean AND full covariance on the near-collinear regression
        posterior, healthy diagnostics."""
        import numpy as np

        rng = np.random.RandomState(0)
        n_obs, s2 = 32, 0.25
        x1 = rng.randn(n_obs)
        X = np.stack([x1, x1 + 0.15 * rng.randn(n_obs)], axis=1).astype(
            np.float32
        )
        y = (X @ np.asarray([1.0, -0.5]) + np.sqrt(s2) * rng.randn(n_obs)
             ).astype(np.float32)
        prec_post = np.eye(2) + X.T @ X / s2
        cov_post = np.linalg.inv(prec_post)
        mean_post = cov_post @ (X.T @ y) / s2

        @g.gen
        def model():
            w = g.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = g.mv_normal_diag(
                jnp.asarray(X) @ w, jnp.full(n_obs, float(np.sqrt(s2)))
            ) @ "y"

        res = sample_posterior(
            KEY, model, g.C["y"].set(jnp.asarray(y)), (), g.S["w"],
            n_chains=512, n_warmup=200, n_samples=100, thin=2,
            algorithm="dense_nuts", eps0=0.2, max_depth=6,
        )
        draws = res["w"]
        flat = np.asarray(draws).reshape(-1, 2).T
        np.testing.assert_allclose(flat.mean(axis=1), mean_post, atol=0.05)
        np.testing.assert_allclose(np.cov(flat), cov_post, atol=0.03)
        assert 0.5 < float(res.accept_rate) <= 1.0
        assert float(res.divergence_rate) < 0.01
        assert float(jnp.max(res.rhat_of("w"))) < 1.1

    def test_zero_warmup_identity_metric(self):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=128, n_warmup=0, n_samples=30,
            algorithm="dense_nuts", eps0=0.4, max_depth=5,
        )
        assert float(res.eps) == pytest.approx(0.4)
        assert float(res.inv_mass[0]) == pytest.approx(1.0)


class TestHMCSweepAlgorithm:
    """algorithm='hmc_sweep': the batch-first form of 'hmc' (round 5)."""

    def test_conjugate_posterior_moments(self):
        import numpy as np

        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=512, n_warmup=120, n_samples=60,
            algorithm="hmc_sweep", eps0=0.3, L=5,
        )
        draws = np.asarray(res["mu"]).ravel()
        assert abs(draws.mean() - 1.0) < 0.08
        assert abs(draws.var() - 0.5) < 0.1
        assert 0.4 < float(res.accept_rate) <= 1.0
        assert float(res.divergence_rate) == 0.0
        assert float(res.rhat_of("mu")) < 1.1

    def test_resume_bitwise(self):
        import tempfile

        import numpy as np

        kw = dict(
            n_chains=64, n_warmup=30, n_samples=12,
            algorithm="hmc_sweep", eps0=0.3, L=3,
        )
        plain = sample_posterior(KEY, conjugate, OBS, (), g.S["mu"], **kw)
        with tempfile.TemporaryDirectory() as d:
            _part = sample_posterior(
                KEY, conjugate, OBS, (), g.S["mu"], **kw,
                checkpoint_dir=d, checkpoint_every=4, max_segments=1,
            )
            res = sample_posterior(
                KEY, conjugate, OBS, (), g.S["mu"], **kw,
                checkpoint_dir=d, checkpoint_every=4,
            )
        assert np.array_equal(np.asarray(plain["mu"]), np.asarray(res["mu"]))

    def test_zero_warmup(self):
        res = sample_posterior(
            KEY, conjugate, OBS, (), g.S["mu"],
            n_chains=64, n_warmup=0, n_samples=20,
            algorithm="hmc_sweep", eps0=0.5, L=3,
        )
        assert float(res.eps) == pytest.approx(0.5)
        assert float(res.inv_mass[0]) == pytest.approx(1.0)
