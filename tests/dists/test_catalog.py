"""Distribution-catalog correctness.

Modeled on reference tests/generative_functions/test_distributions.py
(529 LoC): log-density agreement with an independent implementation
(scipy.stats) and sampler/density consistency.

Two layers:
1. ``logpdf`` vs scipy.stats for every family scipy implements.
2. Universal sampler↔density consistency for scalar continuous families
   without a scipy counterpart: the empirical mean/second-moment of the
   sampler must match quadrature moments of ``exp(logpdf)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

import genjax_tpu as g

KEY = jax.random.key(314159)
N_SAMPLES = 20000


def lp(dist, v, *args):
    return float(dist.logpdf(jnp.asarray(v), *args))


class TestLogpdfVsScipy:
    @pytest.mark.parametrize(
        "dist,args,sp,spargs,vs",
        [
            (lambda: g.normal, (0.5, 2.0), sps.norm, (0.5, 2.0), [0.0, 1.0, -3.0]),
            (lambda: g.cauchy, (0.5, 2.0), sps.cauchy, (0.5, 2.0), [0.0, 5.0]),
            (lambda: g.laplace, (0.5, 2.0), sps.laplace, (0.5, 2.0), [0.0, 2.5]),
            (lambda: g.logistic, (0.5, 2.0), sps.logistic, (0.5, 2.0), [0.0, 2.0]),
            (lambda: g.gumbel, (0.5, 2.0), sps.gumbel_r, (0.5, 2.0), [0.0, 3.0]),
            (lambda: g.uniform, (1.0, 3.0), sps.uniform, (1.0, 2.0), [1.5, 2.9]),
            (lambda: g.exponential, (2.0,), sps.expon, (0, 0.5), [0.1, 2.0]),
            (lambda: g.half_normal, (1.5,), sps.halfnorm, (0, 1.5), [0.2, 2.0]),
            (lambda: g.half_cauchy, (0.0, 1.5), sps.halfcauchy, (0, 1.5), [0.2, 2.0]),
            (lambda: g.log_normal, (0.3, 0.8), sps.lognorm, (0.8, 0, np.exp(0.3)), [0.5, 2.0]),
            (lambda: g.chi2, (3.0,), sps.chi2, (3.0,), [1.0, 5.0]),
            (lambda: g.chi, (3.0,), sps.chi, (3.0,), [0.5, 2.0]),
            (lambda: g.poisson, (3.5,), sps.poisson, (3.5,), [0, 2, 7]),
            (lambda: g.geometric, (jnp.log(0.3 / 0.7),), sps.geom, (0.3,), None),
            (lambda: g.von_mises, (0.5, 2.0), sps.vonmises, (2.0, 0.5), [0.0, 1.0]),
            (lambda: g.moyal, (0.5, 2.0), sps.moyal, (0.5, 2.0), [0.0, 3.0]),
            (lambda: g.inverse_gaussian, (2.0, 3.0), sps.invgauss, (2.0 / 3.0, 0, 3.0), [1.0, 2.5]),
        ],
    )
    def test_scalar_families(self, dist, args, sp, spargs, vs):
        d = dist()
        if vs is None:
            # geometric: TFP counts failures, scipy counts trials
            for k in [0, 1, 4]:
                assert lp(d, k, *args) == pytest.approx(
                    sp.logpmf(k + 1, *spargs), rel=1e-4
                )
            return
        pdf = getattr(sp, "logpdf", None) or sp.logpmf
        for v in vs:
            if hasattr(sp, "logpdf") and not isinstance(v, int):
                expected = sp.logpdf(v, *spargs)
            elif isinstance(v, int):
                expected = sp.logpmf(v, *spargs)
            else:
                expected = sp.logpdf(v, *spargs)
            assert lp(d, v, *args) == pytest.approx(expected, rel=1e-4), v

    def test_gamma_family(self):
        # TFP parameterization: gamma(concentration, rate)
        assert lp(g.gamma, 1.7, 2.0, 3.0) == pytest.approx(
            sps.gamma.logpdf(1.7, 2.0, scale=1 / 3.0), rel=1e-4
        )
        assert lp(g.inverse_gamma, 0.7, 2.0, 3.0) == pytest.approx(
            sps.invgamma.logpdf(0.7, 2.0, scale=3.0), rel=1e-4
        )
        assert lp(g.beta, 0.3, 2.0, 3.0) == pytest.approx(
            sps.beta.logpdf(0.3, 2.0, 3.0), rel=1e-4
        )

    def test_student_t(self):
        assert lp(g.student_t, 0.7, 4.0, 0.5, 2.0) == pytest.approx(
            sps.t.logpdf(0.7, 4.0, 0.5, 2.0), rel=1e-4
        )

    def test_weibull(self):
        # TFP: weibull(concentration, scale)
        assert lp(g.weibull, 1.3, 2.0, 1.5) == pytest.approx(
            sps.weibull_min.logpdf(1.3, 2.0, scale=1.5), rel=1e-4
        )

    def test_truncated_normal(self):
        assert lp(g.truncated_normal, 0.5, 0.0, 1.0, -1.0, 2.0) == pytest.approx(
            sps.truncnorm.logpdf(0.5, -1.0, 2.0, 0.0, 1.0), rel=1e-4
        )

    def test_discrete_families(self):
        assert lp(g.bernoulli, 1, jnp.log(0.3 / 0.7)) == pytest.approx(
            np.log(0.3), rel=1e-4
        )
        assert lp(g.flip, 1, 0.3) == pytest.approx(np.log(0.3), rel=1e-4)
        assert lp(g.binomial, 3, 10.0, jnp.log(0.4 / 0.6)) == pytest.approx(
            sps.binom.logpmf(3, 10, 0.4), rel=1e-4
        )
        assert lp(g.categorical, 2, jnp.log(jnp.array([0.2, 0.3, 0.5]))) == pytest.approx(
            np.log(0.5), rel=1e-4
        )
        # TFP negative_binomial(total_count, logits): failures before
        # total_count successes
        assert lp(
            g.negative_binomial, 4, 5.0, jnp.log(0.4 / 0.6)
        ) == pytest.approx(sps.nbinom.logpmf(4, 5, 0.6), rel=1e-4)
        assert lp(g.beta_binomial, 3, 10.0, 2.0, 3.0) == pytest.approx(
            sps.betabinom.logpmf(3, 10, 2.0, 3.0), rel=1e-4
        )
        assert lp(g.skellam, 2, 3.0, 2.0) == pytest.approx(
            sps.skellam.logpmf(2, 3.0, 2.0), rel=1e-4
        )
        assert lp(g.zipf, 3, 2.5) == pytest.approx(
            sps.zipf.logpmf(3, 2.5), rel=1e-3
        )
        assert lp(g.non_central_chi2, 2.5, 3.0, 1.5) == pytest.approx(
            sps.ncx2.logpdf(2.5, 3.0, 1.5), rel=1e-3
        )

    def test_multivariate(self):
        mean = np.array([0.5, -0.5])
        cov = np.array([[2.0, 0.3], [0.3, 1.0]])
        v = np.array([0.2, 0.1])
        assert lp(g.mv_normal, v, jnp.asarray(mean), jnp.asarray(cov)) == pytest.approx(
            sps.multivariate_normal.logpdf(v, mean, cov), rel=1e-4
        )
        diag = np.array([1.5, 0.5])
        assert lp(
            g.mv_normal_diag, v, jnp.asarray(mean), jnp.asarray(diag)
        ) == pytest.approx(
            sps.multivariate_normal.logpdf(v, mean, np.diag(diag**2)), rel=1e-4
        )
        alpha = np.array([2.0, 3.0, 4.0])
        x = np.array([0.2, 0.3, 0.5])
        assert lp(g.dirichlet, x, jnp.asarray(alpha)) == pytest.approx(
            sps.dirichlet.logpdf(x, alpha), rel=1e-4
        )
        n = np.array([1.0, 2.0, 2.0])
        logits = jnp.log(jnp.array([0.2, 0.3, 0.5]))
        assert lp(g.multinomial, n, 5.0, logits) == pytest.approx(
            sps.multinomial.logpmf(n, 5, [0.2, 0.3, 0.5]), rel=1e-4
        )
        assert lp(
            g.dirichlet_multinomial, n, 5.0, jnp.asarray(alpha)
        ) == pytest.approx(
            sps.dirichlet_multinomial.logpmf(n, alpha, 5), rel=1e-4
        )


def quad_moments(dist, args, lo, hi, n=200001):
    xs = jnp.linspace(lo, hi, n)
    dx = (hi - lo) / (n - 1)
    p = jnp.exp(dist.logpdf(xs, *args))
    z = jnp.sum(p) * dx
    m1 = jnp.sum(xs * p) * dx / z
    m2 = jnp.sum(xs**2 * p) * dx / z
    return float(z), float(m1), float(m2)


class TestSamplerDensityConsistency:
    """Families without a scipy counterpart: the sampler's empirical moments
    must match quadrature moments of the density, and the density must be
    normalized."""

    @pytest.mark.parametrize(
        "name,args,lo,hi",
        [
            ("logit_normal", (0.3, 0.8), 1e-5, 1 - 1e-5),
            ("kumaraswamy", (2.0, 3.0), 1e-6, 1 - 1e-6),
            ("double_sided_maxwell", (0.5, 1.0), -6.0, 7.0),
            ("exp_gamma", (2.0, 1.5), -8.0, 5.0),
            ("exp_inverse_gamma", (2.0, 1.5), -6.0, 8.0),
            ("lambert_w_normal", (0.3, 1.0, 0.1), -6.0, 7.0),
            ("truncated_cauchy", (0.0, 1.0, -2.0, 3.0), -2.0, 3.0),
            ("half_student_t", (4.0, 0.0, 1.5), 1e-6, 40.0),
        ],
    )
    def test_consistency(self, name, args, lo, hi):
        dist = getattr(g, name)
        z, m1, m2 = quad_moments(dist, args, lo, hi)
        assert z == pytest.approx(1.0, abs=2e-2), f"{name} density not normalized"
        samples = jax.jit(
            lambda k: jax.vmap(lambda kk: dist.sample(kk, *args))(
                jax.random.split(k, N_SAMPLES)
            )
        )(KEY)
        se1 = float(jnp.std(samples)) / np.sqrt(N_SAMPLES)
        assert float(jnp.mean(samples)) == pytest.approx(
            m1, abs=max(6 * se1, 2e-2)
        ), f"{name} mean mismatch"
        var_emp = float(jnp.var(samples))
        var_quad = m2 - m1**2
        assert var_emp == pytest.approx(var_quad, rel=0.15), f"{name} var mismatch"

    def test_beta_quotient_moments(self):
        # X ~ Beta(a1,b1), Y ~ Beta(a2,b2) independent: E[X/Y] = E[X] E[1/Y]
        a1, b1, a2, b2 = 3.0, 2.0, 4.0, 2.0
        samples = jax.vmap(
            lambda k: g.beta_quotient.sample(k, a1, b1, a2, b2)
        )(jax.random.split(KEY, N_SAMPLES))
        exact = (a1 / (a1 + b1)) * ((a2 + b2 - 1) / (a2 - 1))
        assert float(jnp.mean(samples)) == pytest.approx(exact, rel=0.05)

    def test_power_spherical_normalization(self):
        # samples lie on the unit sphere
        mu = jnp.array([0.0, 0.0, 1.0])
        samples = jax.vmap(
            lambda k: g.power_spherical.sample(k, mu, 5.0)
        )(jax.random.split(KEY, 1000))
        norms = jnp.linalg.norm(samples, axis=-1)
        assert jnp.allclose(norms, 1.0, atol=1e-4)
        # concentrated around mu
        assert float(jnp.mean(samples[:, 2])) > 0.7

    def test_von_mises_fisher_normalization(self):
        mu = jnp.array([0.0, 0.0, 1.0])
        samples = jax.vmap(
            lambda k: g.von_mises_fisher.sample(k, mu, 5.0)
        )(jax.random.split(KEY, 1000))
        norms = jnp.linalg.norm(samples, axis=-1)
        assert jnp.allclose(norms, 1.0, atol=1e-4)
        assert float(jnp.mean(samples[:, 2])) > 0.7


class TestSampling:
    """Empirical moments of the heavily-used families."""

    @pytest.mark.parametrize(
        "name,args,mean,std",
        [
            ("normal", (2.0, 0.5), 2.0, 0.5),
            ("beta", (2.0, 2.0), 0.5, np.sqrt(1 / 20)),
            ("gamma", (3.0, 2.0), 1.5, np.sqrt(3) / 2),
            ("exponential", (2.0,), 0.5, 0.5),
            ("poisson", (4.0,), 4.0, 2.0),
            ("log_normal", (0.0, 0.25), np.exp(0.03125), None),
        ],
    )
    def test_moments(self, name, args, mean, std):
        dist = getattr(g, name)
        samples = jax.jit(
            lambda k: jax.vmap(lambda kk: dist.sample(kk, *args))(
                jax.random.split(k, N_SAMPLES)
            )
        )(KEY)
        assert float(jnp.mean(samples)) == pytest.approx(mean, rel=0.03)
        if std is not None:
            assert float(jnp.std(samples)) == pytest.approx(std, rel=0.05)


class TestDiscreteSamplerDensityConsistency:
    """The sampler and the log-pmf must agree: empirical frequencies vs
    exp(logpdf) over the head of the support."""

    @pytest.mark.parametrize(
        "name,args,support",
        [
            ("geometric", (float(np.log(0.3 / 0.7)),), range(8)),
            ("binomial", (6.0, float(np.log(0.4 / 0.6))), range(7)),
            ("negative_binomial", (4.0, float(np.log(0.3 / 0.7))), range(12)),
            ("poisson", (2.5,), range(10)),
            ("beta_binomial", (5.0, 2.0, 3.0), range(6)),
            ("skellam", (2.0, 1.0), range(-4, 8)),
        ],
    )
    def test_empirical_pmf(self, name, args, support):
        dist = getattr(g, name)
        n = 40000
        samples = jax.jit(
            lambda k: jax.vmap(lambda kk: dist.sample(kk, *args))(
                jax.random.split(k, n)
            )
        )(KEY)
        samples = np.asarray(samples)
        for s in support:
            emp = float(np.mean(samples == s))
            pmf = float(np.exp(float(dist.logpdf(jnp.asarray(s), *args))))
            assert emp == pytest.approx(pmf, abs=0.012), (name, s)


from genjax_tpu.dists import (
    categorical,
    dirichlet_multinomial,
    power_spherical,
    skellam,
    von_mises_fisher,
)


class TestBatchAndSampleShapeRegressions:
    """Round-2 review regressions: TFP batch/sample-shape semantics."""

    def test_categorical_batched_value_unbatched_logits(self):
        # pre-fix: take_along_axis ndim mismatch crash
        s, _ = categorical.assess(
            g.ChoiceMap.choice(jnp.array([0, 1, 2])), (jnp.ones(5),)
        )
        assert s.shape == (3,)
        assert jnp.allclose(s, -jnp.log(5.0))

    def test_dirichlet_multinomial_sample_shape(self):
        x = dirichlet_multinomial.sample(
            jax.random.key(0), 10, jnp.ones(3), sample_shape=(4,)
        )
        assert x.shape == (4, 3)
        assert jnp.all(jnp.sum(x, -1) == 10)

    def test_directional_sample_shape(self):
        y = power_spherical.sample(
            jax.random.key(1), jnp.array([1.0, 0.0, 0.0]), 5.0,
            sample_shape=(4,),
        )
        assert y.shape == (4, 3)
        assert jnp.allclose(jnp.linalg.norm(y, axis=-1), 1.0, atol=1e-5)
        z = von_mises_fisher.sample(
            jax.random.key(2), jnp.array([1.0, 0.0, 0.0]), 5.0,
            sample_shape=(2, 3),
        )
        assert z.shape == (2, 3, 3)

    def test_skellam_large_rates(self):
        # pre-fix: the 256-term ascending Bessel series underflowed for
        # x = 2*sqrt(mu1*mu2) beyond a few hundred
        from scipy import stats as sstats

        for mu1, mu2, k in [(1e4, 1e4, 0), (1e4, 9e3, 50), (500.0, 700.0, -30)]:
            got = float(skellam.logpdf(jnp.asarray(k), mu1, mu2))
            exact = float(sstats.skellam.logpmf(k, mu1, mu2))
            # float32 floor: eps(2e4) ~ 2e-3 in the x - (mu1+mu2)
            # cancellation; pre-fix the error was hundreds of nats
            assert got == pytest.approx(exact, abs=5e-3), (mu1, mu2, k)

    def test_von_mises_fisher_large_concentration(self):
        # log C_d(kappa) uses log I_{d/2-1}(kappa); check normalization by
        # quadrature-free identity: density at the mean minus density at
        # the antipode equals 2*kappa
        mu = jnp.array([1.0, 0.0, 0.0])
        for kappa in [10.0, 500.0, 5000.0]:
            lp_mu = float(von_mises_fisher.logpdf(mu, mu, kappa))
            lp_anti = float(von_mises_fisher.logpdf(-mu, mu, kappa))
            assert lp_mu - lp_anti == pytest.approx(2 * kappa, rel=1e-4)


def _cat():
    from genjax_tpu.dists import catalog

    return catalog


class TestCatalogEdgeCases:
    """Regressions from the round-2 review sweep."""

    def test_truncated_normal_tail_window(self):
        # ndtr saturates in f32 for z ≳ 6: the plain CDF difference gave
        # lz = log 0 and a +inf score for tail windows
        lp = _cat().truncated_normal.logpdf(8.5, 0.0, 1.0, 8.0, 9.0)
        import scipy.stats as ss

        expected = ss.truncnorm.logpdf(8.5, 8.0, 9.0)
        assert jnp.isfinite(lp)
        assert float(lp) == pytest.approx(float(expected), abs=5e-2)
        # and the ordinary central window is untouched
        lp0 = _cat().truncated_normal.logpdf(0.5, 0.0, 1.0, -1.0, 1.0)
        assert float(lp0) == pytest.approx(
            float(ss.truncnorm.logpdf(0.5, -1.0, 1.0)), abs=1e-5
        )

    def test_lambert_w_normal_at_mode(self):
        # value exactly at loc with tailweight > 0: 0/0 in |du/dz| had
        # limit 1, not log(1e-30)
        lp = _cat().lambert_w_normal.logpdf(0.0, 0.0, 1.0, 0.5)
        near = _cat().lambert_w_normal.logpdf(1e-4, 0.0, 1.0, 0.5)
        assert float(lp) == pytest.approx(float(near), abs=1e-3)

    def test_von_mises_fisher_zero_concentration_uniform(self):
        import numpy as np

        e1 = jnp.asarray([1.0, 0.0, 0.0])
        lp = _cat().von_mises_fisher.logpdf(e1, e1, 0.0)
        assert float(lp) == pytest.approx(float(-np.log(4 * np.pi)), abs=1e-4)

    def test_sample_shape_prepends_batch(self):
        # TFP semantics: sample_shape + batch_shape
        draws = _cat().normal.sample(
            jax.random.key(0), jnp.zeros(3), 1.0, sample_shape=(5,)
        )
        assert draws.shape == (5, 3)
        cat = _cat().categorical.sample(
            jax.random.key(1), jnp.zeros((5, 4)), sample_shape=(3,)
        )
        assert cat.shape == (3, 5)

    def test_multinomial_sample_shape(self):
        draws = _cat().multinomial.sample(
            jax.random.key(0), 10, jnp.zeros(4), sample_shape=(3,)
        )
        assert draws.shape == (3, 4)
        assert bool(jnp.all(jnp.sum(draws, axis=-1) == 10))

    def test_discrete_hmm_deterministic_transition_finite(self):
        from genjax_tpu.dists.discrete_hmm import DiscreteHMMConfiguration

        cfg = DiscreteHMMConfiguration(5, 1, 1, 0.0, 0.0)
        lt = cfg.log_transition()
        assert bool(jnp.all(jnp.isfinite(jnp.max(lt, axis=-1))))
        assert not bool(jnp.any(jnp.isnan(lt)))
