"""Particle Gibbs / PMMH validated against Kalman-exact answers.

The linear-Gaussian SSM admits closed-form smoothing marginals (RTS
smoother) and an exact log-marginal (Kalman filter), so the PG chain's
stationary distribution and the PMMH parameter posterior are both checked
against exact numbers, following the repo convention (CLAUDE.md)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference.pgibbs import csmc_sweep, particle_gibbs, pmmh
from genjax_tpu.models import linear_gaussian_ssm


def kalman_smoother(ys, q, r, init_mean=0.0):
    """RTS smoother for z_t ~ N(z_{t-1}, q), y_t ~ N(z_t, r), z_0 ~ N(m0, q).
    Returns (smoothed_means, smoothed_vars, log_marginal)."""
    T = len(ys)
    fm, fv = np.zeros(T), np.zeros(T)  # filtered
    pm, pv = np.zeros(T), np.zeros(T)  # predicted
    mean, var = init_mean, q
    logZ = 0.0
    for t, y in enumerate(ys):
        pm[t], pv[t] = mean, var
        s = var + r
        logZ += -0.5 * (np.log(2 * np.pi * s) + (y - mean) ** 2 / s)
        gain = var / s
        mean = mean + gain * (y - mean)
        var = var * (1 - gain)
        fm[t], fv[t] = mean, var
        mean, var = mean, var + q
    sm, sv = np.zeros(T), np.zeros(T)
    sm[-1], sv[-1] = fm[-1], fv[-1]
    for t in range(T - 2, -1, -1):
        c = fv[t] / pv[t + 1]  # predicted var at t+1 = fv[t] + q
        sm[t] = fm[t] + c * (sm[t + 1] - pm[t + 1])
        sv[t] = fv[t] + c * c * (sv[t + 1] - pv[t + 1])
    return sm, sv, logZ


@pytest.fixture(scope="module")
def ssm_problem():
    kernel, exact_lm = linear_gaussian_ssm(trans_scale=1.0, obs_scale=0.5)
    T = 8
    rng = np.random.default_rng(0)
    zs = np.cumsum(rng.normal(size=T))
    ys = (zs + 0.5 * rng.normal(size=T)).astype(np.float32)
    obs = g.C[:, "y"].set(jnp.asarray(ys))
    sm, sv, logZ = kalman_smoother(ys, q=1.0, r=0.25)
    return kernel, T, ys, obs, sm, sv, logZ


class TestCSMCSweep:
    def test_unconditional_logz_unbiased(self, ssm_problem):
        kernel, T, ys, obs, _sm, _sv, logZ = ssm_problem
        run = jax.jit(
            lambda k: csmc_sweep(
                k, kernel, 0.0, jnp.zeros(T), obs, None,
                latent_selection=g.S["z"], n_particles=256,
            ).log_marginal
        )
        lms = jax.vmap(run)(jr.split(jr.key(1), 64))
        # logmeanexp of unbiased estimates converges to the exact logZ
        est = jax.scipy.special.logsumexp(lms) - jnp.log(64)
        assert float(est) == pytest.approx(logZ, abs=0.15)

    def test_retained_trajectory_survives(self, ssm_problem):
        """With a huge retained-weight advantage the output must be able to
        return the retained path; with AS off and K=2 the retained slot is
        deterministic, so pinning is directly observable."""
        kernel, T, ys, obs, _sm, _sv, _ = ssm_problem
        # retained = exactly the observations (high p(y|z)): should be
        # returned often by the final categorical
        ret = g.C["z"].set(jnp.asarray(ys))
        out = jax.jit(
            lambda k: csmc_sweep(
                k, kernel, 0.0, jnp.zeros(T), obs, ret,
                latent_selection=g.S["z"], n_particles=2,
                ancestor_sampling=False,
            )
        )(jr.key(2))
        # structure round-trips: output has the same treedef as the input
        assert (
            jax.tree_util.tree_structure(out.retained)
            == jax.tree_util.tree_structure(ret)
        )
        zs = out.retained.get_submap("z").get_value()
        assert zs.shape == (T,)

    def test_sweep_structure_feeds_back(self, ssm_problem):
        """A sweep's output trajectory is a valid retained input."""
        kernel, T, ys, obs, _sm, _sv, _ = ssm_problem
        first = csmc_sweep(
            jr.key(3), kernel, 0.0, jnp.zeros(T), obs, None,
            latent_selection=g.S["z"], n_particles=8,
        )
        second = csmc_sweep(
            jr.key(4), kernel, 0.0, jnp.zeros(T), obs, first.retained,
            latent_selection=g.S["z"], n_particles=8,
        )
        assert second.retained.get_submap("z").get_value().shape == (T,)


class TestParticleGibbs:
    @pytest.mark.parametrize("ancestor_sampling", [True, False])
    def test_smoothing_posterior_exact(self, ssm_problem, ancestor_sampling):
        kernel, T, ys, obs, sm, sv, _ = ssm_problem
        n_sweeps = 600
        run = jax.jit(
            lambda k: particle_gibbs(
                k, kernel, 0.0, jnp.zeros(T), obs,
                latent_selection=g.S["z"], n_particles=64,
                n_sweeps=n_sweeps, ancestor_sampling=ancestor_sampling,
            )
        )
        out = run(jr.key(5))
        zs = out.trajectories.get_submap("z").get_value()  # (sweeps, T)
        assert zs.shape == (n_sweeps, T)
        draws = np.asarray(zs[100:])  # burn-in
        # smoothed means within MC error of the RTS smoother
        np.testing.assert_allclose(draws.mean(0), sm, atol=0.25)
        # marginal variances in the right range (ratio check, every t)
        ratio = draws.var(0) / sv
        assert np.all(ratio > 0.5) and np.all(ratio < 1.7)

    def test_ancestor_sampling_mixes_early_steps(self, ssm_problem):
        """Path degeneracy: without AS the z_0 chain moves only when the
        whole path regenerates; with AS it refreshes per sweep. Compare
        lag-1 autocorrelation of z_0 across sweeps."""
        kernel, T, ys, obs, _sm, _sv, _ = ssm_problem

        def rho1(ancestor_sampling):
            out = jax.jit(
                lambda k: particle_gibbs(
                    k, kernel, 0.0, jnp.zeros(T), obs,
                    latent_selection=g.S["z"], n_particles=16,
                    n_sweeps=400, ancestor_sampling=ancestor_sampling,
                )
            )(jr.key(6))
            z0 = np.asarray(
                out.trajectories.get_submap("z").get_value()[50:, 0]
            )
            z0 = z0 - z0.mean()
            return float((z0[1:] * z0[:-1]).mean() / (z0 * z0).mean())

        assert rho1(True) < rho1(False) + 0.05
        assert rho1(True) < 0.6


class TestPMMH:
    """Drifted random walk: z_t ~ N(z_{t-1} + m, 1), y_t ~ N(z_t, 0.25),
    with prior m ~ N(0, 1). The drift shifts the Kalman predictive means,
    so logZ(m) is exact and the m-posterior is a 1-D quadrature."""

    T = 10

    @staticmethod
    def _exact_logz(ys, m):
        q, r = 1.0, 0.25
        mean, var = m, q  # z_0 ~ N(m, q) given init carry 0
        logZ = 0.0
        for y in ys:
            s = var + r
            logZ += -0.5 * (np.log(2 * np.pi * s) + (y - mean) ** 2 / s)
            gain = var / s
            mean = mean + gain * (y - mean) + m
            var = var * (1 - gain) + q
        return logZ

    @pytest.fixture(scope="class")
    def drift_problem(self):
        rng = np.random.default_rng(7)
        m_true = 0.6
        zs = np.cumsum(m_true + rng.normal(size=self.T))
        ys = (zs + 0.5 * rng.normal(size=self.T)).astype(np.float32)
        # exact posterior over m on a dense grid
        grid = np.linspace(-2.0, 3.0, 2001)
        logp = np.array(
            [self._exact_logz(ys, m) - 0.5 * m**2 for m in grid]
        )
        w = np.exp(logp - logp.max())
        w /= w.sum()
        post_mean = float((grid * w).sum())
        post_std = float(np.sqrt(((grid - post_mean) ** 2 * w).sum()))
        return ys, post_mean, post_std

    def test_exact_marginal_mh(self, drift_problem):
        """log_z_fn = exact Kalman logZ: PMMH reduces to marginal MH and
        must recover the quadrature posterior."""
        ys, post_mean, post_std = drift_problem
        ys_j = jnp.asarray(ys)

        def exact_lz(_key, m):
            q, r = 1.0, 0.25
            def body(carry, y):
                mean, var, lz = carry
                s = var + r
                lz = lz - 0.5 * (jnp.log(2 * jnp.pi * s) + (y - mean) ** 2 / s)
                gain = var / s
                mean = mean + gain * (y - mean) + m
                var = var * (1 - gain) + q
                return (mean, var, lz), None
            (_, _, lz), _ = jax.lax.scan(body, (m, q, 0.0), ys_j)
            return lz

        out = jax.jit(
            lambda k: pmmh(
                k, 0.0, lambda m: -0.5 * m**2, exact_lz,
                n_steps=4000, step_scales=0.5,
            )
        )(jr.key(8))
        chain = np.asarray(out.params)[500:]
        assert float(out.accept_rate) > 0.15
        assert chain.mean() == pytest.approx(post_mean, abs=3 * post_std / 10)
        assert chain.std() == pytest.approx(post_std, rel=0.35)

    def test_pf_estimated_marginal(self, drift_problem):
        """log_z_fn = the particle filter's unbiased logZ at modest K: the
        chain still targets the exact posterior (PMMH exactness)."""
        from genjax_tpu.parallel import SSMParticleFilter

        ys, post_mean, post_std = drift_problem
        obs = g.C[:, "y"].set(jnp.asarray(ys))
        from genjax_tpu.dists import normal
        from genjax_tpu.lang.static_lang import gen

        @gen
        def kernel(carry, x):
            z_prev, m = carry
            z = normal(z_prev + m, 1.0) @ "z"
            y = normal(z, 0.5) @ "y"
            return ((z, m), y)

        pf = SSMParticleFilter(kernel, n_particles=256, ess_threshold=2.0)

        def pf_lz(key, m):
            ks = jr.split(key)[0]
            res = pf.run(ks, (0.0, m), jnp.zeros(self.T), obs)
            return res.log_marginal

        out = jax.jit(
            lambda k: pmmh(
                k, 0.0, lambda m: -0.5 * m**2, pf_lz,
                n_steps=1500, step_scales=0.5,
            )
        )(jr.key(9))
        chain = np.asarray(out.params)[300:]
        assert chain.mean() == pytest.approx(post_mean, abs=0.55 * post_std)
        assert chain.std() == pytest.approx(post_std, rel=0.5)
