"""SMC correctness against exact answers.

Modeled on reference tests /root/reference/tests/inference/test_smc.py —
IS logZ estimates converge to analytic log-marginals as K grows, with
tolerance tightening (SURVEY.md §4 style 3, §6 de-facto baseline:
1e-1 @ K=1 → 1e-3 @ K=1000 on small flip models).
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.inference import ChangeTarget, Importance, ImportanceK, Target

KEY = jax.random.key(314159)


@g.gen
def flip_model():
    p = g.beta(2.0, 2.0) @ "p"
    v = g.flip(p) @ "v"
    return v


def exact_flip_logZ():
    # P(v=True) = E[p] under Beta(2,2) = 0.5
    return jnp.log(0.5)


class TestImportance:
    @pytest.mark.slow
    def test_one_particle_logZ_loose(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        alg = Importance(target)
        # average many independent 1-particle estimates
        keys = jax.random.split(KEY, 2000)
        logZs = jax.vmap(
            lambda k: alg.run_smc(k).get_log_marginal_likelihood_estimate()
        )(keys)
        est = jax.scipy.special.logsumexp(logZs) - jnp.log(2000)
        assert est == pytest.approx(exact_flip_logZ(), abs=2e-2)

    def test_importance_k_convergence(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        for k, tol in [(10, 3e-1), (100, 1e-1), (1000, 5e-2)]:
            alg = ImportanceK(target, k_particles=k)
            logZ = jax.jit(alg.run_smc)(KEY).get_log_marginal_likelihood_estimate()
            assert logZ == pytest.approx(exact_flip_logZ(), abs=tol), k

    def test_random_weighted_is_posterior_sample(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        alg = ImportanceK(target, k_particles=100)
        w, chm = alg.random_weighted(KEY, target)
        # the sample has only the unconstrained address
        p = chm["p"]
        p = p.unmask() if isinstance(p, g.Mask) else p
        assert 0.0 < float(p) < 1.0
        assert not chm.get_submap("v").has_value()

    @pytest.mark.slow
    def test_estimate_logpdf_unbiasedness_smoke(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        alg = ImportanceK(target, k_particles=50)
        w, chm = alg.random_weighted(KEY, target)
        lp = alg.estimate_logpdf(jax.random.key(1), chm, target)
        assert jnp.isfinite(lp)

    def test_effective_sample_size(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        alg = ImportanceK(target, k_particles=100)
        c = alg.run_smc(KEY)
        ess = c.effective_sample_size()
        assert 1.0 <= float(ess) <= 100.0


class TestChangeTarget:
    def test_reweight_to_same_target_preserves_logZ(self):
        target = Target(flip_model, (), g.C["v"].set(True))
        alg = ImportanceK(target, k_particles=500)
        changed = ChangeTarget(alg, target)
        logZ = jax.jit(changed.run_smc)(KEY).get_log_marginal_likelihood_estimate()
        assert logZ == pytest.approx(exact_flip_logZ(), abs=5e-2)

    def test_change_to_different_observation(self):
        t1 = Target(flip_model, (), g.C["v"].set(True))
        t2 = Target(flip_model, (), g.C["v"].set(False))
        alg = ImportanceK(t1, k_particles=1000)
        changed = ChangeTarget(alg, t2)
        logZ = jax.jit(changed.run_smc)(KEY).get_log_marginal_likelihood_estimate()
        # P(v=False) = 0.5 as well
        assert logZ == pytest.approx(jnp.log(0.5), abs=5e-2)


class TestMarginal:
    def test_marginal_density(self):
        m = flip_model.marginal(selection=g.S["v"])
        # marginal of v: P(v=True) = 0.5
        lp = m.estimate_logpdf(KEY, g.C["v"].set(True))
        # estimate_logpdf without algorithm = importance weight (single sample)
        assert jnp.isfinite(lp)

    def test_marginal_with_algorithm(self):
        def make_alg(target):
            return ImportanceK(target, k_particles=200)

        # marginal of "v" with nested SMC for the density estimate
        target_stub = Target(flip_model, (), g.C["v"].set(True))
        alg = ImportanceK(target_stub, k_particles=200)
        m = g.Marginal(
            flip_model,
            g.Pytree.const(g.S["v"]),
            g.Pytree.const(alg),
        )
        lps = jax.vmap(
            lambda k: m.estimate_logpdf(k, g.C["v"].set(True))
        )(jax.random.split(KEY, 200))
        est = jax.scipy.special.logsumexp(lps) - jnp.log(200)
        assert est == pytest.approx(jnp.log(0.5), abs=5e-2)


class TestSMCOnScan:
    def test_ssm_logZ_matches_exact_hmm(self):
        """Particle logZ on a discrete HMM vs the exact forward-algorithm
        marginal."""
        from genjax_tpu.inference.exact_testbed import (
            build_test_against_exact_inference,
        )

        gen_problem, chain, config = build_test_against_exact_inference(
            max_length=5,
            state_space_size=4,
            transition_distance_truncation=1,
            observation_distance_truncation=1,
            transition_variance=0.5,
            observation_variance=0.5,
        )
        problem = gen_problem(KEY)
        # the problem object is self-consistent: its initial_state IS the
        # fixed midpoint the exact forward filter assumes
        init = problem.initial_state
        assert int(init) == config.linear_grid_dim // 2
        obs_constraint = g.C[:, "x"].set(problem.observation_sequence)
        target = Target(chain, (init, jnp.zeros(5)), obs_constraint)
        exact_logZ = g.DiscreteHMM.data_logpdf(
            config, problem.observation_sequence
        )
        alg = ImportanceK(target, k_particles=2000)
        est = jax.jit(alg.run_smc)(KEY).get_log_marginal_likelihood_estimate()
        assert est == pytest.approx(exact_logZ, abs=0.15)
