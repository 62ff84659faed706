"""Enumerative Gibbs validated against exact full conditionals.

Every check is against a closed form (CLAUDE.md convention): the
enumerated ``GibbsInfo.log_probs`` must equal the hand-computed
conditional exactly (deterministic, 1e-4), and sampled frequencies must
match at Monte-Carlo tolerance."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.scipy.special import logsumexp
from jax.scipy.stats import norm

import genjax_tpu as g
from genjax_tpu import gen, normal, categorical, flip
from genjax_tpu.inference.gibbs import (
    enum_move,
    enum_vmap_move,
    enumerative_gibbs,
    enumerative_gibbs_vmap,
    gibbs_sweep,
    mh_move,
)

LOG_PI = jnp.log(jnp.asarray([0.2, 0.5, 0.3]))
MUS = jnp.asarray([-2.0, 0.0, 3.0])
X_OBS = 0.7


@gen
def scalar_model():
    z = categorical(LOG_PI) @ "z"
    x = normal(MUS[z], 1.0) @ "x"
    return x


def exact_conditional(x):
    lw = LOG_PI + norm.logpdf(x, MUS, 1.0)
    return lw - logsumexp(lw)


class TestScalarEnumGibbs:
    def _trace(self, key):
        cm = g.C["x"].set(X_OBS)
        tr, _ = scalar_model.generate(key, cm, ())
        return tr

    def test_log_probs_exact(self):
        tr = self._trace(jr.PRNGKey(0))
        _, info = enumerative_gibbs(jr.PRNGKey(1), tr, "z", jnp.arange(3))
        np.testing.assert_allclose(
            np.asarray(info.log_probs),
            np.asarray(exact_conditional(X_OBS)),
            atol=1e-4,
        )

    def test_sampled_frequencies_match_exact(self):
        tr = self._trace(jr.PRNGKey(0))

        @jax.jit
        def one(k):
            new, _ = enumerative_gibbs(k, tr, "z", jnp.arange(3))
            return new.get_choices()["z"]

        zs = jax.vmap(one)(jr.split(jr.PRNGKey(2), 4000))
        freq = np.bincount(np.asarray(zs), minlength=3) / 4000
        exact = np.exp(np.asarray(exact_conditional(X_OBS)))
        np.testing.assert_allclose(freq, exact, atol=0.03)

    def test_new_trace_score_consistent(self):
        tr = self._trace(jr.PRNGKey(0))
        new, _ = enumerative_gibbs(jr.PRNGKey(3), tr, "z", jnp.arange(3))
        score, _ = scalar_model.assess(new.get_choices(), ())
        np.testing.assert_allclose(
            float(new.get_score()), float(score), rtol=1e-5
        )


@gen
def site(x):
    z = categorical(LOG_PI) @ "z"
    y = normal(MUS[z], 1.0) @ "y"
    return y


@gen
def vmapped_model(xs):
    ys = site.vmap(in_axes=(0,)) (xs) @ "assign"
    return ys


XS = jnp.asarray([-1.8, 0.2, 2.5, 0.0])


class TestVmapBlockGibbs:
    def _trace(self, key):
        cm = g.C["assign", jnp.arange(4), "y"].set(XS)
        tr, _ = vmapped_model.generate(key, cm, (XS,))
        return tr

    @pytest.mark.slow
    def test_per_lane_log_probs_exact(self):
        tr = self._trace(jr.PRNGKey(0))
        _, info = enumerative_gibbs_vmap(
            jr.PRNGKey(1), tr, ("assign", None, "z"), jnp.arange(3)
        )
        exact = np.stack(
            [np.asarray(exact_conditional(x)) for x in np.asarray(XS)]
        )
        np.testing.assert_allclose(
            np.asarray(info.log_probs), exact, atol=1e-4
        )

    def test_applied_values_match_sampled_indices(self):
        tr = self._trace(jr.PRNGKey(0))
        new, info = enumerative_gibbs_vmap(
            jr.PRNGKey(2), tr, ("assign", None, "z"), jnp.arange(3)
        )
        got = new.get_choices()["assign", jnp.arange(4), "z"]
        got = got.unmask() if hasattr(got, "unmask") else got
        np.testing.assert_array_equal(np.asarray(got), np.asarray(info.index))
        score, _ = vmapped_model.assess(new.get_choices(), (XS,))
        np.testing.assert_allclose(
            float(new.get_score()), float(score), rtol=1e-5
        )

    def test_lane_batch_matches_full_vmap(self):
        """Chunked lane processing is a pure memory knob: same key must
        give bit-identical conditionals and draws, including a chunk size
        that does not divide n_lanes (padding path)."""
        tr = self._trace(jr.PRNGKey(0))
        full, info_full = enumerative_gibbs_vmap(
            jr.PRNGKey(2), tr, ("assign", None, "z"), jnp.arange(3)
        )
        for lb in (1, 2, 3, 4, 7):
            _, info_lb = enumerative_gibbs_vmap(
                jr.PRNGKey(2),
                tr,
                ("assign", None, "z"),
                jnp.arange(3),
                lane_batch=lb,
            )
            np.testing.assert_allclose(
                np.asarray(info_lb.log_probs),
                np.asarray(info_full.log_probs),
                atol=1e-6,
            )
            np.testing.assert_array_equal(
                np.asarray(info_lb.index), np.asarray(info_full.index)
            )

    def test_top_level_vmap_trace(self):
        vm = site.vmap(in_axes=(0,))
        cm = g.C[jnp.arange(4), "y"].set(XS)
        tr, _ = vm.generate(jr.PRNGKey(0), cm, (XS,))
        _, info = enumerative_gibbs_vmap(
            jr.PRNGKey(1), tr, (None, "z"), jnp.arange(3)
        )
        exact = np.stack(
            [np.asarray(exact_conditional(x)) for x in np.asarray(XS)]
        )
        np.testing.assert_allclose(
            np.asarray(info.log_probs), exact, atol=1e-4
        )


@gen
def mixed_model():
    mu = normal(0.0, 1.0) @ "mu"
    z = flip(0.3) @ "z"
    x = normal(mu + 2.0 * jnp.float32(z), 1.0) @ "x"
    return x


def mixed_exact(x_obs):
    """Marginalize z; per-branch Gaussian conjugacy for mu.

    Branch z: x ~ N(mu + 2z, 1), mu ~ N(0,1) → marginal x ~ N(2z, 2),
    posterior mu|x,z ~ N((x-2z)/2, 1/2).
    """
    lw = np.array(
        [
            np.log(0.7) + norm.logpdf(x_obs, 0.0, np.sqrt(2.0)),
            np.log(0.3) + norm.logpdf(x_obs, 2.0, np.sqrt(2.0)),
        ]
    )
    p = np.exp(lw - logsumexp(jnp.asarray(lw)))
    mu_means = np.array([x_obs / 2.0, (x_obs - 2.0) / 2.0])
    return p, float(p @ mu_means)


class TestGibbsSweep:
    def test_gibbs_within_mh_posterior(self):
        x_obs = 1.4
        p_z, mu_mean = mixed_exact(x_obs)
        cm = g.C["x"].set(x_obs)
        tr, _ = mixed_model.generate(jr.PRNGKey(0), cm, ())
        from genjax_tpu.inference.requests.hmc import HMC

        moves = [
            enum_move("z", jnp.asarray([False, True])),
            mh_move(HMC(g.S["mu"], 0.25, 8)),
        ]

        def record(t):
            ch = t.get_choices()
            return (ch["z"], ch["mu"])

        res = gibbs_sweep(
            jr.PRNGKey(1), tr, moves, n_sweeps=1500, record=record
        )
        zs, mus = res.history
        zs, mus = np.asarray(zs[300:]), np.asarray(mus[300:])
        np.testing.assert_allclose(zs.mean(), p_z[1], atol=0.05)
        np.testing.assert_allclose(mus.mean(), mu_mean, atol=0.08)

    def test_sweep_history_shape_and_vmap_move(self):
        cm = g.C["assign", jnp.arange(4), "y"].set(XS)
        tr, _ = vmapped_model.generate(jr.PRNGKey(0), cm, (XS,))
        res = gibbs_sweep(
            jr.PRNGKey(1),
            tr,
            [enum_vmap_move(("assign", None, "z"), jnp.arange(3), n_lanes=4)],
            n_sweeps=10,
            record=lambda t: t.get_choices()["assign", jnp.arange(4), "z"],
        )
        hist = res.history
        hist = hist.unmask() if hasattr(hist, "unmask") else hist
        assert np.asarray(hist).shape == (10, 4)


class TestShardedChains:
    def test_enum_gibbs_vmapped_over_sharded_chain_axis(self):
        """The move is pure (key, trace) -> trace, so a chain batch shards
        like any other: vmap over a mesh-sharded key axis must reproduce
        the exact conditional frequencies."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from genjax_tpu.parallel import make_mesh

        mesh = make_mesh()
        cm = g.C["x"].set(X_OBS)
        tr, _ = scalar_model.generate(jr.PRNGKey(0), cm, ())

        n = 2048
        keys = jr.split(jr.PRNGKey(9), n)
        keys = jax.device_put(keys, NamedSharding(mesh, P("batch")))

        @jax.jit
        def one(k):
            new, _ = enumerative_gibbs(k, tr, "z", jnp.arange(3))
            return new.get_choices()["z"]

        zs = jax.vmap(one)(keys)
        freq = np.bincount(np.asarray(zs), minlength=3) / n
        exact = np.exp(np.asarray(exact_conditional(X_OBS)))
        np.testing.assert_allclose(freq, exact, atol=0.04)
