"""``run_chains_hmc``: the batched trace-path HMC sweep driver.

Validates (per CLAUDE.md conventions) against exact conjugate answers,
plus the structural invariants that distinguish it from a raw column
sweep: unselected/constrained choices stay frozen, and the returned
traces are REAL traces (score consistent with ``assess`` of their own
choices)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference.mcmc import run_chains_hmc


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


OBS = g.C["y"].set(2.0)


def _init(n, key=0):
    return jax.vmap(lambda k: conjugate.generate(k, OBS, ())[0])(
        jr.split(jr.key(key), n)
    )


def test_conjugate_posterior_moments():
    """Posterior is N(1, 0.5): the sweep driver must recover both
    moments (exact-answer validation, CLAUDE.md)."""
    trs = _init(1024)
    trs, acc = jax.jit(
        lambda trs: run_chains_hmc(
            jr.key(1), trs, g.S["mu"], eps=0.5, L=5, n_steps=300
        )
    )(trs)
    mus = trs.get_choices()["mu"]
    assert 0.2 < float(acc) <= 1.0
    assert abs(float(jnp.mean(mus)) - 1.0) < 0.08
    assert abs(float(jnp.var(mus)) - 0.5) < 0.1


def test_frozen_choices_and_score_consistency():
    """Constrained/unselected choices are untouched; returned scores
    equal ``assess`` of the returned choices (real traces, not a
    column-view shim)."""
    trs0 = _init(64, key=3)
    trs, _ = run_chains_hmc(
        jr.key(4), trs0, g.S["mu"], eps=0.4, L=3, n_steps=10
    )
    ys = trs.get_choices()["y"]
    assert jnp.array_equal(ys, trs0.get_choices()["y"])
    # positions moved
    assert not jnp.array_equal(
        trs.get_choices()["mu"], trs0.get_choices()["mu"]
    )
    scores, _ = jax.vmap(lambda tr: conjugate.assess(tr.get_choices(), ()))(
        trs
    )
    np.testing.assert_allclose(scores, trs.get_score(), rtol=1e-5)


def test_matches_per_transition_api_distribution():
    """Same Markov chain as iterating ``mh(HMC(...))``: both paths must
    land on the same posterior (cross-validation of the two drivers)."""
    n, steps = 512, 150

    trs_a = _init(n, key=5)

    @jax.jit
    def per_transition(trs):
        def step(trs, kk):
            ks = jr.split(kk, n)
            trs, accs = jax.vmap(
                lambda k, t: g.mh(k, t, g.HMC(g.S["mu"], 0.5, L=5))
            )(ks, trs)
            return trs, jnp.mean(accs)

        return jax.lax.scan(step, trs, jr.split(jr.key(6), steps))

    trs_a, _ = per_transition(trs_a)
    trs_b, _ = run_chains_hmc(
        jr.key(7), _init(n, key=8), g.S["mu"], eps=0.5, L=5, n_steps=steps
    )
    mu_a = trs_a.get_choices()["mu"]
    mu_b = trs_b.get_choices()["mu"]
    assert abs(float(jnp.mean(mu_a)) - float(jnp.mean(mu_b))) < 0.12
    assert abs(float(jnp.var(mu_a)) - float(jnp.var(mu_b))) < 0.15


@g.gen
def hierarchical():
    tau = g.gamma(2.0, 2.0) @ "tau"
    w = g.mv_normal_diag(jnp.zeros(4), jnp.ones(4) / jnp.sqrt(tau)) @ "w"
    _ = g.normal(jnp.sum(w), 0.5) @ "y"


def test_vector_addresses_and_inv_mass():
    """Multi-address selections (scalar + vector leaves ravel into one z)
    and a diagonal inverse mass both flow through."""
    obs = g.C["y"].set(1.0)
    trs = jax.vmap(lambda k: hierarchical.generate(k, obs, ())[0])(
        jr.split(jr.key(9), 128)
    )
    sel = g.S["tau"] | g.S["w"]
    inv_mass = jnp.full((5,), 0.5)
    trs, acc = run_chains_hmc(
        jr.key(10), trs, sel, eps=0.05, L=5, n_steps=50, inv_mass=inv_mass
    )
    assert 0.2 < float(acc) <= 1.0
    w = trs.get_choices()["w"]
    assert w.shape == (128, 4)
    assert bool(jnp.all(jnp.isfinite(w)))
    # tau is positive-constrained by the model's support: the sweep must
    # not have walked it negative without rejection (gamma logpdf = -inf
    # rejects) — all retained taus are positive
    assert bool(jnp.all(trs.get_choices()["tau"] > 0))


def test_chain_axis_lanes_layout():
    """chain_axis=-1 (chains-on-lanes batches, the bench layout) works."""
    trs = jax.vmap(
        lambda k: conjugate.generate(k, OBS, ())[0], out_axes=-1
    )(jr.split(jr.key(11), 64))
    trs, acc = run_chains_hmc(
        jr.key(12), trs, g.S["mu"], eps=0.5, L=3, n_steps=20, chain_axis=-1
    )
    assert trs.get_choices()["mu"].shape == (64,)
    assert 0.2 < float(acc) <= 1.0


def test_run_chains_nuts_conjugate():
    """The NUTS twin of the batched trace driver: exact conjugate
    moments + frozen-constraint invariant."""
    from genjax_tpu.inference.mcmc import run_chains_nuts

    trs0 = _init(512, key=20)
    trs, acc, leaps = jax.jit(
        lambda trs: run_chains_nuts(
            jr.key(21), trs, g.S["mu"], eps=0.5, n_steps=150
        )
    )(trs0)
    mus = trs.get_choices()["mu"]
    assert 0.5 < float(acc) <= 1.0
    assert float(leaps) >= 1.0
    assert abs(float(jnp.mean(mus)) - 1.0) < 0.1
    assert abs(float(jnp.var(mus)) - 0.5) < 0.12
    assert jnp.array_equal(
        trs.get_choices()["y"], trs0.get_choices()["y"]
    )
