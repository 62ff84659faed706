"""Exact enumeration validated against hand computations and the HMM
forward algorithm."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.scipy.special import logsumexp
from jax.scipy.stats import norm

import genjax_tpu as g
from genjax_tpu import gen, normal, categorical
from genjax_tpu.inference.enumerate_ import enumerate_posterior
from genjax_tpu.inference.gibbs import enumerative_gibbs

LOG_PI = jnp.log(jnp.asarray([0.2, 0.5, 0.3]))
MUS = jnp.asarray([-2.0, 0.0, 3.0])


@gen
def one_site():
    z = categorical(LOG_PI) @ "z"
    _ = normal(MUS[z], 1.0) @ "x"


class TestSingleSite:
    def test_posterior_and_evidence_exact(self):
        x = 0.7
        res = enumerate_posterior(
            one_site, (), g.C["x"].set(x), {"z": jnp.arange(3)}
        )
        lw = np.asarray(LOG_PI) + norm.logpdf(x, np.asarray(MUS), 1.0)
        np.testing.assert_allclose(
            np.asarray(res.log_evidence), logsumexp(jnp.asarray(lw)), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.log_posterior),
            lw - np.asarray(logsumexp(jnp.asarray(lw))),
            atol=1e-5,
        )

    def test_agrees_with_enumerative_gibbs(self):
        """The Gibbs move's conditional equals the enumerated posterior
        when there is a single site."""
        x = -1.1
        res = enumerate_posterior(
            one_site, (), g.C["x"].set(x), {"z": jnp.arange(3)}
        )
        tr, _ = one_site.generate(jr.PRNGKey(0), g.C["x"].set(x), ())
        _, info = enumerative_gibbs(jr.PRNGKey(1), tr, "z", jnp.arange(3))
        np.testing.assert_allclose(
            np.asarray(info.log_probs),
            np.asarray(res.log_posterior),
            atol=1e-4,
        )


@gen
def two_step_hmm():
    # 2-state chain: z0 ~ Cat(p0), z1 | z0 ~ Cat(T[z0]), y_t ~ N(mu[z_t], 1)
    z0 = categorical(jnp.log(jnp.asarray([0.6, 0.4]))) @ "z0"
    T = jnp.log(jnp.asarray([[0.8, 0.2], [0.3, 0.7]]))
    z1 = categorical(T[z0]) @ "z1"
    mu = jnp.asarray([-1.0, 1.5])
    _ = normal(mu[z0], 1.0) @ "y0"
    _ = normal(mu[z1], 1.0) @ "y1"


class TestJointTable:
    def test_matches_forward_algorithm(self):
        y0, y1 = 0.3, 1.0
        obs = g.C["y0"].set(y0) | g.C["y1"].set(y1)
        res = enumerate_posterior(
            two_step_hmm,
            (),
            obs,
            {"z0": jnp.arange(2), "z1": jnp.arange(2)},
        )
        # Hand forward algorithm.
        p0 = np.array([0.6, 0.4])
        T = np.array([[0.8, 0.2], [0.3, 0.7]])
        mu = np.array([-1.0, 1.5])
        e0 = np.exp(norm.logpdf(y0, jnp.asarray(mu), 1.0))
        e1 = np.exp(norm.logpdf(y1, jnp.asarray(mu), 1.0))
        joint = (p0 * e0)[:, None] * T * e1[None, :]
        np.testing.assert_allclose(
            np.exp(np.asarray(res.log_joint)), joint, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(res.log_evidence), np.log(joint.sum()), atol=1e-5
        )
        # Marginal over z1 (axis 1 of the table).
        np.testing.assert_allclose(
            np.exp(np.asarray(res.marginal(1))),
            joint.sum(axis=0) / joint.sum(),
            atol=1e-5,
        )

    def test_table_size_guard(self):
        obs = g.C["y0"].set(0.0) | g.C["y1"].set(0.0)
        try:
            enumerate_posterior(
                two_step_hmm,
                (),
                obs,
                {"z0": jnp.arange(4096), "z1": jnp.arange(4096)},
            )
            raise AssertionError("expected table-size ValueError")
        except ValueError as e:
            assert "joint states" in str(e)

    def test_missing_site_errors(self):
        obs = g.C["y0"].set(0.0) | g.C["y1"].set(0.0)
        try:
            enumerate_posterior(two_step_hmm, (), obs, {"z0": jnp.arange(2)})
            raise AssertionError("expected MissingAddress")
        except Exception as e:
            assert "z1" in str(e) or "Missing" in type(e).__name__
