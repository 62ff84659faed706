"""SliceSample edit request vs exact posteriors: conjugate normal
(closed form) and a Laplace-prior model (1-D quadrature ground truth —
the non-Gaussian case EllipticalSlice cannot handle)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from scipy.stats import laplace, norm

import genjax_tpu as g
from genjax_tpu.inference.mcmc import mh
from genjax_tpu.inference.requests.slice_ import SliceSample

N_CHAINS = 512
N_STEPS = 150


def run_chains(model, constraint, req, key):
    def one(k):
        k0, k1 = jr.split(k)
        tr, _ = model.generate(k0, constraint, ())

        def step(t, kk):
            t2, _ = mh(kk, t, req)
            return t2, None

        tr, _ = jax.lax.scan(step, tr, jr.split(k1, N_STEPS))
        return tr

    return jax.jit(jax.vmap(one))(jr.split(key, N_CHAINS))


class TestConjugate:
    def test_normal_normal_moments(self):
        @g.gen
        def model():
            mu = g.normal(1.0, 2.0) @ "mu"
            g.normal(mu, 0.5) @ "y"

        v = 1.0 / (1.0 / 4.0 + 1.0 / 0.25)
        m = v * (1.0 / 4.0 + 2.4 / 0.25)
        trs = run_chains(
            model, g.C["y"].set(2.4), SliceSample(g.S["mu"]), jr.key(0)
        )
        mus = np.asarray(trs.get_choices()["mu"])
        np.testing.assert_allclose(mus.mean(), m, atol=0.05)
        np.testing.assert_allclose(mus.var(), v, rtol=0.15)

    def test_weight_zero_and_vector_selection_rejected(self):
        @g.gen
        def model():
            mu = g.normal(0.0, 1.0) @ "mu"
            w = g.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            g.normal(mu + w[0], 1.0) @ "y"

        tr, _ = model.generate(jr.key(1), g.C["y"].set(0.5), ())
        new, w, _, bwd = tr.edit(jr.key(2), SliceSample(g.S["mu"]))
        assert float(w) == 0.0 and isinstance(bwd, SliceSample)
        assert float(new.get_choices()["mu"]) != float(
            tr.get_choices()["mu"]
        )
        with pytest.raises(ValueError, match="exactly one scalar"):
            tr.edit(jr.key(3), SliceSample(g.S["w"]))


class TestNonGaussianPrior:
    def test_laplace_prior_posterior_via_quadrature(self):
        """x ~ Laplace(0, 1); y ~ N(x, 0.5), y = 1.2: ground truth by
        dense quadrature — the tuning-free non-Gaussian case."""
        y_obs, s = 1.2, 0.5

        @g.gen
        def model():
            x = g.laplace(0.0, 1.0) @ "x"
            g.normal(x, s) @ "y"

        grid = np.linspace(-6, 8, 4001)
        lw = laplace.logpdf(grid) + norm.logpdf(y_obs, grid, s)
        w = np.exp(lw - lw.max())
        w /= w.sum()
        m_exact = float(w @ grid)
        v_exact = float(w @ (grid - m_exact) ** 2)

        trs = run_chains(
            model,
            g.C["y"].set(y_obs),
            SliceSample(g.S["x"], width=1.0),
            jr.key(4),
        )
        xs = np.asarray(trs.get_choices()["x"])
        np.testing.assert_allclose(xs.mean(), m_exact, atol=0.05)
        np.testing.assert_allclose(xs.var(), v_exact, rtol=0.2)

    def test_bimodal_slice_mixes_across_modes(self):
        """Slice with a wide bracket crosses a moderate energy barrier —
        the mixture weights must come out right (a biased stepping-out
        would skew the mode masses)."""

        @g.gen
        def mixture_model():
            x = g.normal(0.0, 3.0) @ "x"
            # pseudo-likelihood shaping a bimodal posterior on x
            g.normal(jnp.abs(x), 0.3) @ "y"

        # posterior ∝ N(x; 0, 3) N(y=2 | |x|, .3): symmetric bimodal ±2
        trs = run_chains(
            mixture_model,
            g.C["y"].set(2.0),
            SliceSample(g.S["x"], width=4.0),
            jr.key(5),
        )
        xs = np.asarray(trs.get_choices()["x"])
        frac_pos = (xs > 0).mean()
        assert 0.35 < frac_pos < 0.65, frac_pos
        np.testing.assert_allclose(np.abs(xs).mean(), 1.95, atol=0.15)
