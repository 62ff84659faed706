"""ADEV gradient-estimator exactness tests.

Modeled on reference /root/reference/tests/adev/test_adev.py — JVP/grad
estimates compared to closed-form derivatives across parameter sweeps
(SURVEY.md §4 style 4; de-facto baseline rel. err ≤ 1e-4 for exact
strategies).
"""

import jax
import jax.numpy as jnp
import pytest

from genjax_tpu.adev import (
    Dual,
    add_cost,
    baseline,
    beta_implicit,
    categorical_enum_parallel,
    expectation,
    flip_enum,
    flip_enum_parallel,
    flip_mvd,
    flip_reinforce,
    mv_normal_diag_reparam,
    normal_reinforce,
    normal_reparam,
)

KEY = jax.random.key(314159)


class TestExactStrategies:
    """Enumeration strategies are exactly correct (zero variance)."""

    def test_flip_enum_branch_loss(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 7.0, lambda: 3.0)

        # E = 3 + 4p, dE/dp = 4 exactly, for any p
        for p in [0.1, 0.3, 0.7, 0.9]:
            (grad,) = loss.grad_estimate(KEY, (p,))
            assert grad == pytest.approx(4.0, rel=1e-5)
            est = loss.estimate(KEY, (p,))
            assert est == pytest.approx(3.0 + 4.0 * p, rel=1e-5)

    def test_flip_enum_jvp(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        dual = loss.jvp_estimate(KEY, (Dual(0.4, 1.0),))
        assert dual.primal == pytest.approx(0.4, rel=1e-5)
        assert dual.tangent == pytest.approx(1.0, rel=1e-5)

    def test_flip_enum_parallel(self):
        @expectation
        def loss(p):
            b = flip_enum_parallel(p)
            return jax.lax.cond(b, lambda: 5.0, lambda: 1.0)

        (grad,) = loss.grad_estimate(KEY, (0.25,))
        assert grad == pytest.approx(4.0, rel=1e-5)

    def test_categorical_enum(self):
        @expectation
        def loss(logits):
            i = categorical_enum_parallel(logits)
            return jnp.asarray(i, jnp.float32) ** 2

        (grad,) = loss.grad_estimate(KEY, (jnp.zeros(3),))
        # E = sum softmax(l) i^2; at zeros p=1/3, E=5/3
        # dE/dl_j = p_j (j^2 - E)
        expected = (jnp.array([0.0, 1.0, 4.0]) - 5.0 / 3.0) / 3.0
        assert jnp.allclose(grad, expected, atol=1e-5)

    def test_composition_of_enum_and_reparam_in_cond(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(
                b,
                lambda: normal_reparam(2.0, 0.01),
                lambda: normal_reparam(-1.0, 0.01),
            )

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(
            jax.random.split(KEY, 200)
        )
        # E = 2p - (1-p), dE/dp = 3
        assert jnp.mean(grads) == pytest.approx(3.0, abs=0.05)


class TestMonteCarloStrategies:
    def test_normal_reparam_quadratic(self):
        @expectation
        def loss(mu):
            x = normal_reparam(mu, 1.0)
            return (x - 2.0) ** 2

        # dE/dmu = 2(mu - 2)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(
            jax.random.split(KEY, 5000)
        )
        assert jnp.mean(grads) == pytest.approx(-3.0, abs=0.1)

    def test_normal_reinforce_matches_reparam(self):
        @expectation
        def loss(mu):
            x = normal_reinforce(mu, 1.0)
            return (x - 2.0) ** 2

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(
            jax.random.split(KEY, 30000)
        )
        assert jnp.mean(grads) == pytest.approx(-3.0, abs=0.15)

    def test_flip_reinforce(self):
        @expectation
        def loss(p):
            b = flip_reinforce(p)
            return jnp.asarray(b, jnp.float32) * 10.0

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.4,))[0])(
            jax.random.split(KEY, 30000)
        )
        assert jnp.mean(grads) == pytest.approx(10.0, abs=0.3)

    def test_flip_mvd(self):
        @expectation
        def loss(p):
            b = flip_mvd(p)
            return jax.lax.cond(b, lambda: 4.0, lambda: 1.0)

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.3,))[0])(
            jax.random.split(KEY, 2000)
        )
        assert jnp.mean(grads) == pytest.approx(3.0, abs=0.1)

    def test_mv_normal_diag_reparam(self):
        @expectation
        def loss(params):
            mu, sig = params
            x = mv_normal_diag_reparam(mu, sig)
            return jnp.sum(x**2)

        grads = jax.vmap(
            lambda k: loss.grad_estimate(k, ((jnp.ones(3), jnp.ones(3)),))
        )(jax.random.split(KEY, 5000))
        (mu_grads, sig_grads) = grads[0]
        # dE/dmu = 2mu = 2; dE/dsig = 2sig = 2
        assert jnp.allclose(jnp.mean(mu_grads, 0), 2.0, atol=0.15)
        assert jnp.allclose(jnp.mean(sig_grads, 0), 2.0, atol=0.15)

    def test_beta_implicit(self):
        @expectation
        def loss(ab):
            a, b = ab
            return beta_implicit(a, b)

        grads = jax.vmap(lambda k: loss.grad_estimate(k, ((2.0, 2.0),)))(
            jax.random.split(KEY, 5000)
        )
        (da, db) = grads[0]
        # E[Beta(a, b)] = a/(a+b): d/da = 1/8, d/db = -1/8 at (2, 2)
        assert jnp.mean(da) == pytest.approx(0.125, abs=0.02)
        assert jnp.mean(db) == pytest.approx(-0.125, abs=0.02)

    def test_baseline_reduces_variance(self):
        @expectation
        def plain(p):
            b = flip_reinforce(p)
            return jnp.asarray(b, jnp.float32) + 10.0

        @expectation
        def with_baseline(p):
            b = baseline(flip_reinforce)(10.5, p)
            return jnp.asarray(b, jnp.float32) + 10.0

        keys = jax.random.split(KEY, 5000)
        g_plain = jax.vmap(lambda k: plain.grad_estimate(k, (0.4,))[0])(keys)
        g_base = jax.vmap(lambda k: with_baseline.grad_estimate(k, (0.4,))[0])(keys)
        assert jnp.mean(g_plain) == pytest.approx(1.0, abs=0.4)
        assert jnp.mean(g_base) == pytest.approx(1.0, abs=0.2)
        assert jnp.var(g_base) < jnp.var(g_plain)

    def test_add_cost(self):
        @expectation
        def loss(mu):
            x = normal_reparam(mu, 1.0)
            add_cost(3.0 * mu)
            return x

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (1.0,))[0])(
            jax.random.split(KEY, 1000)
        )
        # E = mu + 3mu -> 4
        assert jnp.mean(grads) == pytest.approx(4.0, abs=0.1)


class TestJAXIntegration:
    def test_jit_grad_estimate(self):
        @expectation
        def loss(mu):
            x = normal_reparam(mu, 1.0)
            return x * x

        f = jax.jit(lambda k, mu: loss.grad_estimate(k, (mu,))[0])
        grads = jax.vmap(lambda k: f(k, 1.0))(jax.random.split(KEY, 3000))
        assert jnp.mean(grads) == pytest.approx(2.0, abs=0.1)

    def test_grad_through_parameter_transform(self):
        """Duals propagate through deterministic prologue code."""

        @expectation
        def loss(theta):
            mu = jnp.tanh(theta)
            x = normal_reparam(mu, 1.0)
            return x

        # E = tanh(theta); d/dtheta = 1 - tanh^2
        theta = 0.7
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (theta,))[0])(
            jax.random.split(KEY, 100)
        )
        expected = 1.0 - jnp.tanh(theta) ** 2
        assert jnp.mean(grads) == pytest.approx(expected, abs=1e-4)


class TestBatchedPrimitives:
    def test_vmapped_reparam_draws_keep_strategy(self):
        """Batched-key reparam draws (the ImportanceK/IWELBO pattern) give
        correct gradients through the batched tail-call primitive."""
        from genjax_tpu.adev.core import sample_primitive
        from genjax_tpu.adev.primitives import NormalREPARAM

        nr = NormalREPARAM()

        @expectation
        def loss(mu):
            keys = jax.random.split(jax.random.key(1), 4)
            xs = jax.vmap(lambda k: sample_primitive(nr, mu, 1.0, key=k))(keys)
            return jnp.mean((xs - 2.0) ** 2)

        gs = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(
            jax.random.split(KEY, 4000)
        )
        assert jnp.mean(gs) == pytest.approx(-3.0, abs=0.1)

    def test_vmapped_enum_raises(self):
        from genjax_tpu.adev.core import sample_primitive
        from genjax_tpu.adev.primitives import FlipEnum

        fe = FlipEnum()

        @expectation
        def bad(p):
            keys = jax.random.split(jax.random.key(1), 3)
            bs = jax.vmap(
                lambda k: jnp.float32(sample_primitive(fe, p, key=k))
            )(keys)
            return jnp.mean(bs)

        with pytest.raises(NotImplementedError):
            bad.grad_estimate(KEY, (0.4,))


class TestKeyDiscipline:
    def test_consecutive_reparam_draws_are_independent(self):
        """Regression (code-review finding): tail-call draws sharing the
        interpreter key produced identical noise."""

        @expectation
        def loss(mu):
            x = normal_reparam(mu, 1.0)
            y = normal_reparam(0.0, 1.0)
            return x - y

        ests = jax.vmap(lambda k: loss.estimate(k, (1.5,)))(
            jax.random.split(KEY, 2000)
        )
        assert jnp.mean(ests) == pytest.approx(1.5, abs=0.1)
        # var(x - y) = 2: with the bug the estimates were exactly mu (std 0)
        assert jnp.std(ests) == pytest.approx(jnp.sqrt(2.0), abs=0.1)

    def test_branch_and_continuation_draws_independent(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            inner = jax.lax.cond(
                b, lambda: normal_reparam(0.0, 1.0), lambda: normal_reparam(0.0, 1.0)
            )
            after = normal_reparam(0.0, 1.0)
            return inner * after

        # E[inner * after] = 0 only if the draws are independent
        ests = jax.vmap(lambda k: loss.estimate(k, (0.5,)))(
            jax.random.split(KEY, 4000)
        )
        assert jnp.mean(ests) == pytest.approx(0.0, abs=0.06)


class TestPureContinuationSemantics:
    """Regression: the PURE continuation (the alternative-sample branch of
    enumeration/MVD strategies) must see the same program semantics as the
    dual path — AddCost contributions and batched key operands included."""

    def test_add_cost_downstream_of_flip_mvd(self):
        # E[1{b} + c] has d/dp = 1 regardless of the constant cost c;
        # pre-fix the kpure branch dropped c, biasing the estimate to
        # 2c*p - (c - 1) (measured -2.935 at p=0.3, c=10).
        @expectation
        def loss(p):
            b = flip_mvd(p)
            add_cost(10.0)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.3,))[0])(
            jax.random.split(KEY, 2000)
        )
        assert jnp.mean(grads) == pytest.approx(1.0, abs=0.05)

    def test_add_cost_downstream_of_flip_enum(self):
        # enumeration is exact: every key must give d/dp E = 4 - 3 = 1
        # even with a cost term between the flip and the return
        @expectation
        def loss(p):
            b = flip_enum(p)
            add_cost(2.0 * p)
            return jax.lax.cond(b, lambda: 2.0, lambda: 1.0)

        g = loss.grad_estimate(KEY, (0.4,))[0]
        assert float(g) == pytest.approx(1.0 + 2.0, abs=1e-5)

    def test_estimate_with_array_args(self):
        # pre-fix: scalar 0.0 tangents crashed jax.jvp on array leaves
        @expectation
        def loss(ps):
            x = normal_reparam(jnp.sum(ps), 1.0)
            return x * x

        val = loss.estimate(KEY, (jnp.array([0.5, 0.2]),))
        assert jnp.shape(val) == ()
        assert jnp.isfinite(val)

    def test_flip_mvd_upstream_of_vmapped_reparam(self):
        # the kpure branch used to hand a scalar key to the batched
        # primitive's key_dim=0 vmap and crash
        from genjax_tpu.adev.core import sample_primitive
        from genjax_tpu.adev.primitives import NormalREPARAM

        @expectation
        def loss(p, mus):
            b = flip_mvd(p)
            keys = jax.random.split(jax.random.key(7), 4)
            xs = jax.vmap(
                lambda k, m: sample_primitive(NormalREPARAM(), m, 1.0, key=k)
            )(keys, mus)
            return jax.lax.cond(
                b, lambda: jnp.sum(xs), lambda: 0.0
            )

        g = loss.grad_estimate(KEY, (0.5, jnp.zeros(4)))
        assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


def test_baseline_unbiased_with_kpure_strategy():
    """Baseline must shift the PURE continuation too: FlipMVD evaluates
    the alternative branch through kpure, and an unshifted branch leaves
    a -(2p-1)*b bias in the difference estimator (exact derivative of
    E[where(b,3,1)] w.r.t. p is 2)."""
    import jax.numpy as jnp

    from genjax_tpu.adev import expectation
    from genjax_tpu.adev.primitives import baseline, flip_mvd

    based = baseline(flip_mvd)

    @expectation
    def loss(p):
        b = based(5.0, p)
        return jnp.where(b, 3.0, 1.0)

    keys = jax.random.split(jax.random.key(0), 4000)
    grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.3,))[0])(keys)
    assert float(jnp.mean(grads)) == pytest.approx(2.0, abs=0.1)
