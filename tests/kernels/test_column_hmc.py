"""Fused column-layout HMC: correctness on CPU.

Both backends run in CI: ``backend="xla"`` is the plain-JAX twin, and
``backend="pallas", interpret=True`` executes the actual Mosaic kernel body
(``kernels/hmc.py:_hmc_kernel`` — VMEM layout, fori_loop sweep, mass-matrix
kinetic energy) under the Pallas interpreter, with the hardware PRNG
swapped for the counter-based software PRNG (VERDICT round-1 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.kernels import ColumnPacker, column_hmc, column_logdensity, pallas_hmc

KEY = jax.random.key(0)


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


class TestColumnHMC:
    def test_posterior_recovery(self):
        obs = g.C["y"].set(2.0)
        q, acc, packer = column_hmc(
            conjugate, obs, (), ["mu"],
            n_chains=2048, n_steps=300, eps=0.5, L=5, backend="xla",
        )
        mus = q[0, :]
        assert float(acc) > 0.6
        assert jnp.mean(mus) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(mus) == pytest.approx(1.0 / np.sqrt(2.0), abs=0.1)

    def test_vector_address_packing(self):
        D = 3
        X = np.eye(3, dtype=np.float32)

        @g.gen
        def vec_model():
            w = g.mv_normal_diag(jnp.zeros(D), jnp.ones(D)) @ "w"
            _ = g.mv_normal_diag(X @ w, 0.5 * jnp.ones(D)) @ "y"

        y = np.asarray([1.0, -1.0, 0.5], np.float32)
        obs = g.C["y"].set(jnp.asarray(y))
        q, acc, packer = column_hmc(
            vec_model, obs, (), ["w"],
            n_chains=1024, n_steps=300, eps=0.3, L=5, backend="xla",
        )
        # posterior per-dim precision 1 + 1/0.25 = 5; mean = 4*y_i/5
        post_mean = (y / 0.25) / 5.0
        w_means = jnp.mean(q[:3, :], axis=1)
        assert jnp.allclose(w_means, post_mean, atol=0.1)
        assert float(acc) > 0.5

    def test_packer_roundtrip(self):
        obs = g.C["y"].set(2.0)
        packer = ColumnPacker(conjugate, obs, (), ["mu"])
        tr = conjugate.simulate(KEY, ())
        qv = packer.pack(tr.get_choices())
        assert qv.shape == (8,)  # padded to sublane tile
        chm = packer.unpack(qv)
        assert chm["mu"] == pytest.approx(float(tr.get_choices()["mu"]))

    def test_logdensity_matches_assess(self):
        obs = g.C["y"].set(2.0)
        packer = ColumnPacker(conjugate, obs, (), ["mu"])
        ld = column_logdensity(conjugate, obs, (), packer)
        q = jnp.zeros((8, 4)).at[0, :].set(jnp.array([0.0, 0.5, 1.0, -1.0]))
        scores = ld(q)
        for i, mu in enumerate([0.0, 0.5, 1.0, -1.0]):
            expected, _ = conjugate.assess(g.C.d({"mu": mu, "y": 2.0}), ())
            assert scores[i] == pytest.approx(float(expected), rel=1e-5)


class TestPallasKernelBody:
    """Drives ``_hmc_kernel`` itself (interpret mode) — not the XLA twin."""

    def test_kernel_posterior_recovery(self):
        def ld(q):
            return -0.5 * jnp.sum(q * q, axis=0)

        q0 = jnp.full((8, 256), 3.0, jnp.float32)
        q, acc = pallas_hmc(
            ld, q0, 7, n_steps=200, eps=0.5, L=5,
            block_n=128, interpret=True, backend="pallas",
        )
        assert 0.3 < float(acc) <= 1.0
        assert jnp.mean(q) == pytest.approx(0.0, abs=0.1)
        assert jnp.std(q) == pytest.approx(1.0, abs=0.1)

    def test_kernel_grid_blocks_get_distinct_streams(self):
        def ld(q):
            return -0.5 * jnp.sum(q * q, axis=0)

        q0 = jnp.zeros((8, 256), jnp.float32)
        q, _ = pallas_hmc(
            ld, q0, 3, n_steps=20, eps=0.5, L=3,
            block_n=128, interpret=True, backend="pallas",
        )
        # the two grid blocks started identically: distinct per-block PRNG
        # streams must decorrelate them
        assert not jnp.allclose(q[:, :128], q[:, 128:])

    def test_kernel_inv_mass(self):
        var = jnp.array([4.0, 0.25] * 4)

        def ld(q):
            return -0.5 * jnp.sum(q * q / var[:, None], axis=0)

        q0 = jnp.zeros((8, 256), jnp.float32)
        q, acc = pallas_hmc(
            ld, q0, 11, n_steps=300, eps=0.6, L=6,
            block_n=128, interpret=True, backend="pallas", inv_mass=var,
        )
        assert 0.3 < float(acc) <= 1.0
        assert jnp.allclose(
            jnp.std(q, axis=1), jnp.sqrt(var), rtol=0.15
        )

    def test_kernel_const_hoisting(self):
        # log-density closing over numpy constants: the const-hoisting
        # jaxpr replay must ship them into the kernel
        X = np.asarray([[1.0, 0.5], [0.0, 1.0]], np.float32)
        y = np.asarray([1.0, -1.0], np.float32)

        def ld(q):
            resid = X @ q[:2, :] - y[:, None]
            return -0.5 * jnp.sum(resid * resid, axis=0) - 0.5 * jnp.sum(
                q * q, axis=0
            )

        q0 = jnp.zeros((8, 128), jnp.float32)
        q_pl, acc_pl = pallas_hmc(
            ld, q0, 5, n_steps=150, eps=0.3, L=5,
            block_n=128, interpret=True, backend="pallas",
        )
        q_xla, _ = pallas_hmc(
            ld, q0, 5, n_steps=150, eps=0.3, L=5, backend="xla",
        )
        # same posterior from both backends (different PRNG streams)
        assert jnp.allclose(
            jnp.mean(q_pl[:2], axis=1), jnp.mean(q_xla[:2], axis=1), atol=0.15
        )
        assert 0.3 < float(acc_pl) <= 1.0

    def test_column_hmc_pallas_backend_with_warmup(self):
        # ADVICE round-1 item 4: warmup=True + backend="pallas" used to be
        # mutually exclusive (kernel rejected inv_mass); now supported
        obs = g.C["y"].set(2.0)
        q, acc, packer = column_hmc(
            conjugate, obs, (), ["mu"],
            n_chains=1024, n_steps=150, eps=0.05, L=5,
            backend="pallas", interpret=True, block_n=256, warmup=True,
        )
        mus = q[0, :]
        assert float(acc) > 0.6
        assert jnp.mean(mus) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(mus) == pytest.approx(1.0 / np.sqrt(2.0), abs=0.1)


class TestMassAdaptation:
    def test_warmup_recovers_scales_and_speeds_nuts(self):
        from genjax_tpu.kernels.hmc import warmup_column
        from genjax_tpu.kernels.nuts import nuts_sweep_cols

        scales = jnp.array([0.05, 0.2, 1.0, 3.0, 5.0])

        def ld(q):
            return jnp.sum(-0.5 * (q / scales[:, None]) ** 2, axis=0)

        q0 = jnp.zeros((5, 1024))
        q, eps, inv_mass = warmup_column(
            ld, q0, 7, n_phases=6, steps_per_phase=25, eps0=0.05, L=10
        )
        # inv_mass approximates the posterior variances
        assert jnp.allclose(
            inv_mass / scales**2, 1.0, rtol=0.5
        ), inv_mass
        # adapted HMC recovers every scale
        q_ad, acc = pallas_hmc(
            ld, q, 2, n_steps=150, eps=eps, L=10, backend="xla",
            inv_mass=inv_mass,
        )
        assert float(acc) > 0.8
        assert jnp.allclose(jnp.std(q_ad, axis=1), scales, rtol=0.15)
        # adapted NUTS needs far fewer leapfrogs than unit-mass NUTS
        _, _, leaps_ad = nuts_sweep_cols(
            ld, q, 3, n_steps=20, eps=eps, max_depth=8, inv_mass=inv_mass
        )
        _, _, leaps_unit = nuts_sweep_cols(
            ld, q, 3, n_steps=20, eps=0.05, max_depth=8
        )
        assert float(leaps_ad) < 0.3 * float(leaps_unit)

    def test_column_hmc_warmup_flag(self):
        obs = g.C["y"].set(2.0)
        q, acc, packer = column_hmc(
            conjugate, obs, (), ["mu"],
            n_chains=1024, n_steps=150, eps=0.05, L=5,
            backend="xla", warmup=True,
        )
        mus = q[0, :]
        assert float(acc) > 0.6
        assert jnp.mean(mus) == pytest.approx(1.0, abs=0.1)
        assert jnp.std(mus) == pytest.approx(1.0 / np.sqrt(2.0), abs=0.1)


class TestEntryContracts:
    def test_none_constraint_is_unconstrained_prior(self):
        # None advertises pure-prior sweeps; must not crash in generate.
        # All addresses must be packed (assess needs a full assignment).
        q, acc, packer = column_hmc(
            conjugate, None, (), ["mu", "y"],
            n_chains=256, n_steps=100, eps=0.5, L=5, backend="xla",
        )
        mus = q[0, :]
        assert float(acc) > 0.5
        # unconstrained target = the prior N(0, 1)
        assert abs(float(jnp.mean(mus))) < 0.15
        assert float(jnp.std(mus)) == pytest.approx(1.0, abs=0.12)


class TestBackendSelection:
    """Data-driven "xla" vs "pallas" routing (kernels/hmc.py
    select_hmc_backend): stage the column log-density once, inspect its
    jaxpr for MXU ops (VERDICT r2 item 4's auto-selection)."""

    def test_mxu_detector_elementwise_vs_matmul(self):
        from genjax_tpu.kernels.hmc import _jaxpr_has_mxu_ops

        spec = jax.ShapeDtypeStruct((4, 8), jnp.float32)

        elem = jax.make_jaxpr(lambda q: -0.5 * jnp.sum(q * q, axis=0))(spec)
        assert not _jaxpr_has_mxu_ops(elem.jaxpr)

        W = np.eye(4, dtype=np.float32)
        mm = jax.make_jaxpr(
            lambda q: -0.5 * jnp.sum((W @ q) * q, axis=0)
        )(spec)
        assert _jaxpr_has_mxu_ops(mm.jaxpr)

    def test_mxu_detector_recurses_into_scan(self):
        from genjax_tpu.kernels.hmc import _jaxpr_has_mxu_ops

        W = np.eye(4, dtype=np.float32)

        def scanned(q):
            def body(c, _):
                return c + W @ q, None

            c, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=2)
            return jnp.sum(c, axis=0)

        closed = jax.make_jaxpr(scanned)(
            jax.ShapeDtypeStruct((4, 8), jnp.float32)
        )
        assert _jaxpr_has_mxu_ops(closed.jaxpr)

    def test_select_backend_is_xla_off_tpu(self):
        from genjax_tpu.kernels.hmc import select_hmc_backend

        # CPU/interpret environments always take the XLA twin, even for
        # purely elementwise bodies (the pallas win is a TPU measurement)
        assert (
            select_hmc_backend(
                lambda q: -0.5 * jnp.sum(q * q, axis=0), 4, 8
            )
            == "xla"
        )

    def test_auto_backend_end_to_end(self):
        """column_hmc's default backend="auto" must run (routing to the
        XLA twin here) and recover the conjugate posterior."""
        obs = g.C["y"].set(2.0)
        q, acc, _packer = column_hmc(
            conjugate, obs, (), ["mu"],
            n_chains=1024, n_steps=200, eps=0.5, L=5,
        )
        assert float(acc) > 0.6
        assert jnp.mean(q[0, :]) == pytest.approx(1.0, abs=0.15)

    def test_whitelist_rejects_non_elementwise_bodies(self):
        """Auto-routing is a whitelist: bodies with gathers/sorts/cumsum
        (lowerable by XLA, not guaranteed by the Mosaic kernel) must not
        classify as pallas-safe even without MXU ops."""
        from genjax_tpu.kernels.hmc import _jaxpr_prims, _PALLAS_SAFE_PRIMS

        spec = jax.ShapeDtypeStruct((4, 8), jnp.float32)

        elem = jax.make_jaxpr(
            lambda q: -0.5 * jnp.sum(q * q, axis=0) + jnp.tanh(q[0])
        )(spec)
        assert set(_jaxpr_prims(elem.jaxpr)) <= _PALLAS_SAFE_PRIMS

        idx = np.zeros(4, np.int32)
        gathered = jax.make_jaxpr(
            lambda q: -0.5 * jnp.sum(q[idx] * q, axis=0)
        )(spec)
        assert not set(_jaxpr_prims(gathered.jaxpr)) <= _PALLAS_SAFE_PRIMS

        sorted_ = jax.make_jaxpr(
            lambda q: jnp.sum(jnp.sort(q, axis=0), axis=0)
        )(spec)
        assert not set(_jaxpr_prims(sorted_.jaxpr)) <= _PALLAS_SAFE_PRIMS

    def test_auto_block_floor_raises_on_pathological_chain_count(self):
        """The block auto-pick walks divisors only down to a sane lane
        tile; a chain count with no divisor in [128, 2048] must fail
        loudly, not silently run 2-lane blocks."""
        from genjax_tpu.kernels import pallas_hmc

        q0 = np.zeros((4, 2 * 2053), np.float32)  # no divisor in range
        with pytest.raises(ValueError, match="no divisor"):
            pallas_hmc(
                lambda q: -0.5 * jnp.sum(q * q, axis=0),
                q0, 0, n_steps=1, eps=0.1, L=1, backend="pallas",
                interpret=True,
            )
