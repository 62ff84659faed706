"""The experimental VMEM-resident NUTS kernel (interpret mode): exact
moments on Gaussian targets and AGREEMENT with the XLA NUTS
implementation — the strongest cross-validation of both (independent
implementations of the same sampler must match in accept statistics,
tree sizes, and posterior moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genjax_tpu.kernels.nuts import nuts_sweep_cols
from genjax_tpu.kernels.nuts_pallas import pallas_nuts


def test_std_normal_moments():
    d, n = 8, 256

    def ld(q):
        return -0.5 * jnp.sum(q * q, axis=0)

    q0 = np.random.default_rng(0).normal(size=(d, n)).astype(np.float32)
    q, acc, leaps = pallas_nuts(
        ld, jnp.asarray(q0), 3, n_steps=60, eps=0.4, max_depth=6,
        interpret=True, block_n=256,
    )
    q = np.asarray(q)
    assert 0.6 < float(acc) <= 1.0
    assert float(leaps) >= 1.0
    assert abs(q.mean()) < 0.08
    assert abs(q.var() - 1.0) < 0.12


def test_agrees_with_xla_twin_anisotropic():
    """Same eps/depth on an anisotropic Gaussian: the two independent
    implementations must produce matching accept statistics, mean
    leapfrog counts (tree sizes), and per-dimension marginals."""
    d, n = 8, 512
    rng = np.random.default_rng(1)
    scales = np.geomspace(0.3, 3.0, d).astype(np.float32)

    def ld(q):
        return -0.5 * jnp.sum(
            (q / jnp.asarray(scales)[:, None]) ** 2, axis=0
        )

    q0 = (rng.normal(size=(d, n)) * scales[:, None]).astype(np.float32)
    qa, acca, leapsa = pallas_nuts(
        ld, jnp.asarray(q0), 3, n_steps=50, eps=0.25, max_depth=7,
        interpret=True, block_n=512,
    )
    qb, accb, leapsb = nuts_sweep_cols(
        ld, jnp.asarray(q0), 3, n_steps=50, eps=0.25, max_depth=7,
        rng_impl="threefry2x32",
    )
    assert abs(float(acca) - float(accb)) < 0.05
    # tree sizes: same adaptation-free dynamics -> same mean leapfrogs
    assert abs(float(leapsa) - float(leapsb)) / float(leapsb) < 0.15
    sd_a = np.std(np.asarray(qa), axis=1) / scales
    sd_b = np.std(np.asarray(qb), axis=1) / scales
    np.testing.assert_allclose(sd_a, np.ones(d), rtol=0.15)
    np.testing.assert_allclose(sd_b, np.ones(d), rtol=0.15)


def test_inv_mass_path():
    d, n = 8, 256
    var = np.geomspace(0.25, 4.0, d).astype(np.float32)

    def ld(q):
        return -0.5 * jnp.sum(q * q / jnp.asarray(var)[:, None], axis=0)

    q0 = np.random.default_rng(2).normal(size=(d, n)).astype(np.float32)
    q, acc, leaps = pallas_nuts(
        ld, jnp.asarray(q0), 5, n_steps=50, eps=0.6, max_depth=6,
        inv_mass=jnp.asarray(var), interpret=True, block_n=256,
    )
    q = np.asarray(q)
    assert 0.6 < float(acc) <= 1.0
    # with a matched metric the per-dim variances recover var
    np.testing.assert_allclose(q.var(axis=1), var, rtol=0.25)
