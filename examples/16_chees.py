"""ChEES-adaptive HMC: let the sampler pick its own trajectory length.

Fixed-L HMC needs a hand-tuned ``(eps, L)``; NUTS discovers trajectory
lengths per chain but pays for the tree bookkeeping and the rejected half
of its last doubling. ChEES (Hoffman & Sountsov 2021) adapts ONE shared
trajectory length from cross-chain statistics — a perfect fit for the
massively parallel column layout, where it measures ~4x the ESS/sec of a
hand-set fixed-L configuration on the flagship model (docs/performance.md).

Three entry points, top-down:

1. ``sample_posterior(algorithm="chees")`` — the one-call driver;
2. ``kernels.column_chees`` — @gen model -> column kernel via the packer;
3. ``kernels.chees_hmc`` — bare ``(D, N) -> (N,)`` log-density.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference import sample_posterior
from genjax_tpu.kernels import chees_hmc, column_chees
from genjax_tpu.models import linear_regression


def main():
    N, D = 24, 3
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32)
    w_true = np.asarray([1.0, -2.0, 0.5], np.float32)
    y = (X @ w_true + 0.25 * rng.normal(size=N)).astype(np.float32)
    model, exact_posterior = linear_regression(X)
    post_mean, post_cov = exact_posterior(jnp.asarray(y))
    obs = g.C["y"].set(jnp.asarray(y))

    # ---- 1. the one-call driver ----
    res = sample_posterior(
        jax.random.key(0), model, obs, (), g.S["w"],
        n_chains=512, n_warmup=300, n_samples=100, algorithm="chees",
        eps0=0.05,
    )
    draws = res["w"][:, 30:]  # (chains, samples, D)
    emp_mean = jnp.mean(draws.reshape(-1, D), axis=0)
    assert jnp.allclose(emp_mean, post_mean, atol=0.02), emp_mean
    emp_cov = jnp.cov(draws.reshape(-1, D).T)
    assert jnp.allclose(emp_cov, post_cov, atol=5e-3)
    assert float(jnp.max(res.rhat_of("w"))) < 1.1
    print("driver: mean", np.round(np.asarray(emp_mean), 3),
          "exact", np.round(np.asarray(post_mean), 3))
    print("adapted eps:", float(res.eps),
          "divergences:", float(res.divergence_rate))

    # ---- 2. the model-level column kernel ----
    q, info, packer = column_chees(
        model, obs, (), ["w"], n_chains=512, n_warmup=300, n_steps=100,
        eps=0.05,
    )
    w_draws = q[: packer.dim, :]  # (D, chains) final positions
    assert jnp.allclose(jnp.mean(w_draws, axis=1), post_mean, atol=0.03)
    print("column_chees: trajectory length",
          round(float(info.trajectory_length), 3),
          "mean leapfrogs/sweep", round(float(info.mean_leapfrogs), 1))

    # ---- 3. the bare kernel on a custom log-density ----
    scales = np.asarray([1.0, 5.0], np.float32)

    def ld(qcols):  # (2, N) -> (N,)
        return -0.5 * jnp.sum((qcols / scales[:, None]) ** 2, axis=0)

    q0 = 0.1 * jax.random.normal(jax.random.key(1), (2, 1024))
    qf, info = chees_hmc(ld, q0, 7, n_warmup=300, n_steps=150, eps0=0.05)
    assert np.allclose(np.std(np.asarray(qf), axis=1), scales, rtol=0.12)
    print("bare kernel: recovered scales",
          np.round(np.std(np.asarray(qf), axis=1), 2), "accept",
          round(float(info.accept_rate), 2))


if __name__ == "__main__":
    main()
