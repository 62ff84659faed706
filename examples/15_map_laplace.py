"""Point estimation and Gaussian approximation: fit_map + Laplace.

The third leg of the inference triangle (sampling ✓, variational ✓):
gradient-based MAP over any selected continuous choices, and the Laplace
approximation built on it — exact on Gaussian posteriors, where this
narrative checks mean, covariance, AND the evidence against closed forms.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference import fit_map, laplace_approximation
from genjax_tpu.models import linear_regression


def main():
    N, D = 24, 3
    rng = np.random.default_rng(3)
    X = rng.normal(size=(N, D)).astype(np.float32)
    w_true = np.asarray([1.5, -0.5, 2.0], np.float32)
    y = (X @ w_true + 0.25 * rng.normal(size=N)).astype(np.float32)

    model, exact_posterior = linear_regression(X)
    post_mean, post_cov = exact_posterior(jnp.asarray(y))
    obs = g.C["y"].set(jnp.asarray(y))

    # --- MAP: batched-restart Adam in one compiled program --------------
    res = fit_map(
        jax.random.key(0), model, obs, (), g.S["w"],
        n_steps=400, learning_rate=0.05,
    )
    assert jnp.allclose(res["w"], post_mean, atol=0.01)  # mode == mean here

    # --- Laplace: curvature at the mode ---------------------------------
    lap = laplace_approximation(
        jax.random.key(1), model, obs, (), g.S["w"],
        n_steps=400, learning_rate=0.05,
    )
    assert jnp.allclose(lap.mean, post_mean, atol=0.01)
    assert jnp.allclose(lap.cov, post_cov, atol=1e-3)

    # the Laplace evidence matches the exact marginal likelihood
    S = 0.25**2 * jnp.eye(N) + X @ X.T
    _sign, logdet = jnp.linalg.slogdet(2 * jnp.pi * S)
    exact_lml = -0.5 * (
        logdet + jnp.asarray(y) @ jnp.linalg.solve(S, jnp.asarray(y))
    )
    assert jnp.allclose(lap.log_marginal, exact_lml, atol=0.01)

    print(
        f"MAP w = {np.round(np.asarray(res['w']), 3)} "
        f"(exact mode {np.round(np.asarray(post_mean), 3)}); "
        f"Laplace logZ {float(lap.log_marginal):.3f} "
        f"(exact {float(exact_lml):.3f})"
    )
    print("MAP/Laplace cookbook: OK")


if __name__ == "__main__":
    main()
