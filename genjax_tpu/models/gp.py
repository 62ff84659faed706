"""Gaussian-process regression (exact conjugate answers throughout).

No reference counterpart in the model zoo sense (the reference ships no
models — SURVEY.md §1). A GP is the canonical MXU workload in a PPL: the
kernel Gram matrix, its Cholesky factor, and the triangular solves are all
dense (N, N) linear algebra that XLA tiles straight onto the systolic
array, and vmapping chains over hyperparameter candidates batches them.

Two entry points:

- :func:`gp_regression` — a ``@gen`` model with log-amplitude /
  log-lengthscale / log-noise latents whose likelihood is the EXACT GP
  marginal (latent function values integrated out analytically via
  ``mv_normal``), so MCMC over the hyperparameters targets the true
  hyperparameter posterior with no latent-space mixing cost.
- :func:`gp_posterior` — the closed-form predictive ``(mean, cov)`` at test
  points given hyperparameters, for validating inference end-to-end.

Kernel: squared exponential ``k(x, x') = amp² · exp(−‖x−x'‖²/(2ℓ²))``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lang.static_lang import gen


def sq_exp_kernel(x1, x2, amplitude, lengthscale):
    """Squared-exponential Gram matrix between row-sets ``x1 (N, D)`` and
    ``x2 (M, D)`` — one matmul for the cross terms (MXU) plus rank-1
    corrections."""
    x1 = jnp.atleast_2d(jnp.asarray(x1, jnp.float32))
    x2 = jnp.atleast_2d(jnp.asarray(x2, jnp.float32))
    sq1 = jnp.sum(x1**2, axis=1)[:, None]
    sq2 = jnp.sum(x2**2, axis=1)[None, :]
    d2 = sq1 + sq2 - 2.0 * (x1 @ x2.T)
    return amplitude**2 * jnp.exp(-0.5 * jnp.maximum(d2, 0.0) / lengthscale**2)


def gp_regression(X, *, jitter: float = 1e-5):
    """``log_amp, log_ls, log_noise ~ N(0, 1)``; ``y ~ N(0, K + σ²I)`` with
    the function values marginalized exactly. Addresses: ``"log_amp"``,
    ``"log_ls"``, ``"log_noise"``, ``"y"``.

    Returns the ``@gen`` model; pair with :func:`gp_posterior` /
    :func:`gp_log_marginal` for exact checks.
    """
    from ..dists import mv_normal, normal

    X = jnp.atleast_2d(jnp.asarray(X, jnp.float32))
    n = X.shape[0]

    @gen
    def model():
        log_amp = normal(0.0, 1.0) @ "log_amp"
        log_ls = normal(0.0, 1.0) @ "log_ls"
        log_noise = normal(0.0, 1.0) @ "log_noise"
        K = sq_exp_kernel(X, X, jnp.exp(log_amp), jnp.exp(log_ls))
        cov = K + (jnp.exp(2.0 * log_noise) + jitter) * jnp.eye(n)
        y = mv_normal(jnp.zeros(n), cov) @ "y"
        return y

    return model


def gp_log_marginal(X, y, amplitude, lengthscale, noise, *, jitter=1e-5):
    """Exact log marginal likelihood log N(y | 0, K + σ²I) via Cholesky."""
    X = jnp.atleast_2d(jnp.asarray(X, jnp.float32))
    y = jnp.asarray(y, jnp.float32)
    n = X.shape[0]
    cov = sq_exp_kernel(X, X, amplitude, lengthscale) + (
        noise**2 + jitter
    ) * jnp.eye(n)
    chol = jnp.linalg.cholesky(cov)
    alpha = jnp.linalg.solve(cov, y)
    return (
        -0.5 * y @ alpha
        - jnp.sum(jnp.log(jnp.diag(chol)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


def gp_posterior(
    X, y, X_test, amplitude, lengthscale, noise, *, jitter: float = 1e-5
):
    """Closed-form GP predictive at ``X_test``: returns ``(mean, cov)`` of
    the noise-free function values f* | y."""
    X = jnp.atleast_2d(jnp.asarray(X, jnp.float32))
    X_test = jnp.atleast_2d(jnp.asarray(X_test, jnp.float32))
    y = jnp.asarray(y, jnp.float32)
    n = X.shape[0]
    K = sq_exp_kernel(X, X, amplitude, lengthscale) + (
        noise**2 + jitter
    ) * jnp.eye(n)
    Ks = sq_exp_kernel(X_test, X, amplitude, lengthscale)
    Kss = sq_exp_kernel(X_test, X_test, amplitude, lengthscale)
    alpha = jnp.linalg.solve(K, y)
    mean = Ks @ alpha
    cov = Kss - Ks @ jnp.linalg.solve(K, Ks.T)
    return mean, cov
