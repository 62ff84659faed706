"""Gaussian-process regression (exact conjugate answers throughout).

No reference counterpart (the reference ships no model zoo —
`/root/reference/docs/cookbook/` notebooks only; SURVEY.md §1). A GP is the canonical MXU workload in a PPL: the
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


def _as_points(x):
    """Normalize inputs to (N, D): a 1-D array is N scalar points, not one
    N-dimensional point (the `atleast_2d` reading — which would silently
    build a 1-observation model — is never what a user means here)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim <= 1:
        return x.reshape(-1, 1)
    return x


def sq_exp_kernel(x1, x2, amplitude, lengthscale):
    """Squared-exponential Gram matrix between row-sets ``x1 (N, D)`` and
    ``x2 (M, D)`` (1-D inputs are treated as N scalar points) — one matmul
    for the cross terms (MXU) plus rank-1 corrections."""
    x1 = _as_points(x1)
    x2 = _as_points(x2)
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

    X = _as_points(X)
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
    """Exact log marginal likelihood log N(y | 0, K + σ²I): ONE Cholesky
    factorization, reused for both the quadratic form and the
    log-determinant."""
    from jax.scipy.linalg import cho_solve

    X = _as_points(X)
    y = jnp.asarray(y, jnp.float32)
    n = X.shape[0]
    cov = sq_exp_kernel(X, X, amplitude, lengthscale) + (
        noise**2 + jitter
    ) * jnp.eye(n)
    chol = jnp.linalg.cholesky(cov)
    alpha = cho_solve((chol, True), y)
    return (
        -0.5 * y @ alpha
        - jnp.sum(jnp.log(jnp.diag(chol)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


def gp_posterior(
    X, y, X_test, amplitude, lengthscale, noise, *, jitter: float = 1e-5
):
    """Closed-form GP predictive at ``X_test``: returns ``(mean, cov)`` of
    the noise-free function values f* | y. K is factorized ONCE and the
    factor reused for both solves."""
    from jax.scipy.linalg import cho_solve

    X = _as_points(X)
    X_test = _as_points(X_test)
    y = jnp.asarray(y, jnp.float32)
    n = X.shape[0]
    K = sq_exp_kernel(X, X, amplitude, lengthscale) + (
        noise**2 + jitter
    ) * jnp.eye(n)
    Ks = sq_exp_kernel(X_test, X, amplitude, lengthscale)
    Kss = sq_exp_kernel(X_test, X_test, amplitude, lengthscale)
    chol = jnp.linalg.cholesky(K)
    mean = Ks @ cho_solve((chol, True), y)
    cov = Kss - Ks @ cho_solve((chol, True), Ks.T)
    return mean, cov
