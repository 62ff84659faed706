"""State-space model families (BASELINE config: "discrete HMM /
state-space model via SMC/particle filter")."""

from __future__ import annotations

import jax.numpy as jnp

from ..lang.static_lang import gen


def linear_gaussian_ssm(*, trans_scale: float = 1.0, obs_scale: float = 0.5):
    """Latent random walk with Gaussian emissions. Returns
    ``(kernel, exact_log_marginal)`` — the kernel is ``(c, x) -> (c, y)``
    for ``.scan()``/``SSMParticleFilter``; the exact marginal is the Kalman
    filter."""
    from ..dists import normal

    @gen
    def kernel(carry, x):
        z = normal(carry, trans_scale) @ "z"
        y = normal(z, obs_scale) @ "y"
        return (z, y)

    def exact_log_marginal(ys, init_mean: float = 0.0):
        q, r = trans_scale**2, obs_scale**2
        mean, var = init_mean, q
        logZ = 0.0
        for y in ys:
            s = var + r
            logZ += -0.5 * (jnp.log(2 * jnp.pi * s) + (y - mean) ** 2 / s)
            gain = var / s
            mean = mean + gain * (y - mean)
            var = var * (1 - gain) + q
        return logZ

    return kernel, exact_log_marginal


def stochastic_volatility(*, mu: float = -1.0, phi: float = 0.97, sigma: float = 0.15):
    """Canonical SV model: log-volatility AR(1)
    ``h_t ~ N(mu + phi (h_{t-1} - mu), sigma)``; returns
    ``y_t ~ N(0, exp(h_t / 2))``. Kernel form for ``.scan()`` /
    ``SSMParticleFilter``; addresses ``h`` (latent) and ``y``."""
    from ..dists import normal

    @gen
    def kernel(carry, x):
        h = normal(mu + phi * (carry - mu), sigma) @ "h"
        y = normal(0.0, jnp.exp(h / 2.0)) @ "y"
        return (h, y)

    return kernel
