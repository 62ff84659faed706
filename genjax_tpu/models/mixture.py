"""Mixture-model families (BASELINE configs: "ADEV-based VI on mixture
models", "Dirichlet-process mixture")."""

from __future__ import annotations

import jax.numpy as jnp

from ..lang.static_lang import gen


def gaussian_mixture_model(k: int, *, obs_scale: float = 0.5, mean_scale: float = 3.0):
    """Finite GMM over scalar data: ``logits`` latent, per-cluster means,
    vmapped observations. Addresses: ``logits``, ``means``,
    ``("obs", i, "z")``, ``("obs", i, "x")``.

    Returns ``model(data)``."""
    from ..dists import categorical, mv_normal_diag

    @gen
    def model(data):
        logits = mv_normal_diag(jnp.zeros(k), jnp.ones(k)) @ "logits"
        means = mv_normal_diag(jnp.zeros(k), mean_scale * jnp.ones(k)) @ "means"

        @gen
        def obs_point(i, logits, means):
            from ..dists import normal

            z = categorical(logits) @ "z"
            x = normal(means[z], obs_scale) @ "x"
            return x

        _ = obs_point.vmap(in_axes=(0, None, None))(
            jnp.arange(data.shape[0]), logits, means
        ) @ "obs"
        return means

    return model


def dp_mixture_model(
    k_trunc: int,
    *,
    alpha: float = 2.0,
    obs_scale: float = 0.5,
    mean_scale: float = 3.0,
):
    """Truncated stick-breaking Dirichlet-process mixture. Addresses:
    ``beta_i`` (sticks), ``means``, ``("obs", i, "z"/"x")``.

    Returns ``model(data)``."""
    from ..dists import beta as beta_dist
    from ..dists import categorical, mv_normal_diag, normal

    @gen
    def model(data):
        sticks = []
        rest = 1.0
        for i in range(k_trunc - 1):
            b = beta_dist(1.0, alpha) @ f"beta_{i}"
            sticks.append(rest * b)
            rest = rest * (1.0 - b)
        weights = jnp.stack([*sticks, rest])
        means = mv_normal_diag(jnp.zeros(k_trunc), mean_scale * jnp.ones(k_trunc)) @ "means"

        @gen
        def obs_point(i, weights, means):
            z = categorical(jnp.log(weights + 1e-37)) @ "z"
            x = normal(means[z], obs_scale) @ "x"
            return x

        _ = obs_point.vmap(in_axes=(0, None, None))(
            jnp.arange(data.shape[0]), weights, means
        ) @ "obs"
        return weights

    return model
