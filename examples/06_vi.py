"""Variational inference with ADEV gradient estimators.

An ELBO-trained reparameterized guide recovers the exact conjugate
posterior (mean AND scale — the entropy term matters; see
genjax_tpu/inference/sp.py).
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu.inference import Target, vi
from genjax_tpu.inference.sp import Marginal


@g.gen
def model(phi):
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


@g.gen
def guide_fn(target):
    phi = target.args[0]
    _ = vi.normal_reparam(phi[0], jax.nn.softplus(phi[1])) @ "mu"


def main():
    key = jax.random.key(1)
    guide = Marginal(guide_fn, g.Pytree.const(g.Selection.all()), g.Pytree.const(None))
    elbo_grad = vi.ELBO(guide, lambda phi: Target(model, (phi,), g.C["y"].set(2.0)))

    # batched gradient estimates, SGD
    step = jax.jit(
        lambda k, phi: jnp.mean(
            jax.vmap(lambda kk: elbo_grad(kk, (phi,))[0])(jax.random.split(k, 32)),
            axis=0,
        )
    )
    phi = jnp.zeros(2)
    for i in range(300):
        key, sub = jax.random.split(key)
        phi = phi - 0.05 * step(sub, phi)

    print(f"guide mean  {phi[0]:.3f}   (exact posterior mean  1.000)")
    print(f"guide scale {jax.nn.softplus(phi[1]):.3f}   (exact posterior scale {1/jnp.sqrt(2):.3f})")

    # a raw ADEV expectation, for comparison with a closed form
    from genjax_tpu.adev import expectation, normal_reparam

    @expectation
    def loss(mu):
        x = normal_reparam(mu, 1.0)
        return (x - 2.0) ** 2

    grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(
        jax.random.split(key, 2000)
    )
    print(f"ADEV dE[(x-2)^2]/dmu at mu=0.5: {jnp.mean(grads):.3f} (exact -3.0)")


if __name__ == "__main__":
    main()
