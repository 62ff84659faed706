"""Amortized variational inference: a flax network as the guide.

The guide's parameters are an arbitrary pytree riding through
``Target.args``, so a neural network slots straight into the ADEV
variational stack — the reparameterized sample differentiates through the
network apply, and one optax loop trains an *amortized* posterior: a
single network that maps any observation to its approximate posterior.

The model is conjugate (mu ~ N(0,1), x ~ N(mu, 0.5)), so the exact
posterior is N(0.8·x, 0.2) — the trained network must recover the linear
map 0.8·x and the constant scale √0.2, including on a held-out x* it
never saw during training.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import optax

import genjax_tpu as g
from genjax_tpu.inference import Target, vi
from genjax_tpu.inference.sp import Marginal


class GuideNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(16)(jnp.atleast_1d(x)))
        out = nn.Dense(2)(h)
        return out[0], jnp.exp(out[1])  # loc, scale


def main():
    net = GuideNet()

    @g.gen
    def model(phi, x_i):  # phi and x_i ride through Target.args for the guide
        mu = g.normal(0.0, 1.0) @ "mu"
        _ = g.normal(mu, 0.5) @ "x"

    @g.gen
    def guide_fn(target):
        phi, x_i = target.args
        loc, scale = net.apply(phi, x_i)
        _ = vi.normal_reparam(loc, scale) @ "mu"

    guide = Marginal(
        guide_fn, g.Pytree.const(g.Selection.all()), g.Pytree.const(None)
    )

    xs_train = jnp.linspace(-2.0, 2.0, 9)
    grad_fns = [
        vi.ELBO(
            guide,
            lambda phi, x_i=x_i: Target(
                model, (phi, x_i), g.C["x"].set(x_i)
            ),
        )
        for x_i in xs_train
    ]

    phi = net.init(jr.PRNGKey(0), jnp.asarray(0.0))
    opt = optax.adam(optax.cosine_decay_schedule(0.03, 1000))
    opt_state = opt.init(phi)

    @jax.jit
    def step(carry, k):
        phi, opt_state = carry
        ks = jr.split(k, 2 * len(grad_fns))
        grads = [
            fn(ks[2 * i + j], (phi,))[0]
            for i, fn in enumerate(grad_fns)
            for j in (0, 1)
        ]
        mean_grad = jax.tree_util.tree_map(
            lambda *gs: sum(gs) / len(gs), *grads
        )
        updates, opt_state = opt.update(mean_grad, opt_state)
        return (optax.apply_updates(phi, updates), opt_state), None

    (phi, _), _ = jax.lax.scan(
        step, (phi, opt_state), jr.split(jr.PRNGKey(1), 1000)
    )

    # Exact posterior: N(0.8 x, 0.2). Check train AND held-out points.
    for x_star in [-1.5, 0.3, 1.7, 0.95]:  # 0.95 never seen in training
        loc, scale = net.apply(phi, jnp.asarray(x_star))
        assert abs(float(loc) - 0.8 * x_star) < 0.08, (x_star, float(loc))
        assert abs(float(scale) - np.sqrt(0.2)) < 0.08, (x_star, float(scale))
    print(
        "amortized guide recovers the exact posterior map: "
        f"loc(0.95) = {float(net.apply(phi, jnp.asarray(0.95))[0]):.3f} "
        f"(exact {0.8 * 0.95:.3f})"
    )


if __name__ == "__main__":
    main()
