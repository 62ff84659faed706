"""The production sampling workflow in one call.

``sample_posterior`` ties the framework together: prior initialization,
step-size + diagonal-mass adaptation, thinned sampling, and split-R̂/ESS
diagnostics — a few compiled programs whose chain axis shards over a
``Mesh``. This narrative runs it on a hierarchical regression and checks
the answers against the model's exact posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference import sample_posterior
from genjax_tpu.models import linear_regression
from genjax_tpu.parallel import make_mesh


def main():
    # Bayesian linear regression with a conjugate (exactly known) posterior
    N, D = 24, 3
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32)
    w_true = np.asarray([1.0, -2.0, 0.5], np.float32)
    y = (X @ w_true + 0.25 * rng.normal(size=N)).astype(np.float32)

    model, exact_posterior = linear_regression(X)
    post_mean, post_cov = exact_posterior(jnp.asarray(y))

    res = sample_posterior(
        jax.random.key(0),
        model,
        g.C["y"].set(jnp.asarray(y)),
        (),
        g.S["w"],
        n_chains=512,
        n_warmup=120,
        n_samples=80,
        algorithm="nuts",
        eps0=0.02,
        max_depth=6,
        mesh=make_mesh(),  # shard the chain axis over every local device
    )

    draws = res["w"][:, -40:]  # (chains, draws, D) post-burn-in
    flat = draws.reshape(-1, D)
    assert jnp.allclose(jnp.mean(flat, axis=0), post_mean, atol=0.05), (
        jnp.mean(flat, axis=0),
        post_mean,
    )
    assert jnp.allclose(
        jnp.std(flat, axis=0), jnp.sqrt(jnp.diag(post_cov)), rtol=0.25
    )
    # convergence diagnostics come with the result
    assert jnp.all(res.rhat_of("w") < 1.15)
    assert jnp.all(res.ess_of("w") > 200.0)
    # adaptation moved the (deliberately tiny) initial step size
    assert float(res.eps) > 0.05
    print(
        f"posterior mean {np.round(np.asarray(jnp.mean(flat, axis=0)), 3)} "
        f"(exact {np.round(np.asarray(post_mean), 3)}), "
        f"eps* {float(res.eps):.3f}, "
        f"min ESS {float(jnp.min(res.ess_of('w'))):.0f}"
    )
    print("sample_posterior cookbook: OK")


if __name__ == "__main__":
    main()
