"""MCMC: regenerate-MH, custom-proposal rejuvenation, and HMC at scale.

Shows the chain drivers (`run_chain`, `run_chains`) the reference leaves to
hand-rolled loops, plus dual-averaging step-size adaptation.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu.parallel import make_mesh, run_chains_sharded, warmup_adapt_step_size


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


def main():
    key = jax.random.key(0)
    obs = g.C["y"].set(2.0)
    # exact posterior: mu | y=2 ~ N(1, 1/sqrt(2))

    def make_trace(k):
        tr, _ = model.generate(k, obs, ())
        return tr

    # --- one chain, regenerate-MH ---
    tr = make_trace(key)
    res = g.run_chain(key, tr, g.S["mu"], 2000, record=lambda t: t.get_choices()["mu"])
    print(f"MH: mean {jnp.mean(res.history[200:]):.3f} (exact 1.0), "
          f"accept {res.accept_rate:.2f}")

    # --- custom random-walk proposal via Rejuvenate ---
    @g.gen
    def rw(chm):
        old = chm["mu"]
        old = old.unmask() if isinstance(old, g.Mask) else old
        _ = g.normal(old, 0.5) @ "mu"

    req = g.Rejuvenate(rw, lambda chm: (chm,))
    res = g.run_chain(key, tr, req, 2000, record=lambda t: t.get_choices()["mu"])
    print(f"RW-MH: mean {jnp.mean(res.history[200:]):.3f}, accept {res.accept_rate:.2f}")

    # --- adapted HMC over a sharded batch of chains ---
    traces = jax.vmap(make_trace)(jax.random.split(key, 512))
    traces, eps = warmup_adapt_step_size(
        key, traces, lambda e: g.HMC(g.S["mu"], e, L=5), n_warmup=100, eps0=1.0
    )
    print(f"adapted step size: {eps:.3f}")

    mesh = make_mesh()
    out = run_chains_sharded(
        key, make_trace, g.HMC(g.S["mu"], eps, L=5),
        n_steps=100, n_chains=2048, mesh=mesh,
        record=lambda t: t.get_choices()["mu"],
    )
    finals = out.history[:, -1]
    print(f"HMC x2048 chains: mean {jnp.mean(finals):.3f} (exact 1.0), "
          f"std {jnp.std(finals):.3f} (exact {1/jnp.sqrt(2):.3f})")

    # --- the batched trace drivers (round 5): the GFI throughput path.
    # Same Markov chain as iterating mh(HMC(...)), but the whole sweep
    # runs as one column scan with bulk draws and ONE trace write-back —
    # measured within 3.4% of the hand-packed column kernel at 64k
    # chains (ARCHITECTURE §GFI-abstraction tax). ---
    traces = jax.vmap(make_trace)(jax.random.split(jax.random.key(7), 2048))
    traces, acc = g.run_chains_hmc(
        jax.random.key(8), traces, g.S["mu"], eps=float(eps), L=5,
        n_steps=200,
    )
    mus = traces.get_choices()["mu"]
    print(f"run_chains_hmc x2048: mean {jnp.mean(mus):.3f} (exact 1.0), "
          f"accept {acc:.2f}")
    traces, acc, leaps = g.run_chains_nuts(
        jax.random.key(9), traces, g.S["mu"], eps=0.5, n_steps=100,
    )
    mus = traces.get_choices()["mu"]
    print(f"run_chains_nuts x2048: mean {jnp.mean(mus):.3f}, "
          f"~{leaps:.1f} leapfrogs/transition")

    # --- NUTS on the fused column layout (the production fast path) ---
    from genjax_tpu.kernels import column_nuts

    q, acc, leaps, packer = column_nuts(
        model, obs, (), ["mu"],
        n_chains=1024, n_steps=60, eps=0.3, max_depth=6,
    )
    print(f"column NUTS: mean {jnp.mean(q[0]):.3f}, std {jnp.std(q[0]):.3f}, "
          f"accept {acc:.2f}, ~{leaps:.0f} leapfrogs/transition")


if __name__ == "__main__":
    main()
