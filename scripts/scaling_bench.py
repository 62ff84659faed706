"""Scaling-efficiency harness: sharded SMC and HMC throughput at 1..N
shards (BASELINE.json north star: >=90% linear scaling 1 host -> 4 hosts).

On real multi-chip hardware run as-is; without it, run on a simulated CPU
mesh to validate the *program structure* (collective placement, shard
layouts):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    SCALING_CPU=1 python scripts/scaling_bench.py

Note: CPU-mesh timings measure emulation, not ICI — the efficiency numbers
only become meaningful on real chips; the harness records them either way.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SCALING_CPU"):
    # the axon sitecustomize force-sets JAX_PLATFORMS; override via config
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


# Short timing windows on a shared microVM host are dominated by
# scheduling noise (3x swings observed run-to-run). Methodology: per
# (mode, shard-count), time TRIALS windows of `reps` dispatches each and
# keep the FASTEST window — the least-interference estimate of the
# program's actual rate.
TRIALS = int(os.environ.get("SCALING_TRIALS", 3))


def _best_rate(run, sync_out, work_per_rep, reps):
    _ = sync_out(run(0))  # compile + warm
    best = float("inf")
    for t in range(TRIALS):
        t0 = time.perf_counter()
        out = None
        for i in range(1, reps + 1):
            out = run(1 + t * reps + i)
        _ = sync_out(out)
        best = min(best, time.perf_counter() - t0)
    return work_per_rep * reps / best


def bench_pf(n_shards: int, n_particles: int, T: int) -> float:
    import genjax_tpu as g
    from genjax_tpu.parallel import SSMParticleFilter, make_mesh

    @g.gen
    def kernel(c, x):
        z = g.normal(c, 1.0) @ "z"
        y = g.normal(z, 0.5) @ "y"
        return (z, y)

    mesh = make_mesh(n_shards)
    ys = jnp.zeros(T)
    obs = g.C[:, "y"].set(ys)
    pf = SSMParticleFilter(kernel, n_particles=n_particles)

    run = lambda s: pf.run_sharded(jr.key(s), 0.0, jnp.zeros(T), obs, mesh)
    return _best_rate(
        run, lambda o: sync(o.log_weights), n_particles * T, reps=10
    )


def bench_chains(n_shards: int, n_chains: int, n_steps: int) -> float:
    import genjax_tpu as g
    from genjax_tpu.parallel import make_mesh, run_chains_sharded

    @g.gen
    def model():
        mu = g.normal(0.0, 1.0) @ "mu"
        _ = g.normal(mu, 1.0) @ "y"

    obs = g.C["y"].set(2.0)
    mesh = make_mesh(n_shards)

    def make_trace(k):
        tr, _ = model.generate(k, obs, ())
        return tr

    run = lambda s: run_chains_sharded(
        jr.key(s), make_trace, g.HMC(g.S["mu"], 0.3, L=5),
        n_steps=n_steps, n_chains=n_chains, mesh=mesh,
    )
    return _best_rate(
        run, lambda o: sync(o.accept_rate), n_chains * n_steps, reps=6
    )


def main():
    n_dev = len(jax.devices())
    shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    results = {"device": jax.devices()[0].device_kind, "pf": {}, "chains": {}}

    for s in shard_counts:
        # weak scaling: work per shard constant
        pf_rate = bench_pf(s, n_particles=4096 * s, T=20)
        ch_rate = bench_chains(s, n_chains=1024 * s, n_steps=20)
        results["pf"][s] = pf_rate
        results["chains"][s] = ch_rate
        print(
            f"shards={s}: PF {pf_rate/1e6:.2f}M particle-steps/s, "
            f"chains {ch_rate/1e6:.2f}M transitions/s",
            file=sys.stderr,
        )

    base_pf = results["pf"][1]
    base_ch = results["chains"][1]
    for s in shard_counts[1:]:
        results.setdefault("efficiency", {})[s] = {
            "pf": results["pf"][s] / (base_pf * s),
            "chains": results["chains"][s] / (base_ch * s),
        }
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
