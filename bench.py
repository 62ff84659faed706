"""Benchmark: HMC samples/sec/chip at 64k parallel chains on the flagship
hierarchical Bayesian regression model (BASELINE.json metric:
"samples/sec/chip at 64k chains").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against this framework's first recorded round (BENCH_r1.json) when
present, else 1.0.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def main():
    import genjax_tpu as g

    n_chains = int(os.environ.get("BENCH_CHAINS", 65536))
    n_steps = int(os.environ.get("BENCH_STEPS", 100))
    L = 5  # leapfrog steps per HMC transition

    N, D = 16, 8
    X = np.random.default_rng(0).normal(size=(N, D)).astype(np.float32)

    @g.gen
    def regression():
        tau = g.log_normal(0.0, 0.5) @ "tau"
        w = g.mv_normal_diag(jnp.zeros(D), tau * jnp.ones(D)) @ "w"
        y = g.mv_normal_diag(X @ w, 0.25 * jnp.ones(N)) @ "y"
        return y

    y_obs = np.random.default_rng(1).normal(size=(N,)).astype(np.float32)
    obs = g.C["y"].set(y_obs)
    req = g.HMC(g.S["w"] | g.S["tau"], 0.02, L=L)

    def make_trace(k):
        tr, _ = regression.generate(k, obs, ())
        return tr

    @jax.jit
    def init(key):
        return jax.vmap(make_trace)(jr.split(key, n_chains))

    @jax.jit
    def sweep(key, traces):
        def chain_step(tr, kk):
            tr, acc = g.mh(kk, tr, req)
            return tr, jnp.asarray(acc, jnp.float32)

        def one(k, tr):
            tr, accs = jax.lax.scan(chain_step, tr, jr.split(k, n_steps))
            return tr, jnp.mean(accs)

        traces, accs = jax.vmap(one)(jr.split(key, n_chains), traces)
        return traces, jnp.mean(accs)

    key = jr.key(7)
    traces = init(key)

    # warm-up / compile. NOTE: on the tunneled TPU backend
    # `block_until_ready` does not actually block — a scalar readback is the
    # only reliable synchronization, and the first readback pays a one-time
    # warmup cost, so sync once before timing.
    traces, acc = sweep(jr.fold_in(key, 0), traces)
    _ = float(acc)

    t0 = time.perf_counter()
    reps = int(os.environ.get("BENCH_REPS", 50))
    for i in range(1, reps + 1):
        traces, acc = sweep(jr.fold_in(key, i), traces)
    # each sweep consumes the previous sweep's traces, so reading the final
    # accept rate forces the whole chain of reps
    _ = float(acc)
    dt = time.perf_counter() - t0

    total_samples = n_chains * n_steps * reps
    samples_per_sec = total_samples / dt

    baseline = None
    if os.path.exists("BENCH_r1.json"):
        try:
            with open("BENCH_r1.json") as f:
                baseline = json.load(f).get("value")
        except Exception:
            baseline = None
    vs_baseline = samples_per_sec / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": f"hmc_samples_per_sec_per_chip_{n_chains}chains",
                "value": round(samples_per_sec, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )
    print(
        f"# chains={n_chains} steps/sweep={n_steps} reps={reps} L={L} "
        f"wall={dt:.2f}s accept={float(acc):.2f} device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
