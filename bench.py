"""Benchmark: HMC samples/sec/chip at 64k parallel chains on the flagship
hierarchical Bayesian regression model (BASELINE.json metric:
"samples/sec/chip at 64k chains").

Measures the production fused column-layout HMC path
(genjax_tpu.kernels.column_hmc): the model's log-joint extracted from the
@gen program, chains packed (D, N) with chains on lanes, whole sweep as one
jitted scan. Prints ONE JSON line {"metric","value","unit","vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline compares to
this framework's first recorded round (BENCH_r1.json) when present.
"""

import json
import os
import sys
import time

import jax

# persistent compile cache: repeat bench runs (e.g. the driver's) skip the
# multi-minute remote compile of the sweep program
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import jax.random as jr
import numpy as np


def main():
    if os.environ.get("BENCH_MODE") == "pf":
        return main_pf()
    import genjax_tpu as g
    from genjax_tpu.kernels import ColumnPacker, column_logdensity, pallas_hmc

    n_chains = int(os.environ.get("BENCH_CHAINS", 65536))
    n_steps = int(os.environ.get("BENCH_STEPS", 50))
    reps = int(os.environ.get("BENCH_REPS", 50))
    backend = os.environ.get("BENCH_BACKEND", "xla")
    L = 5

    from genjax_tpu.models import hierarchical_regression

    N = int(os.environ.get("BENCH_N", 16))
    D = int(os.environ.get("BENCH_D", 8))
    X = np.random.default_rng(0).normal(size=(N, D)).astype(np.float32)
    regression = hierarchical_regression(X)
    y_obs = np.random.default_rng(1).normal(size=(N,)).astype(np.float32)
    obs = g.C["y"].set(y_obs)

    packer = ColumnPacker(regression, obs, (), ["tau", "w"])
    ld = column_logdensity(regression, obs, (), packer)

    def init_one(k):
        tr, _ = regression.generate(k, obs, ())
        return packer.pack(tr.get_choices())

    @jax.jit
    def init(key):
        return jax.vmap(init_one, out_axes=1)(jr.split(key, n_chains))

    sweep = jax.jit(
        lambda q, s: pallas_hmc(
            ld, q, s, n_steps=n_steps, eps=0.02, L=L, backend=backend
        )
    )

    print(f"# init trace+compile start", file=sys.stderr, flush=True)
    t_init = time.perf_counter()
    q = init(jr.key(7))
    print(f"# init dispatched {time.perf_counter()-t_init:.1f}s", file=sys.stderr, flush=True)

    # warm-up / compile. On the tunneled TPU backend block_until_ready does
    # not block; a scalar readback is the only reliable sync (the first
    # readback pays a one-time warmup).
    t_w = time.perf_counter()
    q1, acc = sweep(q, 0)
    print(f"# sweep dispatched {time.perf_counter()-t_w:.1f}s", file=sys.stderr, flush=True)
    _ = float(acc)
    print(f"# warmup synced {time.perf_counter()-t_w:.1f}s", file=sys.stderr, flush=True)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        q, acc = sweep(q, i)
    _ = float(acc)  # forces the whole chained sequence
    dt = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()

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
        f"# fused column path ({backend}); chains={n_chains} steps/sweep={n_steps} "
        f"reps={reps} L={L} wall={dt:.2f}s accept={float(acc):.2f} "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


def main_pf():
    """Supplementary particle-filter benchmark (BENCH_MODE=pf): adaptive
    systematic resampling on the linear-Gaussian SSM."""
    import genjax_tpu as g
    from genjax_tpu.models import linear_gaussian_ssm
    from genjax_tpu.parallel import SSMParticleFilter

    K = int(os.environ.get("BENCH_PARTICLES", 131072))
    T = int(os.environ.get("BENCH_T", 100))
    reps = int(os.environ.get("BENCH_REPS", 20))
    kernel, _ = linear_gaussian_ssm()
    ys = jnp.zeros(T)
    obs = g.C[:, "y"].set(ys)
    pf = SSMParticleFilter(kernel, n_particles=K)
    run = jax.jit(lambda s: pf.run(jr.fold_in(jr.key(0), s), 0.0, jnp.zeros(T), obs))
    out = run(0)
    _ = float(out.log_marginal)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = run(i)
    _ = float(out.log_marginal)
    dt = time.perf_counter() - t0
    rate = K * T * reps / dt
    print(
        json.dumps(
            {
                "metric": f"smc_particle_steps_per_sec_{K}particles",
                "value": round(rate, 1),
                "unit": "particle-steps/sec/chip",
                "vs_baseline": 1.0,
            }
        )
    )
    print(
        f"# particle filter; K={K} T={T} reps={reps} wall={dt:.2f}s "
        f"logZ={float(out.log_marginal):.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
