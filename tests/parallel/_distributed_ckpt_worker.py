"""Worker for the 2-process checkpoint/resume test (run via subprocess).

Forms a 2-process jax.distributed CPU cluster, runs ``run_chains_sharded``
with the chain axis sharded ACROSS the two processes, and proves
interrupted + resumed == uninterrupted bitwise — the state (including the
cross-process-sharded trace leaves) round-trips through the orbax
checkpoint collectively.

Usage: python _distributed_ckpt_worker.py <coordinator_port> <process_id>
<workdir>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid, workdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import numpy as np

from genjax_tpu.parallel import initialize_distributed

initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
)

assert jax.process_count() == 2

import jax.random as jr
from jax.sharding import Mesh

import genjax_tpu as g
from genjax_tpu.parallel import run_chains_sharded


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


OBS = g.C["y"].set(2.0)
mesh = Mesh(np.asarray(jax.devices()), ("batch",))
record = lambda tr: tr.get_choices()["mu"]
common = dict(
    n_steps=8,
    n_chains=16,
    mesh=mesh,
    record=record,
)


def make_trace(k):
    return model.generate(k, OBS, ())[0]


req = g.HMC(g.S["mu"], 0.3, L=3)

print(f"worker {pid}: cluster up, running full", flush=True)
full = run_chains_sharded(
    jr.key(3), make_trace, req,
    checkpoint_dir=f"{workdir}/full", checkpoint_every=4, **common,
)
print(f"worker {pid}: full done", flush=True)
partial = run_chains_sharded(
    jr.key(3), make_trace, req,
    checkpoint_dir=f"{workdir}/resume", checkpoint_every=4,
    max_segments=1, **common,
)
assert partial.history.shape == (16, 4), partial.history.shape
resumed = run_chains_sharded(
    jr.key(3), make_trace, req,
    checkpoint_dir=f"{workdir}/resume", checkpoint_every=4, **common,
)

# bitwise: the resumed run (restored through the collective checkpoint)
# reproduces the uninterrupted one, across both processes' shards
# (cross-process arrays must be gathered before host comparison)
from jax.experimental import multihost_utils


def gather(x):
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


assert np.array_equal(gather(full.history), gather(resumed.history))
assert np.array_equal(
    gather(full.trace.get_choices()["mu"]),
    gather(resumed.trace.get_choices()["mu"]),
)
assert np.array_equal(gather(full.accept_rate), gather(resumed.accept_rate))

print(f"CKPT_RESUME_OK process={pid}", flush=True)
