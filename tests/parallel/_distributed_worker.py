"""Worker for the 2-process jax.distributed CPU test (run via subprocess).

Each process owns one CPU device; after ``initialize_distributed`` the
global device count is 2 and a cross-process psum must see both shards.
Usage: python _distributed_worker.py <coordinator_port> <process_id>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid = int(sys.argv[1]), int(sys.argv[2])

from genjax_tpu.parallel import host_local_mesh, initialize_distributed

initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

local = host_local_mesh()
assert local.devices.size == len(jax.local_devices())

# cross-process collective: global mesh over both processes' devices
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("batch",))
sharding = NamedSharding(mesh, P("batch"))
# each process contributes its slice of a length-2 global array
global_arr = jax.make_array_from_process_local_data(
    sharding, np.asarray([float(pid + 1)]), (2,)
)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(global_arr)
# total = 1 + 2 across processes
assert float(total) == 3.0, float(total)

print(f"DISTRIBUTED_OK process={pid}", flush=True)
