"""Test harness configuration: run the whole suite on a simulated 8-device
CPU mesh so sharding/collective logic is exercised without TPU hardware.

(The container's default JAX platform is a tunneled single TPU chip — eager
per-op dispatch over the tunnel is far too slow for unit tests, and tests
must exercise multi-device code paths; see SURVEY.md §4.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
