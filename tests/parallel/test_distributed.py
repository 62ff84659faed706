"""Multi-process runtime smoke test (VERDICT round-1 item 7): run a real
2-process ``jax.distributed`` CPU cluster through the framework's
``initialize_distributed`` / ``host_local_mesh`` entry points, with a
cross-process collective. Skipped when the local environment cannot form
the cluster (e.g. sandboxed CI without localhost sockets)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cluster():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).parents[2]), env.get("PYTHONPATH", "")]
    )
    # one CPU device per process
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=90)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed cluster did not form (timeout)")
    for rc, out in outs:
        if rc != 0 and (
            "UNAVAILABLE" in out
            or "Failed to connect" in out
            or "DEADLINE_EXCEEDED" in out
        ):
            pytest.skip(f"distributed runtime unavailable here: {out[-300:]}")
        assert rc == 0, out
        assert "DISTRIBUTED_OK" in out
