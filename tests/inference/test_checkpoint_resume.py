"""Preemption-safe resume (VERDICT r4 item 2): interrupted + resumed runs
must be BITWISE identical to uninterrupted ones — in-process, in a fresh
process, and for the sharded chain runner on the CPU mesh.

The segmentation invariant that makes this work: per-draw PRNG keys are
pre-split from the caller key, so segment boundaries never change the
sample stream (``sample_posterior`` docstring)."""

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu.inference.sample import sample_posterior


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


OBS = g.C["y"].set(2.0)
KW = dict(
    n_chains=32, n_warmup=20, n_samples=12, algorithm="hmc", eps0=0.3, L=3
)


def _run(**over):
    kw = {**KW, **over}
    return sample_posterior(
        jr.key(7), model, OBS, (), g.S["mu"], **kw
    )


def test_segmentation_is_bitwise_invariant():
    """checkpoint_every=k produces the SAME draws as an unsegmented run
    — segmentation is pure restartability, not a different sampler."""
    plain = _run()
    with tempfile.TemporaryDirectory() as d:
        seg = _run(checkpoint_dir=d, checkpoint_every=5)
    assert np.array_equal(np.asarray(plain["mu"]), np.asarray(seg["mu"]))
    assert float(plain.accept_rate) == float(seg.accept_rate)


def test_interrupted_plus_resumed_is_bitwise_in_process():
    plain = _run(checkpoint_dir=None)
    with tempfile.TemporaryDirectory() as d:
        partial = _run(checkpoint_dir=d, checkpoint_every=4, max_segments=2)
        # partial run returned only the completed segments' draws
        assert partial["mu"].shape[1] == 8
        meta = json.load(open(os.path.join(d, "meta.json")))
        assert meta["next_segment"] == 2 and meta["n_done"] == 8
        resumed = _run(checkpoint_dir=d, checkpoint_every=4)
        assert resumed["mu"].shape[1] == KW["n_samples"]
    assert np.array_equal(
        np.asarray(plain["mu"]), np.asarray(resumed["mu"])
    )
    assert float(plain.eps) == float(resumed.eps)


def test_resume_refuses_mismatched_geometry():
    with tempfile.TemporaryDirectory() as d:
        _run(checkpoint_dir=d, checkpoint_every=4, max_segments=1)
        with pytest.raises(ValueError, match="refusing to resume"):
            _run(checkpoint_dir=d, checkpoint_every=4, n_samples=20)


def test_column_algorithms_reject_checkpointing():
    with pytest.raises(ValueError, match="trace-path"):
        _run(checkpoint_dir="/tmp/nope", algorithm="chees")


_FRESH = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.random as jr
import numpy as np
import genjax_tpu as g
from genjax_tpu.inference.sample import sample_posterior

stage, d, out = sys.argv[1], sys.argv[2], sys.argv[3]

@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"

kw = dict(n_chains=32, n_warmup=20, n_samples=12, algorithm="hmc",
          eps0=0.3, L=3, checkpoint_dir=d, checkpoint_every=4)
if stage == "partial":
    kw["max_segments"] = 2
res = sample_posterior(jr.key(7), model, g.C["y"].set(2.0), (), g.S["mu"], **kw)
np.save(out, np.asarray(res["mu"]))
print("STAGE_OK", stage)
"""


def test_interrupted_plus_resumed_is_bitwise_fresh_process():
    """The resume happens in a brand-new process: nothing in-memory
    survives, only the checkpoint directory — the preemption scenario."""
    plain = _run(checkpoint_dir=None)
    with tempfile.TemporaryDirectory() as d:
        script = os.path.join(d, "stage.py")
        with open(script, "w") as f:
            f.write(_FRESH)
        ckpt = os.path.join(d, "ckpt")
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            [str(Path(__file__).parents[2]), env.get("PYTHONPATH", "")]
        )
        for stage in ("partial", "resume"):
            out = os.path.join(d, f"{stage}.npy")
            proc = subprocess.run(
                [sys.executable, script, stage, ckpt, out],
                capture_output=True, text=True, env=env, timeout=300,
            )
            assert proc.returncode == 0, proc.stdout + proc.stderr
            assert f"STAGE_OK {stage}" in proc.stdout
        partial = np.load(os.path.join(d, "partial.npy"))
        resumed = np.load(os.path.join(d, "resume.npy"))
    assert partial.shape[1] == 8
    assert resumed.shape == (32, 12)
    assert np.array_equal(np.asarray(plain["mu"]), resumed)


def test_run_chains_sharded_resume_bitwise_on_mesh():
    """The sharded chain runner: interrupted + resumed == uninterrupted,
    chain axis sharded over the 8-device CPU mesh, with a record fn."""
    from genjax_tpu.parallel import make_mesh, run_chains_sharded

    mesh = make_mesh()
    record = lambda tr: tr.get_choices()["mu"]

    def make_trace(k):
        return model.generate(k, OBS, ())[0]

    common = dict(
        n_steps=12, n_chains=32, mesh=mesh, record=record
    )
    with tempfile.TemporaryDirectory() as da, \
            tempfile.TemporaryDirectory() as db:
        full = run_chains_sharded(
            jr.key(3), make_trace, g.HMC(g.S["mu"], 0.3, L=3),
            checkpoint_dir=da, checkpoint_every=4, **common,
        )
        partial = run_chains_sharded(
            jr.key(3), make_trace, g.HMC(g.S["mu"], 0.3, L=3),
            checkpoint_dir=db, checkpoint_every=4, max_segments=1,
            **common,
        )
        assert partial.history.shape == (32, 4)
        resumed = run_chains_sharded(
            jr.key(3), make_trace, g.HMC(g.S["mu"], 0.3, L=3),
            checkpoint_dir=db, checkpoint_every=4, **common,
        )
    assert np.array_equal(
        np.asarray(full.history), np.asarray(resumed.history)
    )
    assert np.array_equal(
        np.asarray(full.trace.get_choices()["mu"]),
        np.asarray(resumed.trace.get_choices()["mu"]),
    )
    # accept_rate keeps the non-checkpointed contract: per-chain vector
    assert full.accept_rate.shape == (32,)
    assert np.array_equal(
        np.asarray(full.accept_rate), np.asarray(resumed.accept_rate)
    )
    plain = run_chains_sharded(
        jr.key(3), make_trace, g.HMC(g.S["mu"], 0.3, L=3), **common
    )
    assert plain.accept_rate.shape == full.accept_rate.shape


def test_resume_refuses_different_dynamics():
    """Run identity (not just geometry) is validated: resuming with a
    different eps0 / algorithm / key is refused instead of silently
    mixing two samplers."""
    with tempfile.TemporaryDirectory() as d:
        _run(checkpoint_dir=d, checkpoint_every=4, max_segments=1)
        with pytest.raises(ValueError, match="refusing to resume"):
            _run(checkpoint_dir=d, checkpoint_every=4, eps0=0.1)
    with tempfile.TemporaryDirectory() as d:
        _run(checkpoint_dir=d, checkpoint_every=4, max_segments=1)
        with pytest.raises(ValueError, match="refusing to resume"):
            sample_posterior(
                jr.key(99), model, OBS, (), g.S["mu"],
                **{**KW, "checkpoint_dir": d, "checkpoint_every": 4},
            )  # different key -> different fingerprint


def test_crash_window_leaves_resumable_checkpoint():
    """The versioned state-dir + atomic meta flip: a crash DURING the
    next segment's state save (simulated by a garbage state_k dir that
    meta does not point at) must not brick the checkpoint."""
    plain = _run(checkpoint_dir=None)
    with tempfile.TemporaryDirectory() as d:
        _run(checkpoint_dir=d, checkpoint_every=4, max_segments=2)
        meta = json.load(open(os.path.join(d, "meta.json")))
        assert meta["state_dir"] == "state_2"
        # simulate a preemption mid-save of segment 3's state: a partial
        # (garbage) dir exists but meta still points at state_2
        os.makedirs(os.path.join(d, "state_3"))
        with open(os.path.join(d, "state_3", "junk"), "w") as f:
            f.write("partial write")
        resumed = _run(checkpoint_dir=d, checkpoint_every=4)
    assert np.array_equal(
        np.asarray(plain["mu"]), np.asarray(resumed["mu"])
    )


def test_max_segments_zero_fresh_run_raises_sharded():
    from genjax_tpu.parallel import make_mesh, run_chains_sharded

    mesh = make_mesh()

    def make_trace(k):
        return model.generate(k, OBS, ())[0]

    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="no chain segments ran"):
            run_chains_sharded(
                jr.key(3), make_trace, g.HMC(g.S["mu"], 0.3, L=3),
                n_steps=8, n_chains=16, mesh=mesh,
                checkpoint_dir=d, checkpoint_every=4, max_segments=0,
            )


def test_sharded_resume_with_vector_inv_mass():
    """The request fingerprint handles array leaves (a warmup-adapted
    inv_mass vector crashed the fingerprint before round 5's fix)."""
    from genjax_tpu.parallel import make_mesh, run_chains_sharded

    mesh = make_mesh()

    def make_trace(k):
        return model.generate(k, OBS, ())[0]

    req = g.HMC(g.S["mu"], 0.3, L=3, inv_mass=jnp.ones(1))
    with tempfile.TemporaryDirectory() as d:
        out = run_chains_sharded(
            jr.key(3), make_trace, req, n_steps=4, n_chains=16, mesh=mesh,
            checkpoint_dir=d, checkpoint_every=2,
        )
    assert out.accept_rate.shape == (16,)


def test_n_samples_zero_fails_fast():
    with pytest.raises(ValueError, match="n_samples must be"):
        _run(n_samples=0)
