"""Checkpoint round-trips, including sharded arrays on the CPU mesh."""

import os
import tempfile

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu.io import restore_pytree, save_pytree
from genjax_tpu.parallel import make_mesh, shard_batch


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


def test_trace_batch_roundtrip():
    trs = jax.vmap(lambda k: model.simulate(k, ()))(
        jax.random.split(jax.random.key(0), 64)
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_pytree(path, trs)
        template = jax.tree_util.tree_map(jnp.zeros_like, trs)
        restored = restore_pytree(path, template)
        assert jnp.allclose(restored.get_score(), trs.get_score())
        for a, b in zip(
            jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(trs)
        ):
            assert jnp.allclose(a, b)


def test_sharded_array_roundtrip():
    """Sharded leaves save and restore (multi-host checkpointing path)."""
    mesh = make_mesh()
    trs = jax.vmap(lambda k: model.simulate(k, ()))(
        jax.random.split(jax.random.key(1), 64)
    )
    sharded = shard_batch(trs, mesh)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_pytree(path, sharded)
        template = jax.tree_util.tree_map(jnp.zeros_like, trs)
        restored = restore_pytree(path, template)
        assert jnp.allclose(restored.get_score(), trs.get_score())
