"""Orbax-backed checkpointing of framework pytrees (traces, particle
collections, chain states, adaptation state).

Long-running multi-host MCMC/SMC jobs checkpoint their full state
(sharded arrays included — orbax handles per-host shards) and resume
exactly. Static structure (treedefs: addresses, generative functions,
static fields) is NOT serialized; restoration takes a template with the
same structure (e.g. a freshly built zero trace) and fills its leaves.
"""

from __future__ import annotations

import os
from typing import Any

import jax.tree_util as jtu


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save ``tree``'s array leaves to ``path`` (a directory)."""
    leaves = jtu.tree_leaves(tree)
    _checkpointer().save(os.path.abspath(path), leaves, force=True)


def restore_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_pytree`` into the structure of
    ``template`` (same treedef; leaves replaced by the stored arrays)."""
    leaves, treedef = jtu.tree_flatten(template)
    restored = _checkpointer().restore(os.path.abspath(path))
    assert len(restored) == len(leaves), (
        f"checkpoint has {len(restored)} leaves, template has {len(leaves)}"
    )
    return jtu.tree_unflatten(treedef, restored)
