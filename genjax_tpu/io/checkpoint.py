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
    """Save ``tree``'s array leaves to ``path`` (a directory).

    Traces and choice maps are pytrees-of-arrays, so any inference state
    round-trips:

    >>> import tempfile, os
    >>> import jax.numpy as jnp
    >>> from genjax_tpu.io import save_pytree, restore_pytree
    >>> state = {"w": jnp.arange(3.0), "step": jnp.asarray(7)}
    >>> path = os.path.join(tempfile.mkdtemp(), "ckpt")
    >>> save_pytree(path, state)
    >>> back = restore_pytree(path, state)
    >>> int(back["step"]), back["w"].shape
    (7, (3,))
    """
    leaves = jtu.tree_leaves(tree)
    _checkpointer().save(os.path.abspath(path), leaves, force=True)


def restore_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_pytree`` into the structure of
    ``template`` (same treedef; leaves replaced by the stored arrays).

    Template leaves that are sharded ``jax.Array``s restore AS sharded
    arrays on the template's sharding (each host reads only its shards);
    otherwise orbax's defaults apply. Every restored leaf is validated
    against the template's shape/dtype — a wrong-but-same-arity template
    fails fast instead of yielding a structurally corrupt object."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    leaves, treedef = jtu.tree_flatten(template)

    def restore_arg(leaf):
        if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
            return ocp.ArrayRestoreArgs(
                sharding=leaf.sharding, global_shape=leaf.shape,
                dtype=leaf.dtype,
            )
        return ocp.RestoreArgs()

    restored = _checkpointer().restore(
        os.path.abspath(path),
        item=leaves,
        restore_args=[restore_arg(l) for l in leaves],
    )
    if len(restored) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(restored)} leaves, template has "
            f"{len(leaves)}"
        )
    for i, (r, t) in enumerate(zip(restored, leaves)):
        t_shape = np.shape(t)
        t_dtype = getattr(t, "dtype", None)
        r_shape = np.shape(r)
        r_dtype = getattr(r, "dtype", None)
        if t_shape != r_shape or (
            t_dtype is not None and r_dtype is not None and t_dtype != r_dtype
        ):
            raise ValueError(
                f"checkpoint leaf {i}: stored shape/dtype "
                f"{r_shape}/{r_dtype} does not match the template's "
                f"{t_shape}/{t_dtype} — wrong template?"
            )
    return jtu.tree_unflatten(treedef, restored)
