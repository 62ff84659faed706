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


def save_segment_state(checkpoint_dir: str, state: Any, meta: dict) -> None:
    """Crash-atomic segmented-state save shared by the resumable drivers
    (``sample_posterior``, ``run_chains_sharded``).

    The state is written to a VERSIONED directory ``state_<segment>`` and
    the small JSON meta sidecar — which records the segment cursor, the
    run-identity fields the resume validates, and ``state_dir`` — is
    flipped atomically afterwards (process 0 only; multi-host callers
    share the checkpoint directory), then older state dirs are removed.
    A preemption at ANY point leaves meta pointing at a fully-written
    state: before the flip the previous pair is intact; after it the new
    one is. (A state/meta pair written in place would brick the
    checkpoint if the crash landed between the two writes.)

    ``meta`` must contain ``next_segment``; everything else is
    caller-defined and round-trips verbatim.
    """
    import json
    import shutil

    import jax

    seg = int(meta["next_segment"])
    state_name = f"state_{seg}"
    os.makedirs(checkpoint_dir, exist_ok=True)
    save_pytree(os.path.join(checkpoint_dir, state_name), state)
    meta = {**meta, "state_dir": state_name}
    meta_path = os.path.join(checkpoint_dir, "meta.json")
    if jax.process_index() == 0:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
        # GC: everything older than the directory meta now points at
        for name in os.listdir(checkpoint_dir):
            if name.startswith("state_") and name != state_name:
                shutil.rmtree(
                    os.path.join(checkpoint_dir, name), ignore_errors=True
                )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"genjax_seg_ckpt_{seg}")


def load_segment_state(checkpoint_dir: str, make_template) -> Any:
    """Resume-point lookup for :func:`save_segment_state`: returns
    ``None`` when no checkpoint exists, else ``(state, meta)``.
    ``make_template(meta)`` builds the restore template (static structure
    is rebuilt from code; leaves come from the checkpoint)."""
    import json

    meta_path = os.path.join(checkpoint_dir, "meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    # build the template FIRST: make_template runs the caller's identity
    # validation, so a foreign/legacy meta is refused with a clear error
    # before any of its fields (e.g. state_dir) are trusted
    template = make_template(meta)
    state = restore_pytree(
        os.path.join(checkpoint_dir, meta["state_dir"]), template
    )
    return state, meta


def check_meta_matches(checkpoint_dir: str, meta: dict, expect: dict):
    """Refuse to resume a checkpoint whose recorded run identity differs
    from the current call's: every key of ``expect`` must match the
    recorded meta (missing keys count as mismatches)."""
    mismatched = {
        k: (meta.get(k), v) for k, v in expect.items() if meta.get(k) != v
    }
    if mismatched:
        raise ValueError(
            f"checkpoint at {checkpoint_dir!r} records a different run "
            f"({mismatched}: recorded vs requested) — refusing to resume "
            "(the same arguments and key are required for bitwise "
            "resumption)"
        )


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
