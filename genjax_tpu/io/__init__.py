"""Checkpoint/restore for inference state.

The reference has no checkpointing (SURVEY.md §5: "Checkpoint / resume:
none"); because every framework object is a pytree of arrays, sharded
checkpointing comes from orbax directly — this module is the thin,
structure-aware wrapper (treedefs are reconstructed from a template, so
restored objects are real traces/collections, not raw arrays).
"""

from .checkpoint import (
    check_meta_matches,
    load_segment_state,
    restore_pytree,
    save_pytree,
    save_segment_state,
)

__all__ = [
    "check_meta_matches",
    "load_segment_state",
    "restore_pytree",
    "save_pytree",
    "save_segment_state",
]
