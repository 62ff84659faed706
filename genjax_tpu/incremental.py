"""Incremental-computation facade: change tangents.

Parity: reference ``/root/reference/src/genjax/incremental.py``.
"""

from .core.diff import Diff, NoChange, UnknownChange

__all__ = ["Diff", "NoChange", "UnknownChange"]
