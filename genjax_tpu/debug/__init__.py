"""Debugging facilities: the time-travel debugger.

Parity: reference ``/root/reference/src/genjax/_src/core/compiler/
interpreters/time_travel.py`` and the facade ``genjax.time_travel``.
"""

from .time_travel import (
    FrameRecording,
    TimeTravelingDebugger,
    rec,
    tag,
    time_machine,
)

__all__ = [
    "FrameRecording",
    "TimeTravelingDebugger",
    "rec",
    "tag",
    "time_machine",
]
