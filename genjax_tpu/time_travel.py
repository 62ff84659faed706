"""Time-travel debugging facade.

Parity: reference ``/root/reference/src/genjax/time_travel.py``.
"""

from .debug.time_travel import (
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
