"""Optional runtime checks, gated globally.

Parity: reference ``/root/reference/src/genjax/_src/checkify.py``
(``do_checkify`` :19-33). When enabled, validity assertions (e.g. unmasking an
invalid ``Mask``) are staged as ``jax.experimental.checkify`` checks; when
disabled (the default) they cost nothing.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

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
