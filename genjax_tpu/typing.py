"""Public typing facade.

Parity: reference ``/root/reference/src/genjax/typing.py`` (re-exports the
internal typing aliases).
"""

from .core.typing_ import (
    AddressComponent,
    R,
    BoolArray,
    FloatArray,
    Flag,
    IntArray,
    PRNGKey,
    ScalarFlag,
    static_check_is_concrete,
    static_check_supports_grad,
)

__all__ = [
    "AddressComponent",
    "R",
    "BoolArray",
    "Flag",
    "FloatArray",
    "IntArray",
    "PRNGKey",
    "ScalarFlag",
    "static_check_is_concrete",
    "static_check_supports_grad",
]
