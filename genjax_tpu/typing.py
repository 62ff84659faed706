"""Public typing facade.

Parity: reference ``/root/reference/src/genjax/typing.py`` (re-exports the
internal typing aliases).
"""

from .core.typing_ import (
    Address,
    AddressComponent,
    Array,
    ArrayLike,
    BoolArray,
    Flag,
    FloatArray,
    InAxes,
    IntArray,
    PRNGKey,
    R,
    ScalarFlag,
    ScalarInt,
    ScalarShaped,
    StaticAddress,
    nobeartype,
    static_check_is_array,
    static_check_is_concrete,
    static_check_shape_dtype_equivalence,
    static_check_supports_grad,
)

__all__ = [
    "Address",
    "AddressComponent",
    "Array",
    "ArrayLike",
    "BoolArray",
    "Flag",
    "FloatArray",
    "InAxes",
    "IntArray",
    "PRNGKey",
    "R",
    "ScalarFlag",
    "ScalarInt",
    "ScalarShaped",
    "StaticAddress",
    "nobeartype",
    "static_check_is_array",
    "static_check_is_concrete",
    "static_check_shape_dtype_equivalence",
    "static_check_supports_grad",
]
