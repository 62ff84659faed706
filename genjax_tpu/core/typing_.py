"""Type aliases and trace-time static checks.

Parity: reference ``/root/reference/src/genjax/_src/core/typing.py`` (135 LoC):
``Flag`` :55, ``ScalarFlag``/``ScalarInt`` :62-63, ``static_check_is_concrete``
:88, ``static_check_supports_grad`` :94. Beartype/jaxtyping are not used here;
aliases are plain typing aliases and the checks are trace-time predicates.
"""

from __future__ import annotations

from typing import Annotated, Any, Callable, Sequence, TypeAlias, Union

import jax
import jax.numpy as jnp
import numpy as np

Array: TypeAlias = jax.Array
ArrayLike: TypeAlias = Union[jax.Array, np.ndarray, float, int, bool]
PRNGKey: TypeAlias = jax.Array
FloatArray: TypeAlias = Union[float, jax.Array]
IntArray: TypeAlias = Union[int, jax.Array]
BoolArray: TypeAlias = Union[bool, jax.Array]

#: Boolean that may be a concrete Python bool or a traced array.
Flag: TypeAlias = Union[bool, jax.Array]
ScalarFlag: TypeAlias = Union[bool, jax.Array]
ScalarInt: TypeAlias = Union[int, jax.Array]

Address: TypeAlias = Any
StaticAddress: TypeAlias = Union[str, tuple]
AddressComponent: TypeAlias = Any

#: ``jax.vmap`` in_axes specification (reference typing.py:53).
InAxes: TypeAlias = Union[int, None, Sequence[Any]]

#: Scalar-shape annotation marker (reference typing.py:61 uses a beartype
#: validator; without beartype in this image it is documentation-grade
#: metadata usable with ``Annotated``).
ScalarShaped = "scalar-shaped"

Callable_: TypeAlias = Callable


def static_check_is_concrete(x: Any) -> bool:
    """True if ``x`` is a concrete (non-traced) value at trace time."""
    return not isinstance(x, jax.core.Tracer)


def static_check_is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) or isinstance(x, jax.core.Tracer)


def static_check_supports_grad(v: Any) -> bool:
    """True if ``v`` is an inexact (differentiable) array value."""
    dtype = jnp.result_type(v)
    return jnp.issubdtype(dtype, jnp.inexact)


def static_check_shape_dtype_equivalence(vs: Sequence[Any]) -> bool:
    """True if all values share shape and dtype (used by tree_choose)."""
    shapes = [jnp.shape(v) for v in vs]
    dtypes = [jnp.result_type(v) for v in vs]
    return len(set(shapes)) <= 1 and len(set(dtypes)) <= 1


def nobeartype(fn):
    """No-op escape hatch kept for reference API parity (typing.py:61-63)."""
    return fn


# ----- reference-parity alias (reference typing.py) -----
import typing as _typing

R = _typing.TypeVar("R")  # generic return-type variable
