from .diff import (
    Argdiffs,
    Diff,
    NoChange,
    Retdiff,
    UnknownChange,
)
from .environment import Environment
from .handlers import (
    AddressReuse,
    StatefulHandler,
    stateful,
    GenJAXError,
    MissingAddress,
    NotTracedError,
    TraceHandler,
    handle,
)
from .primitive import InitialStylePrimitive, initial_style_bind, initial_style_primitive
from .pytree import (
    Closure,
    Const,
    Pytree,
    PythonicPytree,
    nth,
    tree_const,
    tree_const_unwrap,
)
from .staging import (
    FlagOp,
    get_shaped_aval,
    cached_stage_dynamic,
    empty_trace,
    multi_switch,
    stage,
    staged_check,
    staged_choose,
    to_shape_fn,
    tree_choose,
)
from .typing_ import (
    Address,
    AddressComponent,
    R,
    Array,
    ArrayLike,
    BoolArray,
    Flag,
    FloatArray,
    IntArray,
    PRNGKey,
    ScalarFlag,
    ScalarInt,
    StaticAddress,
    nobeartype,
    static_check_is_concrete,
    static_check_supports_grad,
)

import types as _types

# exclude the private submodule objects (diff, staging, ...) from the star
# surface; the lazy generative re-exports are appended below their table
__all__ = [
    k
    for k, v in list(globals().items())
    if not k.startswith("_") and not isinstance(v, _types.ModuleType)
]

# Reference-facade parity (`genjax.core` re-exports the generative types;
# reference src/genjax/core/generative.py:15-54). Resolved lazily to avoid
# a circular import — `generative` imports from `core`.
_GENERATIVE_EXPORTS = (
    "ChoiceMap",
    "ChoiceMapBuilder",
    "EditRequest",
    "EmptyRequest",
    "GenerativeFunction",
    "IndexRequest",
    "Mask",
    "NotSupportedEditRequest",
    "PrimitiveEditRequest",
    "Regenerate",
    "Selection",
    "SelectionBuilder",
    "Trace",
    "Update",
)


__all__ += list(_GENERATIVE_EXPORTS)


def __getattr__(name):
    if name in _GENERATIVE_EXPORTS:
        from .. import generative

        return getattr(generative, name)
    raise AttributeError(f"module 'genjax_tpu.core' has no attribute {name!r}")
