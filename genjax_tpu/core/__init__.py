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
    GenJAXError,
    MissingAddress,
    NotTracedError,
    TraceHandler,
    handle,
)
from .primitive import initial_style_bind, initial_style_primitive
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

__all__ = [k for k in dir() if not k.startswith("_")]
