from .choice_map import (
    C,
    ChoiceMap,
    ChoiceMapBuilder,
    ChoiceMapNoValueAtAddress,
    EmptyChm,
    IndexedChm,
    StaticChm,
    SwitchChm,
    ValueChm,
)
from .concepts import (
    Argdiffs,
    Arguments,
    DiffAnnotate,
    EditRequest,
    EmptyRequest,
    IndexRequest,
    NotSupportedEditRequest,
    PrimitiveEditRequest,
    Regenerate,
    Retdiff,
    Retval,
    Score,
    Update,
    VectorRequest,
    Weight,
)
from .gfi import GenerativeFunction, GenerativeFunctionClosure
from .mask import Mask
from .selection import (
    AllSel,
    ChmSel,
    LeafSel,
    NoneSel,
    S,
    Selection,
    SelectionBuilder,
)
from .trace import Trace

__all__ = [k for k in dir() if not k.startswith("_")]
