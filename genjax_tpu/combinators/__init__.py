"""Combinators: structured composition of generative functions.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
combinators/`` — ``Scan`` (scan.py), ``Vmap`` (vmap.py), ``Switch``
(switch.py), ``Mask`` (mask.py), ``Dimap`` (dimap.py), ``mix`` (mixture.py),
``repeat`` (repeat.py), ``or_else`` (or_else.py) and the derived decorators.
"""

from .dimap import DimapCombinator, DimapTrace, contramap, dimap, map
from .mask_comb import MaskCombinator, MaskTrace, mask
from .mixture import mix
from .or_else import or_else
from .repeat import repeat
from .scan import (
    ScanCombinator,
    ScanTrace,
    accumulate,
    iterate,
    iterate_final,
    masked_iterate,
    masked_iterate_final,
    prepend_initial_acc,
    reduce,
    scan,
)
from .switch import SwitchCombinator, SwitchTrace, switch
from .vmap import VmapCombinator, VmapTrace, vmap

# reference-parity class-name aliases (the reference names the combinator
# classes Scan/Vmap/Switch/Dimap/RepeatCombinator)
Scan = ScanCombinator
Vmap = VmapCombinator
Switch = SwitchCombinator
Dimap = DimapCombinator
RepeatCombinator = repeat

__all__ = [
    "Dimap",
    "RepeatCombinator",
    "Scan",
    "Switch",
    "Vmap",
    "DimapCombinator",
    "DimapTrace",
    "MaskCombinator",
    "MaskTrace",
    "ScanCombinator",
    "ScanTrace",
    "SwitchCombinator",
    "SwitchTrace",
    "VmapCombinator",
    "VmapTrace",
    "accumulate",
    "contramap",
    "dimap",
    "iterate",
    "iterate_final",
    "map",
    "mask",
    "masked_iterate",
    "masked_iterate_final",
    "mix",
    "or_else",
    "prepend_initial_acc",
    "reduce",
    "repeat",
    "scan",
    "switch",
    "vmap",
]
