"""ADEV: automatic differentiation of expected values.

Parity: reference ``/root/reference/src/genjax/_src/adev/`` and the facade
``/root/reference/src/genjax/adev.py`` — ``expectation``, ``Expectation``,
``ADEVPrimitive``, ``Dual``, and the estimator zoo.
"""

from .core import (
    ADEVPrimitive,
    ADEVProgram,
    Dual,
    Expectation,
    TailCallADEVPrimitive,
    expectation,
    sample_primitive,
)
from .primitives import (
    AddCost,
    Baseline,
    REINFORCE,
    add_cost,
    baseline,
    beta_implicit,
    categorical_enum_parallel,
    flip_enum,
    flip_enum_parallel,
    flip_mvd,
    flip_reinforce,
    geometric_reinforce,
    mv_normal_diag_reparam,
    mv_normal_reparam,
    normal_reinforce,
    normal_reparam,
    reinforce,
    uniform,
)

__all__ = [
    "ADEVPrimitive",
    "ADEVProgram",
    "AddCost",
    "Baseline",
    "Dual",
    "Expectation",
    "REINFORCE",
    "TailCallADEVPrimitive",
    "add_cost",
    "baseline",
    "beta_implicit",
    "categorical_enum_parallel",
    "expectation",
    "flip_enum",
    "flip_enum_parallel",
    "flip_mvd",
    "flip_reinforce",
    "geometric_reinforce",
    "mv_normal_diag_reparam",
    "mv_normal_reparam",
    "normal_reinforce",
    "normal_reparam",
    "reinforce",
    "sample_primitive",
    "uniform",
]
