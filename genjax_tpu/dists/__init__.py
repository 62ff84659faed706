from .catalog import *  # noqa: F401,F403
from .catalog import __all__ as _catalog_all
from .discrete_hmm import DiscreteHMM, DiscreteHMMConfiguration
from .distribution import (
    Distribution,
    DistributionTrace,
    ExactDensity,
    exact_density,
)

__all__ = [
    "DiscreteHMM",
    "DiscreteHMMConfiguration",
    "Distribution",
    "DistributionTrace",
    "ExactDensity",
    "exact_density",
    *_catalog_all,
]
