from .catalog import *  # noqa: F401,F403
from .catalog import __all__ as _catalog_all
from .distribution import (
    Distribution,
    DistributionTrace,
    ExactDensity,
    exact_density,
)

__all__ = [
    "Distribution",
    "DistributionTrace",
    "ExactDensity",
    "exact_density",
    *_catalog_all,
]
