"""Inference library: GenSP targets/algorithms, SMC, MCMC edit requests, VI.

Parity: reference ``/root/reference/src/genjax/_src/inference/`` and the
facade ``/root/reference/src/genjax/inference/__init__.py``.
"""

# NOTE: the smc2 SUBMODULE is deliberately absent from this list — the
# public name `smc2` is the driver function below, and importing the module
# here would let the later `from .smc2 import ... smc2` rebind shadow it
# inconsistently. `from genjax_tpu.inference.smc2 import ...` still works.
from . import adaptation, diagnostics, gibbs, involutive, learning, mcmc, pgibbs, requests, sample, smc, tempered
# (like smc2 above, the `advi`/`pathfinder` public names are the fit
# functions, not the modules)
from .advi import ADVIPosterior, ADVIResult, advi, column_advi
from .pathfinder import (
    MultiPathfinderResult,
    PathfinderPosterior,
    PathfinderResult,
    column_pathfinder,
    multi_pathfinder,
    pathfinder,
)
from . import enumerate_
from .enumerate_ import EnumerationResult, enumerate_posterior
from . import predictive
from .predictive import posterior_predictive
from .involutive import InvolutiveInfo, involutive_mh, involutive_move
from .gibbs import (
    GibbsInfo,
    GibbsSweepResult,
    enum_move,
    enum_vmap_move,
    enumerative_gibbs,
    enumerative_gibbs_vmap,
    gibbs_sweep,
    mh_move,
)
from . import abc as abc_
from .abc import (
    ABCRejectionResult,
    ABCSMCResult,
    abc_rejection,
    abc_smc,
    column_weighted_moments,
)
from . import nested
from .nested import (
    NestedSamplingResult,
    column_nested_sampling,
    nested_sampling,
)
from .sp import Algorithm, Marginal, SampleDistribution, Target, marginal
from .mcmc import MHChainResult, mh, run_chain, run_chains, run_chains_hmc, run_chains_nuts
from .smc2 import SMC2Result, smc2
from .pgibbs import (
    CSMCSweepResult,
    PGibbsResult,
    PMMHResult,
    csmc_sweep,
    particle_gibbs,
    pmmh,
)
from .tempered import AdaptiveTemperedSMCResult, TemperedSMCResult, adaptive_tempered_smc, geometric_ladder, tempered_smc
from .learning import LaplaceResult, MAPResult, fit_map, laplace_approximation
from .model_comparison import ELPDResult, compare, psis_loo, waic
from .sbc import SBCResult, sbc_ranks, sbc_uniformity
from .smc_chees import (
    ChEESTemperedResult,
    chees_tempered_smc,
    column_tempered_chees,
)
from .sample import LogdensitySamples, PosteriorSamples, sample_logdensity, sample_posterior
from .smc import ChangeTarget, Importance, ImportanceK, ParticleCollection, SMCAlgorithm

__all__ = [
    "ABCRejectionResult",
    "ChEESTemperedResult",
    "chees_tempered_smc",
    "column_tempered_chees",
    "ABCSMCResult",
    "abc_rejection",
    "abc_smc",
    "column_weighted_moments",
    "Algorithm",
    "ChangeTarget",
    "Importance",
    "ImportanceK",
    "Marginal",
    "ParticleCollection",
    "SMCAlgorithm",
    "SampleDistribution",
    "Target",
    "LaplaceResult",
    "MAPResult",
    "MHChainResult",
    "ELPDResult",
    "LogdensitySamples",
    "PosteriorSamples",
    "fit_map",
    "laplace_approximation",
    "adaptation",
    "learning",
    "marginal",
    "mh",
    "sample",
    "compare",
    "psis_loo",
    "SBCResult",
    "sbc_ranks",
    "sbc_uniformity",
    "sample_logdensity",
    "sample_posterior",
    "waic",
    "diagnostics",
    "mcmc",
    "requests",
    "run_chain",
    "run_chains",
    "run_chains_hmc",
    "run_chains_nuts",
    "AdaptiveTemperedSMCResult",
    "TemperedSMCResult",
    "adaptive_tempered_smc",
    "geometric_ladder",
    "tempered",
    "tempered_smc",
    "smc",
    "CSMCSweepResult",
    "PGibbsResult",
    "PMMHResult",
    "csmc_sweep",
    "particle_gibbs",
    "pgibbs",
    "GibbsInfo",
    "GibbsSweepResult",
    "enum_move",
    "enum_vmap_move",
    "enumerative_gibbs",
    "enumerative_gibbs_vmap",
    "gibbs",
    "gibbs_sweep",
    "mh_move",
    "EnumerationResult",
    "enumerate_posterior",
    "posterior_predictive",
    "predictive",
    "InvolutiveInfo",
    "involutive",
    "involutive_mh",
    "involutive_move",
    "pmmh",
    "smc2",
    "SMC2Result",
    "ADVIPosterior",
    "ADVIResult",
    "advi",
    "column_advi",
    "NestedSamplingResult",
    "column_nested_sampling",
    "nested",
    "nested_sampling",
    "MultiPathfinderResult",
    "PathfinderPosterior",
    "PathfinderResult",
    "column_pathfinder",
    "multi_pathfinder",
    "pathfinder",
]
