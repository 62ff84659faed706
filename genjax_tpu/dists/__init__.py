from .catalog import *  # noqa: F401,F403
from .catalog import __all__ as _catalog_all
from .discrete_hmm import DiscreteHMM, DiscreteHMMConfiguration, forward_filtering_backward_sampling
from .hmm_tools import HMMPosterior, forward_backward, forward_backward_parallel, forward_parallel, hmm_em, hmm_log_marginal, hmm_posterior_sample, viterbi, viterbi_parallel
from .lgssm import LGSSMParams, LinearGaussianSSM, ffbs, kalman_filter, kalman_filter_parallel, kalman_predict, kalman_smoother, kalman_smoother_parallel, kalman_update, lgssm_em
from .distribution import (
    Distribution,
    tfp_distribution,
    DistributionTrace,
    ExactDensity,
    exact_density,
)

__all__ = [
    "DiscreteHMM",
    "forward_filtering_backward_sampling",
    "DiscreteHMMConfiguration",
    "HMMPosterior",
    "forward_backward",
    "forward_backward_parallel",
    "forward_parallel",
    "hmm_em",
    "hmm_log_marginal",
    "hmm_posterior_sample",
    "viterbi",
    "viterbi_parallel",
    "LGSSMParams",
    "LinearGaussianSSM",
    "ffbs",
    "kalman_filter",
    "kalman_filter_parallel",
    "kalman_predict",
    "kalman_smoother",
    "kalman_smoother_parallel",
    "kalman_update",
    "lgssm_em",
    "Distribution",
    "DistributionTrace",
    "ExactDensity",
    "exact_density",
    "tfp_distribution",
    *_catalog_all,
]
