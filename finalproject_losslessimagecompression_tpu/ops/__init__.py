from . import distributions  # registers recon distributions
from .distributions import BinomialDistribution, UnitGaussianDistribution
from .rounding import round_ste, round_to_grid
from .dlogistic import dlogistic_log_prob, dlogistic_sample
from .reshape import (
    space_to_depth,
    depth_to_space,
    patch_split,
    patch_merge,
)

__all__ = [
    "round_ste",
    "round_to_grid",
    "dlogistic_log_prob",
    "dlogistic_sample",
    "space_to_depth",
    "depth_to_space",
    "patch_split",
    "patch_merge",
]
