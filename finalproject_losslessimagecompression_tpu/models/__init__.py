from .config import (
    CouplingCfg,
    DenseBlockCfg,
    FlowCfg,
    latent_shapes,
    level_plans,
)
from .layers import DenseBlock, DenseLayer, ResBlock, activation
from .invertible import (
    AdditiveCoupling,
    Prior,
    coupling_split,
    inverse_permutation,
    permutation,
)
from .idflow import IDFlow, flow_permutations, log_likelihood
from .exact import FlowCodec
from .twolevel import TwoLevelCfg, TwoLevelFlow
from .residual_codec import ResidualCodec
from .twolevel_codec import TwoLevelCodec
from .vqvae import VQVAE, VectorQuantizer, build_vqvae_from_ref, vq_reinit

__all__ = [
    "CouplingCfg",
    "DenseBlockCfg",
    "FlowCfg",
    "latent_shapes",
    "level_plans",
    "DenseBlock",
    "DenseLayer",
    "ResBlock",
    "activation",
    "AdditiveCoupling",
    "Prior",
    "coupling_split",
    "inverse_permutation",
    "permutation",
    "IDFlow",
    "flow_permutations",
    "log_likelihood",
    "FlowCodec",
    "TwoLevelCfg",
    "TwoLevelFlow",
    "TwoLevelCodec",
    "ResidualCodec",
    "VQVAE",
    "VectorQuantizer",
    "build_vqvae_from_ref",
    "vq_reinit",
]
