"""Frozen config dataclasses for the model stack.

Each carries a `from_ref` parser accepting the reference's YAML subtree
shape (reference: configs/*.yaml; the `name:`-dispatch convention of
train.py:37-42) so reference configs port mechanically.  Dataclasses are
frozen/hashable, which keeps flax module attributes jit-static-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class DenseBlockCfg:
    """DenseNet-style block config (reference: nnblock.py:25-56)."""

    growth_channel: int = 512
    depth: int = 8
    act: str = "ReLU"
    # computation dtype for the conv stack ("float32" or "bfloat16").
    # bfloat16 runs the convs at the MXU's native rate (params stay
    # float32; the block casts its output back to float32 before any grid
    # arithmetic).  Encode/decode bit-exactness is preserved because the
    # coding contract is shared-executable determinism, not float32 (see
    # models/exact.py); the airtight granularity="nn" mode is unaffected.
    dtype: str = "float32"
    # fold each layer's 1x1 conv into its 3x3 (exact composition in weight
    # space; see DenseLayer) -- removes ~45% of the block's MACs and the
    # C-channel HBM intermediate.  MEASURED FASTER on v5e at flagship
    # scale under value-fenced timing (results/mfu_roofline_r04.json:
    # 43.0 vs 46.6 ms/step, ~8%; r3's opposite conclusion was taken under
    # a broken block_until_ready fence and is invalid).  Default ON,
    # consistently here and in from_ref; checkpoints from either variant
    # load into either (train/checkpoint.py:adapt_state_dict) and the
    # .lic fingerprint covers the flag (cli/codec.py), so the default is
    # safe to hold or change without breaking artifacts.
    fuse_1x1: bool = True
    # opt-in, NON-PARITY: round each layer's growth up to a multiple of
    # this (e.g. 128 = the VPU/MXU lane count).  The reference split
    # (growth_channel/depth ~ 43 lanes at flagship scale) starves the
    # 3x3 convs' output lanes -- the parity family sustains ~26% MFU
    # while the lane-padded variant sustains 54% in the same framework
    # (value-fenced, results/mfu_roofline_r04.json); padding the growth
    # turns the convs into full-lane matmuls at the cost of more
    # params/FLOPs.  0 = off (reference parity, every shipped config).
    growth_multiple: int = 0

    @classmethod
    def from_ref(cls, cfg: dict) -> "DenseBlockCfg":
        cfg = dict(cfg)
        cfg.pop("name", None)
        layer = dict(cfg.pop("layer", {}))
        layer.pop("name", None)
        act = layer.pop("act", "ReLU")
        return cls(
            growth_channel=cfg.pop("growth_channel", 512),
            depth=cfg.pop("depth", 8),
            act=act,
            dtype=cfg.pop("dtype", "float32"),
            # default matches the dataclass and the value-fenced
            # measurement (results/mfu_roofline_r04.json: fused 43.0 vs
            # unfused 46.6 ms/step at flagship scale).  The two variants
            # have structurally different param trees; train/checkpoint.py
            # adapts either layout on load, and the .lic fingerprint
            # covers the flag so containers can never silently cross
            # variants (cli/codec.py).
            fuse_1x1=cfg.pop("fuse_1x1", True),
            growth_multiple=cfg.pop("growth_multiple", 0),
        )


@dataclass(frozen=True)
class CouplingCfg:
    """Additive coupling config (reference: couplelib.py:24-45)."""

    split: float = 0.75
    nn: DenseBlockCfg = field(default_factory=DenseBlockCfg)
    nbits: int = 8

    @classmethod
    def from_ref(cls, cfg: dict) -> "CouplingCfg":
        cfg = dict(cfg)
        cfg.pop("name", None)
        rnd = dict(cfg.pop("round", {}) or {})
        rnd.pop("name", None)
        return cls(
            split=cfg.pop("split", 0.75),
            nn=DenseBlockCfg.from_ref(cfg.pop("nn", {}) or {}),
            nbits=rnd.pop("nbits", None) or 8,
        )


@dataclass(frozen=True)
class FlowCfg:
    """IDFlow / ConditionalFlow config (reference: flows.py:26-84,278-301)."""

    H: int = 64
    W: int = 64
    C: int = 3
    nflows: int = 8
    nbits: int = 8
    nsplit: int = 3
    extend_scale: int = 2
    couple: CouplingCfg = field(default_factory=CouplingCfg)
    prior_nn: DenseBlockCfg = field(default_factory=DenseBlockCfg)
    batch_squeeze: int = 0
    conditional: bool = False
    conv_for_cond: bool = False
    cond_channels: int = 3
    perm_seed: int = 0

    @classmethod
    def from_ref(cls, cfg: dict, conditional: bool = False) -> "FlowCfg":
        cfg = dict(cfg)
        name = cfg.pop("name", "IDFlows")
        conditional = conditional or name == "ConditionalFlows"
        extend = dict(cfg.pop("extenddim", {}) or {})
        extend.pop("name", None)
        prior = dict(cfg.pop("prior", {}) or {})
        prior.pop("name", None)
        prior.pop("round", None)
        rnd = dict(cfg.pop("round", {}) or {})
        rnd.pop("name", None)
        cfg.pop("distribution", None)
        cfg.pop("load_path", None)
        C = cfg.pop("C", 3)
        return cls(
            C=C,
            cond_channels=C,
            H=cfg.pop("H", 64),
            W=cfg.pop("W", 64),
            nflows=cfg.pop("nflows", 8),
            nbits=cfg.pop("nbits", 8),
            nsplit=cfg.pop("nsplit", 3),
            extend_scale=extend.pop("scale", 2),
            couple=CouplingCfg.from_ref(cfg.pop("couple", {}) or {}),
            prior_nn=DenseBlockCfg.from_ref(prior.pop("nn", {}) or {}),
            batch_squeeze=cfg.pop("batch_squeeze", 0),
            conditional=conditional,
            conv_for_cond=cfg.pop("conv_for_cond", False),
            perm_seed=cfg.pop("perm_seed", 0),
        )


@dataclass(frozen=True)
class LevelPlan:
    """Static channel/shape bookkeeping for one split level."""

    channel: int  # channels entering the flow steps (after squeeze)
    z_ch: int  # factored-out channels
    keep_ch: int  # channels continuing to the next level (0 at last level)
    h: int
    w: int
    cond_ch: int  # conditioning channels at this level (0 if unconditional)


def level_plans(cfg: FlowCfg) -> Tuple[LevelPlan, ...]:
    """Mirror the reference's constructor arithmetic (flows.py:57-78)."""
    channel = cfg.C * (cfg.batch_squeeze if cfg.batch_squeeze else 1)
    h, w = cfg.H, cfg.W
    s = cfg.extend_scale
    cond_ch = cfg.cond_channels if cfg.conditional else 0
    plans = []
    for level in range(cfg.nsplit):
        channel *= s * s
        h //= s
        w //= s
        cond_ch_l = cond_ch * (s * s) ** (level + 1) if cfg.conditional else 0
        if level < cfg.nsplit - 1:
            z_ch = channel // 2
            keep_ch = channel - channel // 2
        else:
            z_ch = channel
            keep_ch = 0
        plans.append(
            LevelPlan(
                channel=channel,
                z_ch=z_ch,
                keep_ch=keep_ch,
                h=h,
                w=w,
                cond_ch=cond_ch_l,
            )
        )
        channel = keep_ch
    return tuple(plans)


def latent_shapes(cfg: FlowCfg) -> Tuple[Tuple[int, int, int], ...]:
    """NHWC latent shapes per split level (reference: latents_shape,
    flows.py:74-78 -- there CHW)."""
    return tuple((p.h, p.w, p.z_ch) for p in level_plans(cfg))


def with_growth_multiple(cfg: FlowCfg, multiple: int) -> FlowCfg:
    """The same flow config with every DenseBlock lane-padded to
    `multiple` output channels per 3x3 conv.  Pair with
    models/layers.py:pad_growth_params to run a PARITY-family checkpoint
    through the full-lane architecture function-preservingly."""
    from dataclasses import replace

    return replace(
        cfg,
        couple=replace(
            cfg.couple,
            nn=replace(cfg.couple.nn, growth_multiple=multiple),
        ),
        prior_nn=replace(cfg.prior_nn, growth_multiple=multiple),
    )
