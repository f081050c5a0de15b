"""Two-level coarse/fine pyramid flow (reference: flows.py:185-274).

Pipeline: replication-pad -> adaptive-average-pool to the rough size ->
round -> rough IDFlow on the pooled image; fine residual = padded input -
upsampled rough -> Patching into fine-flow-sized tiles -> fine IDFlow.

TPU-native notes:
- Adaptive pooling (torch AdaptiveAvgPool2d semantics: window
  [floor(i*In/Out), ceil((i+1)*In/Out))) is expressed as two precomputed
  averaging matrices applied by einsum -- two small matmuls on the MXU,
  exact for any size ratio, and trivially differentiable.  The upsampling
  `invpool` is the same construction with roles swapped.
- The reference bounds memory by calling loss.backward() INSIDE forward per
  patch minibatch (flows.py:220-235).  Here the fine flow is wrapped in
  jax.checkpoint (rematerialization) instead: XLA recomputes activations in
  the backward pass, the idiomatic JAX equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.reshape import patch_merge, patch_split
from ..ops.rounding import round_to_grid
from .config import FlowCfg, latent_shapes
from .idflow import IDFlow


@dataclass(frozen=True)
class TwoLevelCfg:
    H: int
    W: int
    C: int
    pad: Tuple[int, int]
    rough: FlowCfg
    fine: FlowCfg
    nbits: int = 8

    @property
    def Hp(self) -> int:  # padded dims (reference: flows.py:193-194)
        return self.H + self.pad[0]

    @property
    def Wp(self) -> int:
        return self.W + self.pad[1]

    @classmethod
    def from_ref(cls, cfg: dict) -> "TwoLevelCfg":
        cfg = dict(cfg)
        cfg.pop("name", None)
        cfg.pop("batchsize", None)
        return cls(
            H=cfg.pop("H"),
            W=cfg.pop("W"),
            C=cfg.pop("C", 3),
            pad=tuple(cfg.pop("pad", (0, 0))),
            rough=FlowCfg.from_ref(dict(cfg.pop("rough_flows"))),
            fine=FlowCfg.from_ref(dict(cfg.pop("fine_flows"))),
            nbits=cfg.pop("nbits", 8),
        )


def adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-stochastic matrix reproducing torch
    AdaptiveAvgPool1d windows."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -(-(i + 1) * n_in // n_out)
        m[i, s:e] = 1.0 / (e - s)
    return m


class TwoLevelFlow(nn.Module):
    cfg: TwoLevelCfg

    def setup(self):
        c = self.cfg
        self.rough = IDFlow(c.rough)
        # fine flow processes B*num_tiles patches; rematerialize its
        # activations in the backward pass (flax-lifted remat -- the JAX
        # equivalent of the reference's backward-inside-forward chunking,
        # flows.py:220-235)
        self.fine = nn.remat(IDFlow)(c.fine)
        self._pool_h = adaptive_pool_matrix(c.Hp, c.rough.H)
        self._pool_w = adaptive_pool_matrix(c.Wp, c.rough.W)
        self._up_h = adaptive_pool_matrix(c.rough.H, c.Hp)
        self._up_w = adaptive_pool_matrix(c.rough.W, c.Wp)

    @property
    def latent_shapes(self):
        """[rough z0 shape, fine z0 shape with tile count folded into
        channels] (reference: flows.py:202-204)."""
        c = self.cfg
        r = latent_shapes(c.rough)[0]
        f = latent_shapes(c.fine)[0]
        tiles = (c.Hp // c.fine.H) * (c.Wp // c.fine.W)
        return [r, (f[0], f[1], f[2] * tiles)]

    def _pad(self, x):
        p = self.cfg.pad
        if p == (0, 0):
            return x
        return jnp.pad(x, ((0, 0), (0, p[0]), (0, p[1]), (0, 0)), mode="edge")

    def pool(self, x):
        return jnp.einsum(
            "bhwc,Hh,Ww->bHWc", x, self._pool_h, self._pool_w
        )

    def unpool(self, rx):
        return jnp.einsum("bhwc,Hh,Ww->bHWc", rx, self._up_h, self._up_w)

    def split_levels(self, x):
        """-> (rough image rx, fine patch batch px)."""
        c = self.cfg
        x = self._pad(x)
        rx = round_to_grid(self.pool(x), c.nbits)
        fx = x - self.unpool(rx)
        px = patch_split(fx, c.fine.H, c.fine.W)
        return rx, px

    def __call__(self, x):
        """-> ((rlatents, rmeans, rlogscales), (flatents, fmeans, flogscales))
        with the fine flow rematerialized to bound memory."""
        rx, px = self.split_levels(x)
        rough_out = self.rough(rx)
        fine_out = self.fine(px)
        return rough_out, fine_out

    def sample_from_noise(self, noises):
        """noises = [rough noise [B,rh,rw,zc], fine noise with tiles folded
        into channels] (reference: flows.py:247-270)."""
        c = self.cfg
        bs = noises[0].shape[0]
        rx = self.rough.sample_from_noise([noises[0]])
        fshape = latent_shapes(c.fine)[0]
        fl = noises[1].reshape(-1, fshape[0], fshape[1], fshape[2])
        fx = self.fine.sample_from_noise([fl])
        fx = patch_merge(fx, c.Hp, c.Wp)
        x = self.unpool(rx) + fx
        return x[:, : c.Hp - c.pad[0], : c.Wp - c.pad[1], :]


def twolevel_bpd(cfg: TwoLevelCfg, bpd_rough: float, bpd_fine: float):
    """Combined bpd (reference formula: flows.py:241)."""
    return (
        bpd_rough * cfg.rough.H * cfg.rough.W
        + bpd_fine * cfg.Hp * cfg.Wp
    ) / (cfg.Hp - cfg.pad[0]) / (cfg.Wp - cfg.pad[1])
