"""Invertible flow components (flax.linen, NHWC).

- Channel permutations: the reference draws an UNSEEDED random permutation at
  construction and persists 0/1 matrices in the checkpoint
  (reference: invertible.py:24-48).  TPU-native redesign: permutations are
  derived deterministically from (perm_seed, level, step) and applied as a
  channel gather (`jnp.take` on the lane axis) -- no parameters, no matmul,
  exact inverse by argsort, reproducible without checkpoint state.
- AdditiveCoupling (reference: couplelib.py:24-61): za = xa,
  zb = xb + round(t(xa)).  Because inputs and the rounded t both live on the
  2^-nbits grid and float32 represents grid sums exactly (24-bit mantissa,
  8 fractional bits), forward/inverse are bit-exact inverses.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.rounding import round_ste
from .config import CouplingCfg, DenseBlockCfg
from .layers import DenseBlock


def permutation(seed: int, level: int, step: int, dim: int) -> np.ndarray:
    """Deterministic channel permutation for flow step `step` of `level`."""
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, level, step, dim])
    )
    return rng.permutation(dim).astype(np.int32)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    return np.argsort(perm).astype(np.int32)


def coupling_split(channel: int, split: float) -> Tuple[int, int]:
    """[a_ch, b_ch] split (reference: couplelib.py:38)."""
    a = int(channel * split)
    return a, channel - a


class AdditiveCoupling(nn.Module):
    """za = xa, zb = xb + round_ste(NN(xa)); exactly invertible on the grid."""

    channel: int
    cfg: CouplingCfg

    def setup(self):
        a_ch, b_ch = coupling_split(self.channel, self.cfg.split)
        self.a_ch = a_ch
        self.dense = DenseBlock(b_ch, self.cfg.nn, name="dense")

    def t(self, xa):
        """The rounded coupling shift; the ONLY part that must be evaluated
        by a shared compiled function for encode/decode bit-exactness."""
        return round_ste(self.dense(xa), self.cfg.nbits)

    def __call__(self, x):
        xa, xb = x[..., : self.a_ch], x[..., self.a_ch :]
        return jnp.concatenate([xa, xb + self.t(xa)], axis=-1)

    def inverse(self, z):
        za, zb = z[..., : self.a_ch], z[..., self.a_ch :]
        return jnp.concatenate([za, zb - self.t(za)], axis=-1)


class Prior(nn.Module):
    """NN head mapping prepared conditioning -> (mean, logscale) for the
    factored-out channels (reference: priorlib.py:18-47).  The caller
    prepares the input (keep half, zeros at the last level, optional
    concatenated conditioning) to mirror flows.py:104-115,315-326.

    `logscale_min` floors the predicted logscale: without it the scale
    collapses toward 0 once latents are well-predicted and the discretized
    log-likelihood's gradients explode to NaN (the reference has no guard
    and can diverge the same way).  -6.24 keeps scale well above the 1/256
    grid so the floor is loss-neutral in practice."""

    out_ch: int
    cfg: DenseBlockCfg
    logscale_min: float = -6.24

    @nn.compact
    def __call__(self, h):
        p = DenseBlock(2 * self.out_ch, self.cfg, name="net")(h)
        mean = p[..., : self.out_ch]
        logscale = jnp.maximum(p[..., self.out_ch :], self.logscale_min)
        return mean, logscale
