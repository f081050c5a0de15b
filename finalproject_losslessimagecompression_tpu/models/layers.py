"""NN building blocks (flax.linen, NHWC).

TPU-native re-designs of the reference primitives:
- DenseLayer / DenseBlock (reference: nnlayer.py:23-51, nnblock.py:25-56):
  1x1 conv -> 3x3 conv -> act with DenseNet concatenation growth; the
  block's final 1x1 conv is ZERO-INITIALIZED (nnblock.py:50-51) so couplings
  and priors start as identity/zero -- load-bearing for integer flows.
- ResBlock (reference: nnblock.py:60-84) for the VQ-VAE encoder/decoder.

NHWC keeps channels in the TPU's 128-lane dimension; convolutions hit the
MXU directly, and XLA fuses the pointwise activations into the conv
epilogues.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..registry import ACTIVATIONS
from .config import DenseBlockCfg


def activation(name: str):
    if name == "ReLU":
        return nn.relu
    if name == "Tanh":
        return jnp.tanh
    if name == "LeakyReLU":
        return nn.leaky_relu  # default negative_slope 0.01, same as torch
    if name in ACTIVATIONS:
        return ACTIVATIONS.get(name)
    raise KeyError(f"unknown activation {name!r}")


class DenseLayer(nn.Module):
    """x -> concat(x, act(conv3x3(conv1x1(x)))) growing by `growth` channels."""

    growth: int
    act: str = "ReLU"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        h = nn.Conv(x.shape[-1], (1, 1), dtype=dt, name="conv1")(x)
        h = nn.Conv(self.growth, (3, 3), padding="SAME", dtype=dt,
                    name="conv3")(h)
        h = activation(self.act)(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    """depth DenseLayers growing in_ch -> in_ch + growth_channel, then a
    zero-initialized 1x1 projection to `out_features`.

    Per-layer growth follows the reference's integer split
    (nnblock.py:44): growth_i = (i+1)*g//d - i*g//d.

    With cfg.dtype="bfloat16" the whole conv stack computes in bfloat16
    (MXU-native; params stay float32, MXU accumulation is float32) and the
    block's output is cast back to float32, so downstream grid arithmetic
    (round_ste, coupling adds) keeps its exactness guarantees.
    """

    out_features: int
    cfg: DenseBlockCfg

    @nn.compact
    def __call__(self, x):
        g, d = self.cfg.growth_channel, self.cfg.depth
        dt = jnp.dtype(self.cfg.dtype)
        x = x.astype(dt)
        for i in range(d):
            growth = (i + 1) * g // d - i * g // d
            x = DenseLayer(growth, self.cfg.act, self.cfg.dtype,
                           name=f"layer{i}")(x)
        out = nn.Conv(
            self.out_features,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=dt,
            name="proj",
        )(x)
        return out.astype(jnp.float32)


class ResBlock(nn.Module):
    """3x3 -> ReLU -> 3x3 residual block with post-add ReLU; optional
    BatchNorm (reference: nnblock.py:60-84)."""

    channel: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.channel, (3, 3), padding="SAME", name="conv_a")(x)
        h = nn.relu(h)
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn_a")(h)
        h = nn.Conv(self.channel, (3, 3), padding="SAME", name="conv_b")(h)
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train, name="bn_b")(h)
        return nn.relu(x + h)
