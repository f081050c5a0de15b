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
from jax import lax

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
    """x -> concat(x, act(conv3x3(conv1x1(x)))) growing by `growth` channels.

    fuse=True (default) computes the SAME function as one 3x3 conv: there
    is no nonlinearity between the 1x1 and the 3x3 (reference:
    nnlayer.py:44-50), so conv3(W3, conv1(W1, x) + b1) folds exactly into
    conv(x, W1 @ W3) + T + b3, where T is the position-dependent bias field
    that accounts for the zero padding (border taps never see b1).  The
    weight contraction is O(9 C^2 g) -- no H*W factor -- while the fold
    removes the 1x1's O(C^2 HW) MACs AND the materialization of the
    C-channel intermediate, the DenseBlock's main HBM traffic.  The fused
    form differs from the two-conv form only in float rounding; codec
    bit-exactness is unaffected because both compress and decompress run
    the same executable (models/exact.py contract).
    """

    growth: int
    act: str = "ReLU"
    dtype: str = "float32"
    fuse: bool = True

    @nn.compact
    def __call__(self, x):
        dt = jnp.dtype(self.dtype)
        if not self.fuse:
            h = nn.Conv(x.shape[-1], (1, 1), dtype=dt, name="conv1")(x)
            h = nn.Conv(self.growth, (3, 3), padding="SAME", dtype=dt,
                        name="conv3")(h)
            h = activation(self.act)(h)
            return jnp.concatenate([x, h], axis=-1)

        C, g = x.shape[-1], self.growth
        H, W = x.shape[1], x.shape[2]
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        w1 = self.param("conv1_kernel", init, (1, 1, C, C), jnp.float32)
        b1 = self.param("conv1_bias", zeros, (C,), jnp.float32)
        w3 = self.param("conv3_kernel", init, (3, 3, C, g), jnp.float32)
        b3 = self.param("conv3_bias", zeros, (g,), jnp.float32)
        # weight-space composition (f32 for precision; tiny vs the conv)
        w_eff = jnp.einsum("ic,klcg->klig", w1[0, 0], w3).astype(dt)
        # boundary bias field: T[i,j,g] = sum over the taps (k,l) whose
        # input position is in-bounds of (W3[k,l] . b1) -- separable into
        # row/col validity masks, two small matmuls, no HW*C work
        A = jnp.einsum("klcg,c->klg", w3, b1)
        ri = jnp.arange(H)[None, :] + jnp.arange(3)[:, None] - 1
        mk = ((ri >= 0) & (ri < H)).astype(jnp.float32)  # [3, H]
        cj = jnp.arange(W)[None, :] + jnp.arange(3)[:, None] - 1
        ml = ((cj >= 0) & (cj < W)).astype(jnp.float32)  # [3, W]
        T = jnp.einsum("ki,lj,klg->ijg", mk, ml, A) + b3
        y = lax.conv_general_dilated(
            x.astype(dt), w_eff, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = activation(self.act)(y + T.astype(dt))
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
            if self.cfg.growth_multiple:
                # opt-in non-parity: full-lane 3x3 convs (see config)
                m = self.cfg.growth_multiple
                growth = -(-growth // m) * m
            x = DenseLayer(growth, self.cfg.act, self.cfg.dtype,
                           self.cfg.fuse_1x1, name=f"layer{i}")(x)
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
