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


def pad_growth_params(params, multiple: int):
    """Zero-pad every DenseBlock's growth channels in a trained params
    tree so it loads into the `growth_multiple=multiple` architecture --
    the function-preserving throughput attack on the PARITY family
    (VERDICT r4 item 3): the reference growth split (nnblock.py:44,
    ~43 output lanes per 3x3 conv at flagship scale) starves the MXU's
    128-lane tiles; padding each layer's growth to full lanes turns the
    convs into full-lane matmuls while computing the SAME function.

    Why it is function-preserving: padded conv3 output channels have zero
    weight and bias, so they emit exactly 0.0; act(0) = 0 for ReLU/
    LeakyReLU/Tanh; every downstream weight READING a padded channel is
    zero, contributing exactly 0.0 to its reduction.  (XLA may still
    re-tile the larger reductions, so ULP-level reassociation of the real
    terms is possible -- irrelevant to coding, whose contract is
    shared-executable determinism, models/exact.py; the padded variant is
    a distinct compute variant and fingerprints as such, cli/codec.py.)

    Handles both DenseLayer param layouts (fused conv1_*/conv3_* names
    and unfused flax conv1/conv3 submodules).  Returns a plain-dict tree
    shaped for `FlowCfg` with `growth_multiple=multiple` on every
    DenseBlock (models/config.py:with_growth_multiple).
    """
    import numpy as np

    def pad_block(block):
        layers = sorted(
            (k for k in block if k.startswith("layer")),
            key=lambda s: int(s[5:]),
        )
        first = block[layers[0]]
        fused = "conv1_kernel" in first
        w1_0 = (first["conv1_kernel"] if fused
                else first["conv1"]["kernel"])
        C0 = w1_0.shape[-1]
        # positions of the ORIGINAL stream channels inside the padded
        # concat stream (padding appends per-layer, so old channels stop
        # being contiguous after the second layer)
        old_idx = np.arange(C0)
        width = C0
        out = {}
        for name in layers:
            lp = block[name]
            if fused:
                w1 = np.asarray(lp["conv1_kernel"])
                b1 = np.asarray(lp["conv1_bias"])
                w3 = np.asarray(lp["conv3_kernel"])
                b3 = np.asarray(lp["conv3_bias"])
            else:
                w1 = np.asarray(lp["conv1"]["kernel"])
                b1 = np.asarray(lp["conv1"]["bias"])
                w3 = np.asarray(lp["conv3"]["kernel"])
                b3 = np.asarray(lp["conv3"]["bias"])
            assert w1.shape[-1] == len(old_idx), (
                w1.shape, len(old_idx))
            g = w3.shape[-1]
            gp = -(-g // multiple) * multiple
            w1p = np.zeros((1, 1, width, width), w1.dtype)
            w1p[0, 0][np.ix_(old_idx, old_idx)] = w1[0, 0]
            b1p = np.zeros((width,), b1.dtype)
            b1p[old_idx] = b1
            w3p = np.zeros(w3.shape[:2] + (width, gp), w3.dtype)
            w3p[:, :, old_idx, :g] = w3
            b3p = np.zeros((gp,), b3.dtype)
            b3p[:g] = b3
            if fused:
                out[name] = {
                    "conv1_kernel": w1p, "conv1_bias": b1p,
                    "conv3_kernel": w3p, "conv3_bias": b3p,
                }
            else:
                out[name] = {
                    "conv1": {"kernel": w1p, "bias": b1p},
                    "conv3": {"kernel": w3p, "bias": b3p},
                }
            old_idx = np.concatenate([old_idx, width + np.arange(g)])
            width += gp
        k = np.asarray(block["proj"]["kernel"])
        kp = np.zeros(k.shape[:2] + (width, k.shape[-1]), k.dtype)
        kp[:, :, old_idx, :] = k
        out["proj"] = {
            "kernel": kp, "bias": np.asarray(block["proj"]["bias"])
        }
        return out

    def walk(node):
        if hasattr(node, "items"):
            node = dict(node)
            if "proj" in node and "layer0" in node:
                return pad_block(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


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
