"""High-level latent coder: (latents, means, logscales) <-> bytes.

TPU-native equivalent of the reference's multi-split drivers
(reference: coder.py:18-38 Encode/Decode): each split level is one
interleaved-rANS container; symbols are the integer grid bins
v = round(latent * 256).  Unlike the reference -- which flattens tensors to
Python lists and feeds a serial C coder -- tensors stay on device; only the
packed byte containers cross to the host.

The per-level split (instead of one fused container) is what a *real*
decoder requires: level l's means/logscales depend on latents of levels
decoded after it (reference never implemented this; flows.py:177-181 stubs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from .container import pack_streams, unpack_streams
from .interleaved import interleaved_decode, interleaved_encode


def encode_tensor(latent, mean, logscale, num_streams: int = 1024) -> bytes:
    """Encode one latent tensor (values on the 1/256 grid) to bytes."""
    v = jnp.round(jnp.asarray(latent, jnp.float32) * 256.0).astype(jnp.int32)
    scale = jnp.exp(jnp.asarray(logscale, jnp.float32))
    enc = interleaved_encode(
        v.reshape(-1), jnp.asarray(mean, jnp.float32).reshape(-1),
        scale.reshape(-1), num_streams
    )
    return pack_streams(enc)


def decode_tensor(blob: bytes, mean, logscale):
    """Decode one latent tensor; returns float32 grid values, mean's shape.

    Raises ValueError if any stream fails to return to the initial state
    (the reference's decode-invariant check, trainer.py:326)."""
    mean = jnp.asarray(mean, jnp.float32)
    scale = jnp.exp(jnp.asarray(logscale, jnp.float32))
    enc = unpack_streams(blob)
    vals, hi, lo = interleaved_decode(enc, mean.reshape(-1), scale.reshape(-1))
    if not (bool((hi == 1).all()) and bool((lo == 0).all())):
        raise ValueError("rANS decode failed: state did not return to 2^32")
    return (vals.astype(jnp.float32) / 256.0).reshape(mean.shape)


def encode_latents(
    latents: Sequence, means: Sequence, logscales: Sequence,
    num_streams: int = 1024,
) -> List[bytes]:
    """Encode per-split latents (reference: coder.py:18-27)."""
    return [
        encode_tensor(z, m, ls, num_streams)
        for z, m, ls in zip(latents, means, logscales)
    ]


def decode_latents(blobs: Sequence[bytes], means: Sequence, logscales: Sequence):
    """Decode per-split latents given regenerated means/logscales."""
    return [
        decode_tensor(b, m, ls) for b, m, ls in zip(blobs, means, logscales)
    ]


def coded_bits(blobs: Sequence[bytes]) -> int:
    return sum(8 * len(b) for b in blobs)


def real_bpd(blobs: Sequence[bytes], num_pixels: int) -> float:
    """Coded bits per (pixel-channel) dim, including all container overhead
    (reference analogue: trainer.py:326-327)."""
    return coded_bits(blobs) / float(num_pixels)
