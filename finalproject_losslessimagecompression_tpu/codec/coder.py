"""High-level latent coder: (latents, means, logscales) <-> bytes.

TPU-native equivalent of the reference's multi-split drivers
(reference: coder.py:18-38 Encode/Decode): each split level is one
interleaved-rANS container; symbols are the integer grid bins
v = round(latent * 256).  Unlike the reference -- which flattens tensors to
Python lists and feeds a serial C coder -- tensors stay on device; only the
packed byte containers cross to the host.

Dispatch discipline: under remote-tunnel runtimes every eager op is a host
round trip, so each direction is a fixed small number of jit calls plus one
scalar sync -- all array math lives inside jitted functions.

The per-level split (instead of one fused container) is what a *real*
decoder requires: level l's means/logscales depend on latents of levels
decoded after it (reference never implemented this; flows.py:177-181 stubs).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .container import pack_streams, unpack_streams
from .interleaved import interleaved_decode, interleaved_encode


@jax.jit
def _prep_symbols(latent, logscale):
    v = jnp.round(jnp.asarray(latent, jnp.float32) * 256.0).astype(jnp.int32)
    return v.reshape(-1), jnp.exp(
        jnp.asarray(logscale, jnp.float32)
    ).reshape(-1)


@jax.jit
def _prep_scale(logscale):
    return jnp.exp(jnp.asarray(logscale, jnp.float32)).reshape(-1)


@jax.jit
def _finish_decode(vals, hi, lo, shaped_like, tail_start):
    # A successful decode returns each stream to its initial encode state
    # 2^32 | seed: hi == 1 always, and lo == 0 for every stream whose seed
    # was zero -- i.e. all streams past `tail_start` (the donor's donated
    # count; 0 for unseeded containers, checking every stream).  Seeded
    # streams' lo limbs ARE the donor's recovered words, so they are data,
    # not checkable here; the chain terminates at level 0's full check.
    idx = jnp.arange(lo.shape[0], dtype=jnp.int32)
    ok = jnp.logical_and(
        jnp.all(hi == jnp.uint32(1)),
        jnp.all(jnp.logical_or(idx < tail_start, lo == jnp.uint32(0))),
    )
    x = (vals.astype(jnp.float32) / 256.0).reshape(shaped_like.shape)
    return x, ok


def encode_tensor_deferred(latent, mean, logscale, num_streams: int = 8192,
                           seeds=None, sym_per_stream: int = 64):
    """Dispatch an encode without any host sync; pack later with
    container.pack_streams_many to amortize the sync."""
    v, scale = _prep_symbols(latent, logscale)
    return interleaved_encode(v, mean, scale, num_streams, seeds,
                              sym_per_stream)


def encode_tensor(latent, mean, logscale, num_streams: int = 8192) -> bytes:
    """Encode one latent tensor (values on the 1/256 grid) to bytes."""
    return pack_streams(
        encode_tensor_deferred(latent, mean, logscale, num_streams)
    )


def decode_streams_deferred(enc, mean, logscale, fill=None, tail_start=0):
    """Decode unpacked streams without a host sync.

    Returns (x, ok, lo): decoded grid values, the state-invariant flag, and
    the final lo limbs ([S] uint32).  For bits-back chains (FlowCodec) the
    lo limbs of a seeded decode are the donor container's omitted words:
    pass them as the donor's `fill`, and pass the donor's donated count as
    this decode's `tail_start` so verification skips the seeded prefix."""
    if enc.n != np.size(mean):
        raise ValueError(
            f"container symbol count {enc.n} does not match the "
            f"parameter tensor size {np.size(mean)}"
        )
    scale = _prep_scale(logscale)
    vals, hi, lo = interleaved_decode(enc, mean, scale, fill)
    if enc.oow_count:
        # patch escaped out-of-window symbols with their true values
        # (rare path; see interleaved.EncodedStreams)
        vals = vals.at[jnp.asarray(enc.oow_idx, jnp.int32)].set(
            jnp.asarray(enc.oow_vals, jnp.int32)
        )
    x, ok = _finish_decode(vals, hi, lo, mean, np.int32(tail_start))
    return x, ok, lo


def decode_tensor_deferred(blob: bytes, mean, logscale):
    """Decode without a host sync: returns (x, ok) device values; the
    caller aggregates `ok` flags and checks once."""
    x, ok, _ = decode_streams_deferred(unpack_streams(blob), mean, logscale)
    return x, ok


def decode_tensor(blob: bytes, mean, logscale):
    """Decode one latent tensor; returns float32 grid values, mean's shape.

    Raises ValueError if any stream fails to return to the initial state
    (the reference's decode-invariant check, trainer.py:326)."""
    x, ok = decode_tensor_deferred(blob, mean, logscale)
    if not bool(jax.device_get(ok)):
        raise ValueError("rANS decode failed: state did not return to 2^32")
    return x


def encode_latents(
    latents: Sequence, means: Sequence, logscales: Sequence,
    num_streams: int = 8192,
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
