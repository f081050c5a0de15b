"""Bitstream container: serialize interleaved-rANS streams to bytes.

Overhead design: a naive S-stream flush would write S 64-bit states.  Here
the final states of streams 1..S-1 are entropy-coded into stream 0 as
uniform 16-bit symbols -- a uniform symbol at 16-bit precision is coded by
pure shifts (freq = 1 slot out of 2^16, cdf = value) at exactly 16 bits of
code, zero redundancy.  The container then stores only stream 0's final
64-bit state, so total flush overhead matches the reference's 64-bits-per-
coded-tensor accounting (reference: trainer.py:327: 64*nsplit + 32*words).

Layout (little-endian):
    magic  b"LIC1"        4 bytes
    n      symbols        8 bytes
    S      streams        4 bytes
    state0                8 bytes
    W      word count     4 bytes
    words  W * 4 bytes    (global (t, s) emission order + chain words)
"""

from __future__ import annotations

import struct
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interleaved import EncodedStreams, _plan_steps

MAGIC = b"LIC1"
_HEADER = struct.Struct("<4sQIQI")
RANS_L = 1 << 32


def _uniform16_push(state: int, words: list, chunk: int) -> int:
    if state >= (1 << 48):
        words.append(state & 0xFFFFFFFF)
        state >>= 32
    return ((state << 16) | chunk) & ((1 << 64) - 1)


def _uniform16_pop(state: int, words: list) -> Tuple[int, int]:
    if state < RANS_L:
        state = (state << 32) | words.pop()
    return state >> 16, state & 0xFFFF


def pack_streams(enc: EncodedStreams) -> bytes:
    """Serialize device-side encoded streams to a self-contained byte string."""
    S = enc.num_streams
    hi = np.asarray(jax.device_get(enc.state_hi), np.uint64)
    lo = np.asarray(jax.device_get(enc.state_lo), np.uint64)
    states = [(int(hi[j]) << 32) | int(lo[j]) for j in range(S)]
    words = list(
        np.asarray(jax.device_get(enc.words)[: enc.num_words], np.uint32)
    )
    words = [int(w) for w in words]

    state0 = states[0]
    for j in range(1, S):
        sj = states[j]
        for shift in (0, 16, 32, 48):  # LSB chunk first
            state0 = _uniform16_push(state0, words, (sj >> shift) & 0xFFFF)

    out = bytearray(_HEADER.pack(MAGIC, enc.n, S, state0, len(words)))
    out += np.asarray(words, dtype="<u4").tobytes()
    return bytes(out)


def unpack_streams(blob: bytes) -> EncodedStreams:
    """Parse a container back into device-side streams ready for decode."""
    magic, n, S, state0, W = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("bad container magic")
    words = np.frombuffer(blob, dtype="<u4", offset=_HEADER.size, count=W)
    words = [int(w) for w in words]

    states = [0] * S
    for j in range(S - 1, 0, -1):
        sj = 0
        for shift in (48, 32, 16, 0):  # MSB chunk pops first
            state0, chunk = _uniform16_pop(state0, words)
            sj |= chunk << shift
        states[j] = sj
    states[0] = state0

    k = _plan_steps(n, S)
    cap = k * S
    buf = np.zeros(cap, np.uint32)
    buf[: len(words)] = np.asarray(words, np.uint32)
    hi = np.asarray([s >> 32 for s in states], np.uint32)
    lo = np.asarray([s & 0xFFFFFFFF for s in states], np.uint32)
    return EncodedStreams(
        words=jnp.asarray(buf),
        num_words=len(words),
        state_hi=jnp.asarray(hi),
        state_lo=jnp.asarray(lo),
        n=n,
        num_streams=S,
    )


def stream_bits(blob: bytes) -> int:
    return 8 * len(blob)
