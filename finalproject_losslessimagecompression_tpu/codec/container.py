"""Bitstream container: serialize interleaved-rANS streams to bytes.

Overhead design: a naive S-stream flush would write S 64-bit states.  Here
the final states of streams 1..S-1 are entropy-coded into stream 0 as
uniform 16-bit symbols -- a uniform symbol at 16-bit precision is coded by
pure shifts (freq = 1 slot out of 2^16, cdf = value) at exactly 16 bits of
code, zero redundancy.  The container then stores only stream 0's final
64-bit state, so total flush overhead matches the reference's 64-bits-per-
coded-tensor accounting (reference: trainer.py:327: 64*nsplit + 32*words).

Layout (little-endian):
    magic  b"LIC2"        4 bytes
    n      symbols        8 bytes
    S      streams        4 bytes
    state0                8 bytes
    W      word count     4 bytes  (ORIGINAL count, including donated)
    D      donated count  4 bytes  (bits-back: the first D words are NOT
                                    stored; the decoder recovers them from
                                    the final states of streams they seeded
                                    -- see FlowCodec)
    words  (W - min(D, W)) * 4 bytes   (positions D..W-1 of the global
                                        (t, s) emission order + chain words)
    oow_count             4 bytes
    oow_idx, oow_vals     8 * oow_count bytes (raw out-of-window escapes)
    oow_crc32             4 bytes, present iff oow_count > 0 (the escape
                          block is outside the rANS state invariant, so it
                          carries its own checksum)
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Tuple

import jax
import numpy as np

from .cdf import NBINS, PRECISION
from .interleaved import EncodedStreams, _plan_steps

MAGIC = b"LIC2"
_HEADER = struct.Struct("<4sQIQII")
RANS_L = 1 << 32

# The cheapest codable symbol: all other 2047 bins keep their +1 frequency
# floor, so fmax = M - (NBINS - 1) and the per-symbol cost floor is
# -log2(fmax / M) ~ 1.76e-4 bits.  Used to bound a container's plausible
# symbol count by its payload's information capacity.
_MIN_SYMBOL_BITS = -math.log2(float(PRECISION - (NBINS - 1)) / PRECISION)


def _uniform_push(state: int, words: list, chunk: int, bits: int) -> int:
    """Push `bits` uniform bits (zero-redundancy rANS op: shift-or)."""
    if state >= (1 << (64 - bits)):
        words.append(state & 0xFFFFFFFF)
        state >>= 32
    return ((state << bits) | chunk) & ((1 << 64) - 1)


def _uniform_pop(state: int, words: list, bits: int) -> Tuple[int, int]:
    if state < RANS_L:
        state = (state << 32) | words.pop()
    return state >> bits, state & ((1 << bits) - 1)


# below this many total buffer bytes, a single fetch beats the two-phase
# fetch (the second round trip costs more than the over-transfer saves)
_TWO_PHASE_BYTES = 1 << 20


def pack_streams_many(encs) -> list:
    """Serialize several encodes with minimal host transfers.

    Small queues: ONE device fetch for everything, of an OPTIMISTIC
    PREFIX of each word buffer (12 bits/symbol of payload + chain slack)
    instead of the full worst-case capacity (32 bits/symbol) -- but only
    when the transfer saved exceeds the cost of the slice dispatch (see
    _prefix).  Anything below 12 bpd still packs in one round trip (the
    worst realistic case -- an UNTRAINED prior on uniform noise -- codes
    ~10.2-10.9 bits/symbol, BENCH_r03 real_bpd; only adversarial content
    beyond that pays a second fetch for the tail).  Large queues: a
    scalar fetch for (states, num_words) first, then one fetch of only
    the USED prefix of each word buffer -- the second round trip
    amortizes over the queue."""
    total_cap = sum(int(np.prod(np.shape(e.words))) * 4 for e in encs)
    if total_cap <= _TWO_PHASE_BYTES:
        def _prefix(e):
            cap = int(np.prod(np.shape(e.words)))
            bound = min(
                cap, -(-int(e.n) * 12 // 32) + 5 * e.num_streams + 8
            )
            # the slice is an extra device op (an eager dispatch, ~ms,
            # plus a one-time per-shape compile); at the measured ~100
            # MB/s tunnel bandwidth it only pays for itself when it
            # saves >~256 KB of transfer -- below that, fetch the full
            # buffer with zero added dispatches (single-image latency:
            # 3 containers x ~13 KB saved is NOT worth 3 dispatches)
            if (cap - bound) * 4 < (1 << 18):
                return e.words
            return e.words[:bound]

        opt = jax.device_get(
            [(e.state_hi, e.state_lo, _prefix(e), e.num_words,
              e.oow_count)
             for e in encs]
        )
        fetched = []
        for e, (hi, lo, words, nw, oc) in zip(encs, opt):
            nw = int(nw)
            if nw > words.shape[0]:
                # rare: the message coded past the optimistic bound
                tail = np.asarray(
                    jax.device_get(e.words[words.shape[0] : nw])
                )
                words = np.concatenate([np.asarray(words), tail])
            fetched.append((hi, lo, words, nw, int(oc)))
    else:
        metas = jax.device_get(
            [(e.state_hi, e.state_lo, e.num_words, e.oow_count)
             for e in encs]
        )
        payloads = jax.device_get(
            [e.words[: int(nw)] for e, (_, _, nw, _) in zip(encs, metas)]
        )
        fetched = [
            (hi, lo, words, int(nw), int(oc))
            for (hi, lo, nw, oc), words in zip(metas, payloads)
        ]
    out = []
    for e, (hi, lo, words, nw, oc) in zip(encs, fetched):
        oow = b""
        if oc:
            # rare path: one extra fetch for the escape side-channel
            mask, orig = jax.device_get((e.oow_mask, e.orig_values))
            idx = np.nonzero(np.asarray(mask))[0]
            vals = np.asarray(orig)[idx]
            oow = (
                np.asarray(idx, "<u4").tobytes()
                + np.asarray(vals, "<i4").tobytes()
            )
        out.append(_pack_fetched(e, hi, lo, words, nw, oc, oow))
    return out


def pack_streams(enc: EncodedStreams) -> bytes:
    """Serialize device-side encoded streams to a self-contained byte string."""
    return pack_streams_many([enc])[0]


def _pack_fetched(
    enc, hi_a, lo_a, words_a, num_words: int, oow_count: int = 0,
    oow_blob: bytes = b"",
) -> bytes:
    S = enc.num_streams
    hi = np.asarray(hi_a, np.uint64)
    lo = np.asarray(lo_a, np.uint64)

    # Variable-length state chaining: each final state is in [2^32, 2^64),
    # so its bit length nb is in [33, 64], and its top bit is 1 by
    # definition.  The chain stores a 5-bit (nb - 33) header plus the low
    # nb - 1 bits (leading 1 implicit): exactly nb + 4 bits per stream.
    # Flush waste per stream is therefore the ~4-5 chain bits plus however
    # far the state sits above its information content -- this is what
    # makes wide stream counts (high VPU occupancy) affordable, and what
    # bits-back seeding (interleaved.make_seeds) reduces further.
    #
    # The chain is a serial ~5S-step loop; the C++ port (bit-identical)
    # packs ~1000x faster than the Python fallback below, which matters:
    # at S=4096 the Python loop costs more than the whole device encode.
    from .. import native

    # donated words must be a prefix of the SYMBOL payload (never the
    # chain words appended after it), so clamp to num_words before pack
    donated = min(int(getattr(enc, "donated", 0) or 0), num_words)
    if native.available():
        states = (hi << np.uint64(32)) | lo
        buf = np.empty(num_words + 5 * S + 8, np.uint32)
        buf[:num_words] = np.asarray(words_a[:num_words], np.uint32)
        state0, nw = native.chain_pack(states, buf, num_words)
        out = bytearray(_HEADER.pack(MAGIC, enc.n, S, state0, nw, donated))
        out += buf[donated:nw].tobytes()
        out += struct.pack("<I", oow_count)
        out += oow_blob
        if oow_count:
            # the out-of-window side channel is raw (not covered by the
            # rANS state invariant); a CRC gives it the same corruption-
            # detection guarantee as the coded payload
            out += struct.pack("<I", zlib.crc32(oow_blob))
        return bytes(out)

    states = [(int(hi[j]) << 32) | int(lo[j]) for j in range(S)]
    words = [int(w) for w in np.asarray(words_a[:num_words], np.uint32)]
    state0 = states[0]
    for j in range(1, S):
        sj = states[j]
        nb = sj.bit_length()  # in [33, 64]
        top = nb - 33  # bits above the low 32, minus the implicit lead 1
        state0 = _uniform_push(state0, words, sj & 0xFFFF, 16)
        state0 = _uniform_push(state0, words, (sj >> 16) & 0xFFFF, 16)
        if top > 0:
            state0 = _uniform_push(
                state0, words, (sj >> 32) & ((1 << top) - 1), top
            )
        state0 = _uniform_push(state0, words, nb - 33, 5)

    nw = len(words)
    out = bytearray(_HEADER.pack(MAGIC, enc.n, S, state0, nw, donated))
    out += np.asarray(words[donated:], dtype="<u4").tobytes()
    out += struct.pack("<I", oow_count)
    out += oow_blob
    if oow_count:
        out += struct.pack("<I", zlib.crc32(oow_blob))
    return bytes(out)


def unpack_streams(blob: bytes) -> EncodedStreams:
    """Parse a container back into device-side streams ready for decode.

    Every header field is validated against the blob's actual size before
    any allocation, so corrupted/truncated containers raise ValueError
    instead of crashing (or allocating) inside the decoder."""
    if len(blob) < _HEADER.size + 4:
        raise ValueError("corrupt container: truncated header")
    magic, n, S, state0, W, D = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("bad container magic")
    avail_words = (len(blob) - _HEADER.size - 4) // 4
    present = W - min(D, W)
    if present > avail_words:
        raise ValueError("corrupt container: word count exceeds payload")
    if not (1 <= S <= max(8, n)):
        raise ValueError("corrupt container: implausible stream count")
    # n bounds the decode-side allocation (k*S >= n words); reject symbol
    # counts beyond the payload's information capacity so a corrupted n
    # cannot trigger a giant allocation.  The bound is the true per-symbol
    # cost floor (_MIN_SYMBOL_BITS), not a fixed bits/symbol heuristic:
    # legitimately low-entropy containers stay accepted.  The +64-byte
    # slack covers header/state bits already inside the blob.
    if float(n) * _MIN_SYMBOL_BITS > 8.0 * (len(blob) + 64):
        raise ValueError("corrupt container: implausible symbol count")
    payload = np.frombuffer(
        blob, dtype="<u4", offset=_HEADER.size, count=present
    )
    # bits-back hole: the first min(D, W) words were donated as stream
    # seeds elsewhere; the caller (FlowCodec) fills them back in before
    # decoding this container
    words_np = np.zeros(W, np.uint32)
    words_np[W - present:] = payload
    off = _HEADER.size + 4 * present
    (oow_count,) = struct.unpack_from("<I", blob, off)
    off += 4
    oow_idx = oow_vals = None
    if oow_count:
        if off + 8 * oow_count + 4 > len(blob):
            raise ValueError("corrupt container: outlier block truncated")
        oow_idx = np.frombuffer(blob, "<u4", offset=off, count=oow_count)
        off += 4 * oow_count
        oow_vals = np.frombuffer(blob, "<i4", offset=off, count=oow_count)
        (crc,) = struct.unpack_from("<I", blob, off + 4 * oow_count)
        if crc != zlib.crc32(blob[off - 4 * oow_count : off + 4 * oow_count]):
            raise ValueError("corrupt container: outlier block checksum")

    from .. import native

    if native.available():
        states_arr, npay = native.chain_unpack(S, state0, words_np, W)
        hi = (states_arr >> np.uint64(32)).astype(np.uint32)
        lo = (states_arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        payload = words_np[:npay]
    else:
        words = [int(w) for w in words_np]
        states = [0] * S
        try:
            for j in range(S - 1, 0, -1):
                state0, nb33 = _uniform_pop(state0, words, 5)
                nb = nb33 + 33
                top_bits = nb - 33
                top = 0
                if top_bits > 0:
                    state0, top = _uniform_pop(state0, words, top_bits)
                state0, c1 = _uniform_pop(state0, words, 16)
                state0, c0 = _uniform_pop(state0, words, 16)
                states[j] = (
                    (1 << (nb - 1)) | (top << 32) | (c1 << 16) | c0
                )
        except IndexError:
            raise ValueError(
                "corrupt container: state chain underflow"
            ) from None
        states[0] = state0
        hi = np.asarray([s >> 32 for s in states], np.uint32)
        lo = np.asarray([s & 0xFFFFFFFF for s in states], np.uint32)
        npay = len(words)
        payload = np.asarray(words, np.uint32)

    k = _plan_steps(n, S)
    cap = k * S
    if npay > cap:
        raise ValueError("corrupt container: more words than stream capacity")
    if min(D, W) > npay:
        raise ValueError("corrupt container: donated hole exceeds payload")
    buf = np.zeros(cap, np.uint32)
    buf[:npay] = payload
    # arrays stay host-side (numpy); they transfer as jit-call arguments,
    # avoiding eager device_put dispatches on the decode path
    return EncodedStreams(
        words=buf,
        num_words=npay,
        state_hi=hi,
        state_lo=lo,
        n=n,
        num_streams=S,
        oow_count=int(oow_count),
        oow_idx=oow_idx,
        oow_vals=oow_vals,
        donated=int(min(D, W)),
    )


def stream_bits(blob: bytes) -> int:
    return 8 * len(blob)
