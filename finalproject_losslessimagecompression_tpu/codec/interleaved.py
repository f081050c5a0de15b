"""Vectorized interleaved rANS on TPU (pure JAX / XLA).

The reference entropy coder (reference: rans/rans.pyx:37-110) is a single
serial stream: one 64-bit state, one symbol at a time, on the CPU.  That
model is hostile to TPUs, so this codec runs S independent rANS streams in
lockstep on the VPU: symbol i goes to stream i % S, and a `lax.scan` over
t = 0..k-1 advances all S streams by one symbol per step.  Per-stream coder
semantics (state interval [2^32, 2^64), 32-bit word renormalization,
M = 2^24 quantized-logistic CDF, update rule) are IDENTICAL to the NumPy
oracle, verified by golden tests.

Interleaving uses a single global word buffer in deterministic
(step, stream) emission order (Giesen-style): the decoder re-derives each
step's refill set from its own states, ranks the refilling streams by index,
and pops that many words off the tail -- so the container needs NO
per-stream counts or offsets.

64-bit state emulation: TPUs have no native 64-bit integers, so the state is
a pair of uint32 limbs (hi, lo).  The only hard op is the update division
state // freq (freq < 2^24, state < freq*2^40 after renorm); it is done by
base-256 long division -- 5 uint32 divisions per symbol, all vectorized.

Stream-state overhead: the final states of streams 1..S-1 are entropy-coded
into stream 0 as uniform 16-bit symbols (shift-only rANS ops, zero
redundancy; see container.py), so total flush overhead is ~64 bits per
container, matching the reference's 64*nsplit accounting (trainer.py:327).
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cdf import GRID, NBINS, _HALF_BIN, _INV_GRID, _PMAX

_U = jnp.uint32
MASK24 = np.uint32((1 << 24) - 1)
PAD_MEAN = np.float32(0.0)
PAD_SCALE = np.float32(1e-6)  # near-delta: padding symbols cost ~0.0002 bits
PAD_VALUE = np.int32(0)
STEP_QUANTUM = 16  # bucket scan lengths to limit recompilation


@dataclass
class EncodedStreams:
    """Device-side result of an interleaved encode (before container pack).

    `num_words` may be a device scalar (encode side -- kept on device so the
    encode call needs NO host sync; container packing fetches it together
    with the buffers in one transfer) or a Python int (unpacked side)."""

    words: jax.Array  # [cap] uint32, global emission buffer, (t, s) order
    num_words: object  # int or device scalar: words used (prefix of words)
    state_hi: jax.Array  # [S] uint32 final states
    state_lo: jax.Array  # [S] uint32
    n: int  # number of real (unpadded) symbols
    num_streams: int
    # out-of-window escape (values beyond mean +- 4 are uncodable by the
    # 2048-bin window; the reference silently corrupts and swallows the
    # error, trainer.py:328-329.  Here they are clamped for coding and
    # their true values ride in a raw container side-channel):
    oow_count: object = 0  # int or device scalar
    oow_mask: Optional[jax.Array] = None  # [k*S] bool (padded layout)
    orig_values: Optional[jax.Array] = None  # [k*S] int32 (padded layout)
    # unpacked-container form of the side channel:
    oow_idx: Optional[np.ndarray] = None  # [m] int64 flat symbol indices
    oow_vals: Optional[np.ndarray] = None  # [m] int32 true bin values
    # bits-back: number of leading words donated as seeds to other
    # containers (absent from the packed payload; the decoder restores
    # them from the seeded streams' final states -- see FlowCodec)
    donated: int = 0


# ---------------------------------------------------------------------------
# CDF evaluation (same op sequence as cdf.cdf_bits_jnp, inlined for fusion)
# ---------------------------------------------------------------------------


def _cdf_u32(v, mean, scale, lower):
    vf = v.astype(jnp.float32) * _INV_GRID
    t = (vf + _HALF_BIN - mean) / scale
    sig = jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-t))
    part1 = jnp.round(sig * _PMAX).astype(jnp.int32)
    part2 = v - lower + jnp.int32(1)
    return (part1 + part2).astype(_U)


def _lower_bin(mean):
    return jnp.round(mean * jnp.float32(GRID)).astype(jnp.int32) - jnp.int32(
        NBINS // 2
    )


# ---------------------------------------------------------------------------
# uint32 limb arithmetic
# ---------------------------------------------------------------------------


def _div_digit(r, ni, f, rcp):
    """One base-2^16 long-division step: (r*2^16 + ni) divmod f.

    r < f <= 2^24, ni < 2^16, so acc = r*2^16 + ni < f*2^16 <= 2^40 -- too
    wide for uint32, so the quotient digit is ESTIMATED in float32
    (acc_f * (1/f)) and corrected exactly in mod-2^32 integer arithmetic:
    the true residual acc - d*f has magnitude < 4f < 2^26, so it is
    recovered exactly from the low 32 bits as a signed value.  Error bound:
    |acc_f - acc| <= ~f*2^-7 (two f32 roundings of terms <= f*2^16), rcp
    within a few ulp of 1/f, so the digit estimate is within +-2 of truth;
    three correction rounds cover +-3.  Integer division is avoided
    entirely -- TPUs emulate uint32 divide with a long instruction
    sequence, and this float path is ~5x cheaper.
    """
    acc_f = r.astype(jnp.float32) * jnp.float32(65536.0) + ni.astype(
        jnp.float32
    )
    acc_lo = (r << 16) | ni  # exact mod 2^32
    d = (acc_f * rcp).astype(_U)
    rem = (acc_lo - d * f).astype(jnp.int32)
    fi = f.astype(jnp.int32)
    for _ in range(3):
        neg = rem < 0
        d = jnp.where(neg, d - _U(1), d)
        rem = jnp.where(neg, rem + fi, rem)
        big = rem >= fi
        d = jnp.where(big, d + _U(1), d)
        rem = jnp.where(big, rem - fi, rem)
    return d, rem.astype(_U)


def _div_state_by_freq(hi, lo, f):
    """(hi*2^32 + lo) // f and % f, with state < f*2^40, f in [1, 2^24].

    Long division in base 2^16 over the state's digits (n3 n2 n1 n0).  The
    top digit needs no division: n < f*2^40 implies n3 = n >> 48 < f, so it
    seeds the remainder directly and the quotient is d2*2^32 + d1*2^16 + d0
    (< 2^40, so d2 < 2^8).  Digit steps are division-free (_div_digit).
    """
    rcp = jnp.float32(1.0) / f.astype(jnp.float32)
    n3 = hi >> 16
    n2 = hi & _U(0xFFFF)
    n1 = lo >> 16
    n0 = lo & _U(0xFFFF)
    d2, r = _div_digit(n3, n2, f, rcp)
    d1, r = _div_digit(r, n1, f, rcp)
    d0, r = _div_digit(r, n0, f, rcp)
    q_top = d2  # < 2^8
    q_lo = (d1 << 16) | d0
    return q_top, q_lo, r  # quotient = q_top*2^32 + q_lo


def _umul32(a, b):
    """Full 64-bit product of two uint32 -> (hi, lo) uint32 limbs."""
    a0 = a & _U(0xFFFF)
    a1 = a >> 16
    b0 = b & _U(0xFFFF)
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    hh = hh + ((mid < lh).astype(_U) << 16)  # carry out of mid
    lo = ll + (mid << 16)
    hh = hh + (lo < ll).astype(_U)
    return hh + (mid >> 16), lo


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _encode_step(carry, xs):
    """One scan step over precomputed (cdf_start, freq) tiles."""
    hi, lo = carry
    c_start, f = xs

    # renormalize: state >= f << 40  <=>  hi >= f << 8   (f < 2^24)
    emit = hi >= (f << 8)
    word = jnp.where(emit, lo, _U(0))
    lo = jnp.where(emit, hi, lo)
    hi = jnp.where(emit, _U(0), hi)

    # state = ((state // f) << 24) + state % f + cdf
    q_top, q_lo, r = _div_state_by_freq(hi, lo, f)
    add = r + c_start  # < 2^25
    new_lo = (q_lo << 24) + add
    carry_bit = (new_lo < add).astype(_U)
    new_hi = (q_top << 24) + (q_lo >> 8) + carry_bit
    return (new_hi, new_lo), (word, emit)


def _layout(arr, n, S, k, pad_const):
    """Flat [n] -> [k, S] with tail padding; runs inside jit (static pad)."""
    flat = jnp.asarray(arr).reshape(-1)
    pad = S * k - n
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), pad_const, flat.dtype)])
    return flat.reshape(k, S)


def _encode_core(values, means, scales, num_streams: int, steps: int,
                 use_pallas: bool = False, seeds=None):
    """Whole encode (layout + CDF prepass + state loop + compaction) as ONE
    program.  Everything lives in a single jit: under remote-dispatch
    runtimes each eager op costs a host round trip that dwarfs the compute.

    The sequential state loop runs either as a lax.scan over an XLA CDF
    prepass, or as the grid-pipelined Pallas kernel (pallas_rans.py) which
    evaluates the CDF in-kernel -- Mosaic's exp is bit-identical to XLA's
    on TPU (asserted by tests/test_pallas.py), so the two paths produce
    bit-identical streams.  Integer window bounds and out-of-window
    clamping are always computed here (XLA) so the container side channel
    stays in sync with the coded stream regardless of path.
    values/means/scales arrive flat [n]; n <= steps*num_streams.

    `seeds` ([S] uint32, optional) implements bits-back stream
    initialization: states start at 2^32 | seed instead of 2^32, so the
    ~32-bit per-stream flush carries real payload (the donor's words)
    instead of zeros.  The donor container then OMITS those words
    (container.py `donated`); the decoder recovers them as this encode's
    final lo limbs (decode returns each stream to its initial state) and
    fills the donor's hole before decoding it.  Donation must flow from a
    container decoded LATER to one decoded EARLIER (FlowCodec: level l
    donates seeds to level l+1; decode order is nsplit-1 .. 0).
    """
    S, k = num_streams, steps
    n = int(np.prod(values.shape))
    v = _layout(jnp.asarray(values, jnp.int32), n, S, k, PAD_VALUE)
    m = _layout(jnp.asarray(means, jnp.float32), n, S, k, PAD_MEAN)
    s = _layout(jnp.asarray(scales, jnp.float32), n, S, k, PAD_SCALE)
    # out-of-window escape: clamp into the codable window; the true values
    # of clamped symbols travel in the container side-channel
    lower = jnp.round(m * jnp.float32(GRID)).astype(jnp.int32) - jnp.int32(
        NBINS // 2
    )
    v_clamped = jnp.clip(v, lower, lower + jnp.int32(NBINS - 1))
    oow = (v_clamped != v).reshape(-1)
    oow_count = jnp.sum(oow.astype(jnp.int32))

    if use_pallas:
        # the kernel evaluates the CDF itself (Mosaic exp measured
        # bit-identical to XLA exp on TPU; tests/test_pallas.py asserts it)
        from .pallas_rans import pallas_encode_core

        words, flags_i, hi, lo = pallas_encode_core(
            v_clamped, m, s, lower, S, k, seeds
        )
        flags = flags_i != 0
    else:
        # fused elementwise CDF prepass + lax.scan state loop
        c_start = _cdf_u32(v_clamped - 1, m, s, lower)
        f_all = _cdf_u32(v_clamped, m, s, lower) - c_start
        lo0 = (
            jnp.zeros((S,), _U)
            if seeds is None
            else jnp.asarray(seeds, _U).reshape(S)
        )
        hi0 = jnp.ones((S,), _U)  # initial state = 2^32 | seed (coder.py:18)
        (hi, lo), (words_t, emit_t) = jax.lax.scan(
            _encode_step, (hi0, lo0), (c_start, f_all)
        )
        flags = emit_t.reshape(-1)
        words = words_t.reshape(-1)
        flags_i = flags.astype(jnp.int32)

    # Compact [k, S] emissions into one global buffer in (t, s) order.
    # NOT with a scatter -- XLA scatters run serially on the TPU scalar
    # core (~6 ns/element, which made this epilogue dominate the encode).
    # Instead: a per-step stable sort brings each step's emitted words to
    # the front (one vectorized sort call batched over all k steps), then
    # k contiguous dynamic_update_slice copies assemble the global buffer
    # at the steps' cumulative offsets.
    cap = k * S
    flags_k = flags_i.reshape(k, S)
    words_k = words.reshape(k, S)
    step_counts = jnp.sum(flags_k, axis=1)  # [k]
    offs = jnp.cumsum(step_counts) - step_counts  # exclusive prefix [k]
    total = jnp.sum(step_counts)
    lane = jax.lax.broadcasted_iota(jnp.int32, (k, S), 1)
    keys = ((1 - flags_k) << 30) | lane  # emitted first, stable in s
    _, packed = jax.lax.sort((keys, words_k), dimension=1, num_keys=1)

    def place(t, acc):
        return jax.lax.dynamic_update_slice(acc, packed[t], (offs[t],))

    # rows are placed in ascending t, each overwriting the previous row's
    # un-emitted tail, so [0, total) ends up exactly the (t, s)-order words
    buf = jax.lax.fori_loop(0, k, place, jnp.zeros((cap + S,), _U))[:cap]
    buf = jnp.where(
        jax.lax.iota(jnp.int32, cap) < total, buf, _U(0)
    )
    return buf, total, hi, lo, oow_count, oow, v.reshape(-1)


_encode_scan = partial(
    jax.jit, static_argnames=("num_streams", "steps", "use_pallas")
)(_encode_core)


def _plan_steps(n: int, S: int) -> int:
    k = -(-n // S)
    return -(-k // STEP_QUANTUM) * STEP_QUANTUM


# Pallas kernels are ON by default on TPU for supported shapes (bit-exact
# round-trips verified on hardware, tests/test_pallas.py); LIC_NO_PALLAS=1
# is the escape hatch, and a MOSAIC compile/lowering failure disables them
# for the rest of the process (_disable_pallas, logged once).  Any other
# exception from the encode/decode call (OOM, bad input, interrupts)
# propagates -- falling back on those would silently degrade every
# subsequent encode for a reason unrelated to the kernels.
_PALLAS_DISABLED = [os.environ.get("LIC_NO_PALLAS", "") == "1"]


def _is_mosaic_error(e: BaseException) -> bool:
    """True only for Mosaic/Pallas compile or lowering failures -- the one
    class of error where the scan path is a sound, bit-compatible fallback."""
    seen = set()
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        text = f"{type(e).__module__}.{type(e).__name__}: {e}".lower()
        if "mosaic" in text or "pallas" in text:
            return True
        e = e.__cause__ or e.__context__
    return False


def _pallas_fallback(e: BaseException) -> None:
    """Disable the kernels for the process and say why (once)."""
    import logging

    _disable_pallas()
    logging.getLogger(__name__).warning(
        "Pallas rANS kernel failed to compile; falling back to the "
        "lax.scan backend for the rest of the process: %s", e
    )


def _pallas_ok(S: int, k: int) -> bool:
    if _PALLAS_DISABLED[0]:
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    from .pallas_rans import pallas_supported

    return pallas_supported(S, k)


def _disable_pallas() -> None:
    _PALLAS_DISABLED[0] = True


def pick_num_streams(n: int, requested: int = 8192,
                     sym_per_stream: int = 64) -> int:
    """Cap parallelism so each stream codes >= ~sym_per_stream symbols.
    With the container's variable-length state flush (container.py) a
    seeded stream costs ~5 wasted bits and an unseeded one ~37, so
    64 symbols/stream bounds flush overhead at ~0.1-0.6 bit/symbol while
    keeping the VPU lanes full (the reference's single serial stream pays
    its 64 bits once, trainer.py:327, but codes one symbol at a time on a
    CPU).  Unseeded containers (FlowCodec's level 0) pass a larger
    sym_per_stream to trade a little parallelism for rate."""
    return int(min(requested, max(8, n // sym_per_stream)))


@partial(jax.jit, static_argnames=("S", "offset"))
def _make_seeds_jit(words, num_words, S, offset):
    end = min(offset + S, words.shape[0])
    take = max(end - offset, 0)
    w = jnp.zeros((S,), _U).at[:take].set(words[offset:end])
    idx = jnp.arange(S, dtype=jnp.int32) + jnp.int32(offset)
    return jnp.where(idx < num_words, w, _U(0))


def make_seeds(words, num_words, S: int, offset: int = 0):
    """Bits-back seeds: words [offset, offset+S) of an already-encoded
    buffer (zero-padded past num_words).  Works for device or host arrays;
    safe when the source buffer is shorter than offset + S."""
    return _make_seeds_jit(
        jnp.asarray(words), jnp.asarray(num_words, jnp.int32), S=S,
        offset=int(offset),
    )


def interleaved_encode(
    values, means, scales, num_streams: int = 8192, seeds=None,
    sym_per_stream: int = 64,
) -> EncodedStreams:
    """Encode integer-bin symbols (v = round(x*256)) with S parallel streams.

    values: int-like [n]; means/scales: float32 [n]. Returns device buffers.
    One jit dispatch + one scalar readback.
    """
    n = int(np.prod(np.shape(values)))
    S = pick_num_streams(n, num_streams, sym_per_stream)
    k = _plan_steps(n, S)
    use_pallas = _pallas_ok(S, k)
    try:
        buf, total, hi, lo, oow_count, oow, v_orig = _encode_scan(
            values, means, scales, S, k, use_pallas, seeds
        )
    except Exception as e:
        if not use_pallas or not _is_mosaic_error(e):
            raise
        _pallas_fallback(e)  # Mosaic rejected the kernel; fall back for good
        buf, total, hi, lo, oow_count, oow, v_orig = _encode_scan(
            values, means, scales, S, k, False, seeds
        )
    return EncodedStreams(
        words=buf,
        num_words=total,  # device scalar; no host sync here
        state_hi=hi,
        state_lo=lo,
        n=n,
        num_streams=S,
        oow_count=oow_count,
        oow_mask=oow,
        orig_values=v_orig,
    )


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _decode_step(carry, xs, *, buf):
    hi, lo, ptr = carry
    mean, scale = xs
    S = hi.shape[0]

    # refill: state < 2^32  <=>  hi == 0.  Streams that refill at this step
    # pop, in ascending stream order, the last `cnt` words of the remaining
    # buffer -- the exact reverse of the encoder's (t, s) emission order.
    #
    # GATHER-FREE: an XLA gather runs serially on the TPU scalar core
    # (~60us for S=8192 -- it dominated the whole decode).  But this
    # "gather" has special structure: word[s] = chunk[rank[s]] with rank a
    # monotone prefix sum, i.e. a run-length EXPAND.  off[s] = s - rank[s]
    # is non-decreasing with unit steps, so x[s] = chunk[s - off[s]] is
    # realized by log2(S) conditional uniform lane-shifts (pure VPU ops).
    need = hi == _U(0)
    need_i = need.astype(jnp.int32)
    rank = jnp.cumsum(need_i) - need_i
    cnt = jnp.sum(need_i)
    # contiguous S-word chunk ending at ptr (buf is padded by S zeros so
    # the slice never clamps for valid streams); chunk[j] = buf[ptr-cnt+j]
    chunk = jax.lax.dynamic_slice(
        buf, (jnp.maximum(ptr - cnt, 0),), (S,)
    )
    x = chunk
    rem = jnp.arange(S, dtype=jnp.int32) - rank
    bit = 1
    while bit < S:
        bit <<= 1
    bit >>= 1
    while bit:
        take = rem >= bit
        shifted = jnp.concatenate([jnp.zeros((bit,), x.dtype), x[:-bit]])
        x = jnp.where(take, shifted, x)
        rem = jnp.where(take, rem - bit, rem)
        bit >>= 1
    word = x
    hi = jnp.where(need, lo, hi)
    lo = jnp.where(need, word, lo)
    ptr = ptr - cnt

    mod = lo & MASK24
    lower = _lower_bin(mean)

    # Bitwise binary search for the smallest v with CDF(v) > mod.
    # Invariant: the anchor a satisfies CDF(a) <= mod (true initially for
    # a = lower - 1 on any valid stream) and the answer lies in
    # (a, a + span]; 11 halvings of span = 2048 pin it, then one final
    # eval supplies CDF(v).  Total: 1 + 11 + 1 = 13 CDF evaluations per
    # symbol.  At wide stream counts the VPU is THROUGHPUT-bound on the
    # CDF's exp (not dependency-depth-bound), so minimizing total evals is
    # the lever -- this replaced a radix-8 schedule (26 evals) for ~2x
    # decode throughput.  (Reference decode: an 11-step serial binary
    # search per symbol on the CPU, rans/rans.pyx:87-104.)
    a = lower - jnp.int32(1)
    c_a = _cdf_u32(a, mean, scale, lower)
    span = NBINS
    while span > 1:
        span //= 2
        p = a + jnp.int32(span)
        cd = _cdf_u32(p, mean, scale, lower)
        le = cd <= mod
        a = jnp.where(le, p, a)
        c_a = jnp.where(le, cd, c_a)
    v = a + jnp.int32(1)
    c_hi = _cdf_u32(v, mean, scale, lower)
    f = c_hi - c_a
    c_lo = c_a

    # state = (state >> 24) * f + mod - cdf
    t_lo = (hi << 8) | (lo >> 24)
    t_hi = hi >> 24
    p_hi, p_lo = _umul32(t_lo, f)
    p_hi = p_hi + t_hi * f
    delta = (mod - c_lo).astype(jnp.int32)  # in (-2^24, 2^24)
    new_lo = p_lo + delta.astype(_U)
    carry_bit = (new_lo < p_lo).astype(_U)
    sign_ext = jnp.where(delta < 0, _U(0xFFFFFFFF), _U(0))
    new_hi = p_hi + sign_ext + carry_bit
    return (new_hi, new_lo, ptr), v


def _decode_core(buf, num_words, hi, lo, means, scales,
                 num_streams: int, steps: int, fill=None, donated=None,
                 use_pallas: bool = False):
    S, k = num_streams, steps
    n = int(np.prod(means.shape))
    m = _layout(jnp.asarray(means, jnp.float32), n, S, k, PAD_MEAN)
    s = _layout(jnp.asarray(scales, jnp.float32), n, S, k, PAD_SCALE)
    buf = jnp.asarray(buf, jnp.uint32)
    if fill is not None:
        # bits-back hole restore: the container omitted its first `donated`
        # words (they rode as seeds in the previously-decoded level's
        # stream states); `fill` is that level's recovered final lo limbs
        take = min(int(fill.shape[0]), int(buf.shape[0]))
        filled = jnp.zeros_like(buf).at[:take].set(
            jnp.asarray(fill, jnp.uint32)[:take]
        )
        sel = jax.lax.iota(jnp.int32, buf.shape[0]) < jnp.asarray(
            donated, jnp.int32
        )
        buf = jnp.where(sel, filled, buf)
    if use_pallas:
        from .pallas_rans import pallas_decode_core

        # the window lower bound is computed by XLA on BOTH ends (encode
        # prepass and here), so kernel float-rounding skew cannot shift it
        lower = jnp.round(m * jnp.float32(GRID)).astype(jnp.int32) - (
            jnp.int32(NBINS // 2)
        )
        vals, hi, lo = pallas_decode_core(
            buf, num_words, hi, lo, m, s, lower, S, k
        )
        return vals.reshape(-1)[:n], hi, lo, jnp.int32(0)
    # pad by S so the refill chunk slice (start = ptr - cnt, size S) never
    # clamps while ptr is within the real buffer
    buf = jnp.concatenate([buf, jnp.zeros((S,), jnp.uint32)])
    step = partial(_decode_step, buf=buf)
    (hi, lo, ptr), vals = jax.lax.scan(
        step, (hi, lo, num_words), (m, s), reverse=True
    )
    return vals.reshape(-1)[:n], hi, lo, ptr


_decode_scan = partial(
    jax.jit, static_argnames=("num_streams", "steps", "use_pallas")
)(_decode_core)


def interleaved_decode(
    enc: EncodedStreams, means, scales, fill=None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode all symbols given the same means/scales used at encode time
    (flat [n], encode order). Returns (values int32 [n], state_hi, state_lo);
    a successful decode returns every stream's state to its initial encode
    state: 2^32 | seed, i.e. hi == 1 and lo == seed (lo == 0 for unseeded
    streams), mirroring the reference invariant (trainer.py:326).

    `fill` (uint32 [*]) restores a bits-back donation hole: the container's
    first `enc.donated` words were omitted from the payload and are
    recovered from the final lo limbs of the streams they seeded (decoded
    earlier); see FlowCodec."""
    S = enc.num_streams
    n = enc.n
    k = _plan_steps(n, S)
    nw = enc.num_words
    if not isinstance(nw, jax.Array):
        nw = np.int32(nw)
    use_pallas = _pallas_ok(S, k)
    args = (
        enc.words,
        nw,
        enc.state_hi,
        enc.state_lo,
        means,
        scales,
        S,
        k,
        fill,
        None if fill is None else np.int32(enc.donated),
    )
    try:
        vals, hi, lo, ptr = _decode_scan(*args, use_pallas)
    except Exception as e:
        if not use_pallas or not _is_mosaic_error(e):
            raise
        _pallas_fallback(e)  # Mosaic rejected the kernel; scan is bit-compatible
        vals, hi, lo, ptr = _decode_scan(*args, False)
    return vals, hi, lo
