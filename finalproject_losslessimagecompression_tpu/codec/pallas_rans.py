"""Pallas TPU kernels for the interleaved rANS codec: encode AND decode.

Replaces the reference's serial Cython/C++ coder (reference:
rans/rans.pyx:49-110) with lane-parallel Mosaic kernels that advance all S
streams in lockstep, grid-pipelined over step chunks so messages of any
length stream through VMEM (inputs/outputs are double-buffered HBM<->VMEM
by the Pallas pipeline; carried stream states live in VMEM scratch across
grid iterations).

Backend contract: the quantized CDF (codec/cdf.py) is evaluated by
`jnp.exp` INSIDE the kernels, so a Pallas-encoded message must be decoded
by the Pallas kernel (and a lax.scan-encoded one by the scan path) -- the
pairing is guaranteed by a single `pallas_supported(S, k)` predicate both
directions evaluate identically.  Integer-side quantities that feed the
container's side channels (window lower bound, out-of-window clamping) are
precomputed by XLA and passed in, so kernel/XLA float-rounding skew cannot
desynchronize the escape metadata from the coded stream.

Encode (reference semantics rans/rans.pyx:49-67):
  per step, per stream: renormalize (emit low 32 bits when
  state >= freq << 40), then state = (state//f) << 24 + state%f + cdf.
  The uint64 state is a (hi, lo) uint32 limb pair; the division is the
  float-assisted base-2^16 long division of interleaved._div_digit, exactly
  corrected in integer arithmetic (bit-identical on any backend).

Decode (reference semantics rans/rans.pyx:85-109):
  per step (walked in reverse), per stream: refill (state < 2^32 pops one
  word off the tail of the shared buffer, in ascending stream order --
  realized gather-free as a run-length expand via log-shift stages), then
  a radix-8 search over the 2048-bin window for the symbol whose CDF
  interval contains state & 0xFFFFFF, then
  state = (state >> 24) * f + mod - cdf.  The (zero-padded) word buffer is
  VMEM-resident when it fits the budget; larger messages keep it in HBM
  and each grid chunk DMAs the active tail window into VMEM scratch
  (consumption is tail-first and monotone, so a DEC_CHUNK * S + S + LANES
  window always covers a chunk's reads) -- `pallas_supported` accepts any
  length for which either form fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cdf import _HALF_BIN, _INV_GRID, _PMAX

_U = jnp.uint32
_I = jnp.int32
LANES = 128
ENC_CHUNK = 16  # steps per encode grid chunk (k is a multiple of 16)
DEC_CHUNK = 8  # steps per decode grid chunk
VMEM_BUDGET = 10 * 1024 * 1024  # headroom below ~16MB/core


def _ceil_log2(x: int) -> int:
    return max(1, (x - 1).bit_length())


# ---------------------------------------------------------------------------
# tile helpers: flattened row-major shifts over (R, 128) uint32 tiles
# ---------------------------------------------------------------------------


def _rows_down(x, rows: int):
    """result[r] = x[r - rows], zero-filled (static row count)."""
    if rows == 0:
        return x
    if rows >= x.shape[0]:
        return jnp.zeros_like(x)
    z = jnp.zeros((rows,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, x[:-rows]], axis=0)


def _rows_up(x, rows: int):
    if rows == 0:
        return x
    if rows >= x.shape[0]:
        return jnp.zeros_like(x)
    z = jnp.zeros((rows,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x[rows:], z], axis=0)


def _flat_right(x, b: int, col):
    """result.flat[i] = x.flat[i - b] over row-major (R, 128); static b."""
    rows, cols = divmod(b, LANES)
    y = _rows_down(x, rows)
    if cols == 0:
        return y
    rolled = pltpu.roll(y, cols, 1)
    rolled_prev = pltpu.roll(_rows_down(y, 1), cols, 1)
    return jnp.where(col >= cols, rolled, rolled_prev)


def _flat_left(x, b: int, col):
    """result.flat[i] = x.flat[i + b] over row-major (R, 128); static b."""
    rows, cols = divmod(b, LANES)
    y = _rows_up(x, rows)
    if cols == 0:
        return y
    rolled = pltpu.roll(y, LANES - cols, 1)
    rolled_next = pltpu.roll(_rows_up(y, 1), LANES - cols, 1)
    return jnp.where(col < LANES - cols, rolled, rolled_next)


def _flat_left_dyn(x, amt, maxbits: int, col):
    """Left shift by a runtime scalar amount, as gated static stages."""
    for bit in range(maxbits - 1, -1, -1):
        b = 1 << bit
        x = jnp.where((amt & b) != 0, _flat_left(x, b, col), x)
    return x


def _flat_cumsum_excl(x, col):
    """Exclusive prefix sum of an int32 (R, 128) tile in row-major order:
    a flat Hillis-Steele scan of log-shift adds (full-width tiles only --
    Mosaic rejects concats of (R, 1) slivers)."""
    orig = x
    n = x.shape[0] * LANES
    for bit in range(_ceil_log2(n)):
        x = x + _flat_right(x, 1 << bit, col)
    return x - orig


def _expand_by_rank(z, rank, S: int, col):
    """result.flat[s] = z.flat[rank.flat[s]] where rank is non-decreasing
    with unit steps (a run-length expand): off = s - rank is non-decreasing,
    so conditional backward log-shifts realize the gather on the VPU."""
    sidx = jax.lax.broadcasted_iota(_I, z.shape, 0) * LANES + col
    rem = sidx - rank
    x = z
    for bit in range(_ceil_log2(S) - 1, -1, -1):
        b = 1 << bit
        take = rem >= b
        x = jnp.where(take, _flat_right(x, b, col), x)
        rem = jnp.where(take, rem - b, rem)
    return x


# ---------------------------------------------------------------------------
# in-kernel CDF + limb arithmetic
# ---------------------------------------------------------------------------


def _cdf_k(v, mean, scale, lower):
    """codec/cdf.py formula; uint32 casts detour through int32 (Mosaic has
    no uint32<->float casts; every value here is < 2^31 so it is exact)."""
    vf = v.astype(jnp.float32) * _INV_GRID
    t = (vf + _HALF_BIN - mean) / scale
    sig = jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-t))
    part1 = jnp.round(sig * _PMAX).astype(_I)
    part2 = v - lower + _I(1)
    return (part1 + part2).astype(_U)


def _div_digit_k(r, ni, f, rcp):
    """One base-2^16 long-division digit (same contract and exactness proof
    as interleaved._div_digit; float-estimated, integer-corrected)."""
    acc_f = (
        r.astype(_I).astype(jnp.float32) * jnp.float32(65536.0)
        + ni.astype(_I).astype(jnp.float32)
    )
    acc_lo = (r << 16) | ni
    d = (acc_f * rcp).astype(_I).astype(_U)
    rem = (acc_lo - d * f).astype(_I)
    fi = f.astype(_I)
    for _ in range(3):
        neg = rem < 0
        d = jnp.where(neg, d - _U(1), d)
        rem = jnp.where(neg, rem + fi, rem)
        big = rem >= fi
        d = jnp.where(big, d + _U(1), d)
        rem = jnp.where(big, rem - fi, rem)
    return d, rem.astype(_U)


def _umul32_k(a, b):
    a0 = a & _U(0xFFFF)
    a1 = a >> 16
    b0 = b & _U(0xFFFF)
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + hl
    hh = hh + ((mid < lh).astype(_U) << 16)
    lo = ll + (mid << 16)
    hh = hh + (lo < ll).astype(_U)
    return hh + (mid >> 16), lo


# ---------------------------------------------------------------------------
# encode kernel
# ---------------------------------------------------------------------------


def _encode_kernel(v_ref, m_ref, s_ref, low_ref, seed_ref,
                   words_ref, flags_ref, hi_ref, lo_ref, shi, slo):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        shi[...] = jnp.ones(shi.shape, _U)  # initial state = 2^32 | seed
        slo[...] = seed_ref[...]

    def body(t, carry):
        hi, lo = carry
        v = v_ref[t]
        m = m_ref[t]
        s = s_ref[t]
        low = low_ref[t]
        c0 = _cdf_k(v - _I(1), m, s, low)
        f = _cdf_k(v, m, s, low) - c0
        rcp = jnp.float32(1.0) / f.astype(_I).astype(jnp.float32)

        emit = hi >= (f << 8)  # state >= f << 40
        words_ref[t] = jnp.where(emit, lo, _U(0))
        flags_ref[t] = emit.astype(_I)
        lo = jnp.where(emit, hi, lo)
        hi = jnp.where(emit, _U(0), hi)

        # state = ((state // f) << 24) + state % f + cdf
        d2, r = _div_digit_k(hi >> 16, hi & _U(0xFFFF), f, rcp)
        d1, r = _div_digit_k(r, lo >> 16, f, rcp)
        d0, r = _div_digit_k(r, lo & _U(0xFFFF), f, rcp)
        q_lo = (d1 << 16) | d0
        add = r + c0
        new_lo = (q_lo << 24) + add
        carry_bit = (new_lo < add).astype(_U)
        new_hi = (d2 << 24) + (q_lo >> 8) + carry_bit
        return new_hi, new_lo

    hi, lo = jax.lax.fori_loop(0, v_ref.shape[0], body, (shi[...], slo[...]))
    shi[...] = hi
    slo[...] = lo
    hi_ref[...] = hi
    lo_ref[...] = lo


def pallas_encode_core(v, m, s, lower, S: int, k: int, seeds=None):
    """v/m/s/lower: [k, S] padded-layout tiles (v already window-clamped by
    the XLA prepass).  Returns (words [k*S] u32, flags [k*S] i32, hi [S],
    lo [S]) bit-identical in layout to the lax.scan path."""
    sr = S // LANES
    shape3 = (k, sr, LANES)
    if seeds is None:
        seeds = jnp.zeros((S,), _U)
    chunk = lambda idx: pl.BlockSpec(  # noqa: E731
        (ENC_CHUNK, sr, LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM) if idx else pl.BlockSpec(
        (sr, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    words, flags, hi, lo = pl.pallas_call(
        _encode_kernel,
        grid=(k // ENC_CHUNK,),
        in_specs=[chunk(1), chunk(1), chunk(1), chunk(1), chunk(0)],
        out_specs=(chunk(1), chunk(1), chunk(0), chunk(0)),
        out_shape=(
            jax.ShapeDtypeStruct(shape3, jnp.uint32),
            jax.ShapeDtypeStruct(shape3, jnp.int32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((sr, LANES), jnp.uint32),
            pltpu.VMEM((sr, LANES), jnp.uint32),
        ],
    )(
        v.reshape(shape3),
        m.reshape(shape3),
        s.reshape(shape3),
        lower.reshape(shape3),
        jnp.asarray(seeds, _U).reshape(sr, LANES),
    )
    return (
        words.reshape(k * S),
        flags.reshape(k * S),
        hi.reshape(S),
        lo.reshape(S),
    )


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------


def _dec_step(m, s, lower, hi, lo, ptr, buf_ref, col2, colw, S: int):
    """One decode step over all S streams; `buf_ref` is any (R, 128) VMEM
    ref holding the word buffer region such that local `ptr` indexes it
    (resident kernel: the whole buffer; chunk kernel: the active tail
    window, with ptr rebased by the caller).  Returns (v, hi, lo, ptr)."""
    sr = S // LANES
    maxbits = _ceil_log2(S + LANES)

    # ---- refill: streams with hi == 0 pop, in ascending stream order,
    # the last cnt words of the remaining buffer (positions
    # ptr - cnt .. ptr - 1).  Gather-free: word[s] = win[off0 + rank[s]]
    # with off0 = ptr - cnt - w0 and rank the exclusive prefix sum of
    # the refill mask -- a dynamic flat shift + run-length expand.
    need = hi == _U(0)
    need_i = need.astype(_I)
    rank = _flat_cumsum_excl(need_i, col2)
    cnt = jnp.sum(need_i)
    w0row = jnp.maximum(ptr - S, 0) >> 7  # 128-aligned window start row
    win = buf_ref[pl.ds(w0row, sr + 1), :]  # (sr + 1, LANES)
    off0 = ptr - cnt - w0row * LANES
    z = _flat_left_dyn(win, off0, maxbits, colw)[:sr]
    word = _expand_by_rank(z, rank, S, col2)
    hi = jnp.where(need, lo, hi)
    lo = jnp.where(need, word, lo)
    ptr = ptr - cnt

    mod = lo & _U(0xFFFFFF)

    # ---- bitwise binary search for the smallest v with CDF(v) > mod
    # (same 13-eval schedule and comparisons as the scan path, so both
    # backends decode identical values; see interleaved._decode_step)
    a = lower - _I(1)
    c_a = _cdf_k(a, m, s, lower)
    span = 2048
    while span > 1:
        span //= 2
        p_v = a + _I(span)
        cd = _cdf_k(p_v, m, s, lower)
        le = cd <= mod
        a = jnp.where(le, p_v, a)
        c_a = jnp.where(le, cd, c_a)
    v = a + _I(1)
    c_hi = _cdf_k(v, m, s, lower)
    f = c_hi - c_a

    # ---- state = (state >> 24) * f + mod - cdf
    t_lo = (hi << 8) | (lo >> 24)
    t_hi = hi >> 24
    p_hi, p_lo = _umul32_k(t_lo, f)
    p_hi = p_hi + t_hi * f
    delta = (mod - c_a).astype(_I)
    new_lo = p_lo + delta.astype(_U)
    carry_bit = (new_lo < p_lo).astype(_U)
    sign_ext = jnp.where(delta < _I(0), _U(0xFFFFFFFF), _U(0))
    new_hi = p_hi + sign_ext + carry_bit
    return v, new_hi, new_lo, ptr


def _decode_kernel(nw_ref, m_ref, s_ref, low_ref, buf_ref, hi0_ref, lo0_ref,
                   vals_ref, hi_ref, lo_ref, shi, slo, sptr):
    i = pl.program_id(0)
    sr = shi.shape[0]
    S = sr * LANES

    @pl.when(i == 0)
    def _():
        shi[...] = hi0_ref[...]
        slo[...] = lo0_ref[...]
        sptr[0] = nw_ref[0]

    col2 = jax.lax.broadcasted_iota(_I, (sr, LANES), 1)
    colw = jax.lax.broadcasted_iota(_I, (sr + 1, LANES), 1)

    def body(j, carry):
        hi, lo, ptr = carry
        t = m_ref.shape[0] - 1 - j  # steps walk in reverse
        v, hi, lo, ptr = _dec_step(
            m_ref[t], s_ref[t], low_ref[t], hi, lo, ptr, buf_ref,
            col2, colw, S,
        )
        vals_ref[t] = v
        return hi, lo, ptr

    hi, lo, ptr = jax.lax.fori_loop(
        0, m_ref.shape[0], body, (shi[...], slo[...], sptr[0])
    )
    shi[...] = hi
    slo[...] = lo
    sptr[0] = ptr
    hi_ref[...] = hi
    lo_ref[...] = lo


def _decode_chunk_kernel(m_ref, s_ref, low_ref, win_ref, hi0_ref, lo0_ref,
                         ptr0_ref, vals_ref, hi_ref, lo_ref, ptr_ref):
    """DEC_CHUNK decode steps against a VMEM tail WINDOW of the word buffer
    (the windowed form for messages whose buffer exceeds VMEM; the caller
    stages the window from HBM with a plain XLA dynamic_slice and rebases
    ptr to it -- see pallas_decode_core).  In-kernel DMA is deliberately
    avoided: manual make_async_copy faults/hangs this runtime's remote
    workers (probed r3), while the slice-per-chunk form is pure Pallas
    compute over prefetched inputs."""
    sr = hi0_ref.shape[0]
    S = sr * LANES
    col2 = jax.lax.broadcasted_iota(_I, (sr, LANES), 1)
    colw = jax.lax.broadcasted_iota(_I, (sr + 1, LANES), 1)

    def body(j, carry):
        hi, lo, ptr = carry
        t = m_ref.shape[0] - 1 - j  # steps walk in reverse
        v, hi, lo, ptr = _dec_step(
            m_ref[t], s_ref[t], low_ref[t], hi, lo, ptr, win_ref,
            col2, colw, S,
        )
        vals_ref[t] = v
        return hi, lo, ptr

    hi, lo, ptr = jax.lax.fori_loop(
        0, m_ref.shape[0], body,
        (hi0_ref[...], lo0_ref[...], ptr0_ref[0]),
    )
    hi_ref[...] = hi
    lo_ref[...] = lo
    ptr_ref[0] = ptr


def pallas_decode_core(buf, num_words, hi, lo, m, s, lower, S: int, k: int,
                       windowed: "bool | None" = None):
    """buf: [k*S + S] u32 word buffer (zero-padded; bits-back holes already
    filled); num_words: i32 scalar; hi/lo: [S] initial states; m/s/lower:
    [k, S] padded-layout parameter tiles.  Returns (vals [k, S] i32,
    hi [S], lo [S])."""
    sr = S // LANES
    shape3 = (k, sr, LANES)
    nchunks = k // DEC_CHUNK
    # grid walks chunks in reverse; in-kernel loop walks steps in reverse
    # (index maps take (grid_idx, *scalar_prefetch_refs))
    rev = lambda i, *_: (nchunks - 1 - i, 0, 0)  # noqa: E731
    full = lambda i, *_: (0, 0)  # noqa: E731
    chunk3 = lambda: pl.BlockSpec(  # noqa: E731
        (DEC_CHUNK, sr, LANES), rev, memory_space=pltpu.VMEM)
    # pad the buffer so the (sr + 1)-row refill window slice never reads
    # out of bounds: rows = cap/128 + sr + 1
    cap = k * S
    bufp = jnp.concatenate(
        [jnp.asarray(buf, _U).reshape(-1)[:cap],
         jnp.zeros((S + LANES,), _U)]
    )
    bufp = bufp.reshape(cap // LANES + sr + 1, LANES)
    # resident if the whole buffer fits the VMEM budget; otherwise keep it
    # in HBM and stage the active tail window per chunk with a plain XLA
    # dynamic_slice (same bitstream, same in-kernel CDF backend -- only the
    # word supply path differs).  `windowed` overrides the choice (tests
    # force the window on small messages).
    if windowed is None:
        windowed = not _decode_resident_ok(S, k)
    if windowed:
        return _pallas_decode_windowed(
            bufp, num_words, hi, lo, m, s, lower, S, k
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            chunk3(),
            chunk3(),
            chunk3(),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole word buffer
            pl.BlockSpec((sr, LANES), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((sr, LANES), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            chunk3(),
            pl.BlockSpec((sr, LANES), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((sr, LANES), full, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sr, LANES), jnp.uint32),
            pltpu.VMEM((sr, LANES), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    vals, hi_f, lo_f = pl.pallas_call(
        _decode_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(shape3, jnp.int32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
        ),
    )(
        jnp.asarray(num_words, jnp.int32).reshape(1),
        m.reshape(shape3),
        s.reshape(shape3),
        lower.reshape(shape3),
        bufp,
        jnp.asarray(hi, _U).reshape(sr, LANES),
        jnp.asarray(lo, _U).reshape(sr, LANES),
    )
    return vals.reshape(k, S), hi_f.reshape(S), lo_f.reshape(S)


def _pallas_decode_windowed(bufp, num_words, hi, lo, m, s, lower,
                            S: int, k: int):
    """Windowed decode: lax.scan over DEC_CHUNK-step chunks (last chunk
    first); each iteration stages the active tail window of the HBM word
    buffer into the chunk kernel with a dynamic_slice and rebases ptr to
    it.  The window covers the chunk's worst case: DEC_CHUNK * S words of
    consumption plus one step's S + LANES read span (see _win_rows).

    Per-chunk overhead is one kernel launch + a <=300KB slice copy --
    amortized over DEC_CHUNK * S symbols.  This lifts the resident form's
    ~VMEM/4-word message cap (VERDICT r2 item 5) without in-kernel DMA,
    which faults this runtime's remote workers."""
    sr = S // LANES
    nchunks = k // DEC_CHUNK
    win_rows = _win_rows(sr)
    total_rows = bufp.shape[0]
    cshape = (DEC_CHUNK, sr, LANES)

    kernel = pl.pallas_call(
        _decode_chunk_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # m chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lower chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ptr (window-local)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(cshape, jnp.int32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
    )

    def body(carry, xs):
        hi, lo, ptr = carry
        mc, sc, lc = xs
        base = jnp.maximum(ptr - (DEC_CHUNK * S + S), 0) >> 7
        base = jnp.minimum(base, jnp.int32(total_rows - win_rows))
        win = jax.lax.dynamic_slice(bufp, (base, 0), (win_rows, LANES))
        lptr = (ptr - base * LANES).reshape(1)
        vals_c, hi, lo, lptr2 = kernel(mc, sc, lc, win, hi, lo, lptr)
        return (hi, lo, base * LANES + lptr2[0]), vals_c

    m3 = m.reshape(nchunks, DEC_CHUNK, sr, LANES)
    s3 = s.reshape(nchunks, DEC_CHUNK, sr, LANES)
    l3 = lower.reshape(nchunks, DEC_CHUNK, sr, LANES)
    hi0 = jnp.asarray(hi, _U).reshape(sr, LANES)
    lo0 = jnp.asarray(lo, _U).reshape(sr, LANES)
    ptr0 = jnp.asarray(num_words, jnp.int32).reshape(())
    (hi_f, lo_f, _), vals = jax.lax.scan(
        body, (hi0, lo0, ptr0), (m3, s3, l3), reverse=True
    )
    return vals.reshape(k, S), hi_f.reshape(S), lo_f.reshape(S)


# ---------------------------------------------------------------------------
# support predicate (MUST be identical for encode and decode: the Mosaic
# and XLA transcendentals are not assumed bit-equal, so a message is only
# decodable by the backend that encoded it -- both directions derive the
# backend from this one function of (S, k))
# ---------------------------------------------------------------------------


def _win_rows(sr: int) -> int:
    """Windowed-decode VMEM window size in rows: worst-case one-chunk
    consumption (DEC_CHUNK * S words) + one step's read span (S + LANES)
    + one row of floor-alignment slack."""
    return (DEC_CHUNK + 1) * sr + 2


def _decode_resident_ok(S: int, k: int) -> bool:
    """Whole word buffer + streaming chunks fit the VMEM budget."""
    buf_bytes = (k * S + S + LANES) * 4
    stream_bytes = 2 * DEC_CHUNK * S * 16
    return buf_bytes + stream_bytes <= VMEM_BUDGET


def pallas_supported(S: int, k: int) -> bool:
    if S % LANES != 0:
        return False
    if k % ENC_CHUNK != 0 or k % DEC_CHUNK != 0:
        return False
    if _decode_resident_ok(S, k):
        return True
    # windowed decode: the buffer stays in HBM; VMEM needs only the tail
    # window + streaming chunks.  Requires the padded buffer to have at
    # least win_rows rows (always true here: k >= ENC_CHUNK = 16 gives
    # k*sr + sr + 1 > (DEC_CHUNK + 1)*sr + 2).
    sr = S // LANES
    stream_bytes = 2 * DEC_CHUNK * S * 16
    win_bytes = _win_rows(sr) * LANES * 4
    if k * sr + sr + 1 < _win_rows(sr):
        return False
    return stream_bytes + win_bytes <= VMEM_BUDGET


def pallas_encode_supported(S: int, k: int) -> bool:  # back-compat alias
    return pallas_supported(S, k)
