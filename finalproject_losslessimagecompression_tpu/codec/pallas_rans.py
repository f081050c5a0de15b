"""Pallas TPU kernel for the rANS encode inner loop.

The encode is split so the kernel stays bit-compatible with the XLA decode
path:
- CDF evaluation (exp/sigmoid) runs as a fused XLA elementwise prepass over
  all [k, S] symbols -- transcendental implementations may differ between
  Mosaic and XLA, so they are kept OUT of the kernel;
- the Pallas kernel advances all S states through the k sequential steps:
  renormalization + the division-free base-2^16 state update.  The
  float-assisted division (interleaved._div_digit) is exactly corrected in
  integer arithmetic, so its result is identical on any backend -- the
  kernel's output streams are bit-identical to the lax.scan path (tested).

Layout: states live in VMEM as [S/128, 128] uint32 tiles (full VPU lanes);
per-step (cdf, freq) tiles are read from VMEM and emitted (word, flag)
tiles written back, with the global (t, s)-order compaction done by the
same XLA epilogue as the scan path.

Falls back to the lax.scan path when shapes don't fit (S not a multiple of
128, or buffers exceeding the VMEM budget) or when Mosaic rejects the
kernel at compile time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U = jnp.uint32
LANES = 128
VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom below ~16MB/core


def _div_digit_kernel(r, ni, f, rcp):
    """Same contract as interleaved._div_digit (exact for any rcp within
    +-3 of 1/f); duplicated here so the kernel has no module cycles.
    Mosaic lacks uint32<->float32 casts, so conversions route through
    int32 (all values involved are < 2^31, so the detour is exact)."""
    acc_f = (
        r.astype(jnp.int32).astype(jnp.float32) * jnp.float32(65536.0)
        + ni.astype(jnp.int32).astype(jnp.float32)
    )
    acc_lo = (r << 16) | ni
    d = (acc_f * rcp).astype(jnp.int32).astype(_U)
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


def _encode_kernel(cdf_ref, freq_ref, rcp_ref, words_ref, flags_ref,
                   hi_ref, lo_ref):
    k = cdf_ref.shape[0]
    sr = cdf_ref.shape[1]

    hi0 = jnp.ones((sr, LANES), _U)
    lo0 = jnp.zeros((sr, LANES), _U)

    def body(t, carry):
        hi, lo = carry
        c0 = cdf_ref[t]
        f = freq_ref[t]
        rcp = rcp_ref[t]

        emit = hi >= (f << 8)
        words_ref[t] = jnp.where(emit, lo, _U(0))
        flags_ref[t] = emit.astype(jnp.int32)
        lo = jnp.where(emit, hi, lo)
        hi = jnp.where(emit, _U(0), hi)

        # state = ((state // f) << 24) + state % f + cdf  (division-free)
        n3 = hi >> 16
        n2 = hi & _U(0xFFFF)
        n1 = lo >> 16
        n0 = lo & _U(0xFFFF)
        d2, r = _div_digit_kernel(n3, n2, f, rcp)
        d1, r = _div_digit_kernel(r, n1, f, rcp)
        d0, r = _div_digit_kernel(r, n0, f, rcp)
        q_lo = (d1 << 16) | d0
        add = r + c0
        new_lo = (q_lo << 24) + add
        carry_bit = (new_lo < add).astype(_U)
        new_hi = (d2 << 24) + (q_lo >> 8) + carry_bit
        return new_hi, new_lo

    hi, lo = jax.lax.fori_loop(0, k, body, (hi0, lo0))
    hi_ref[...] = hi
    lo_ref[...] = lo


def pallas_encode_supported(S: int, k: int) -> bool:
    if S % LANES != 0:
        return False
    # cdf/freq/rcp in + words/flags out, all [k, S] x 4 bytes
    if 5 * k * S * 4 > VMEM_BUDGET:
        return False
    return True


def pallas_encode_core(cdf, freq, S: int, k: int):
    """(cdf, freq): [k, S] uint32 per-symbol interval start / frequency.
    Returns (words [k*S] uint32, flags [k*S] int32, hi [S], lo [S]) in the
    same layout as the lax.scan path."""
    sr = S // LANES
    cdf3 = cdf.reshape(k, sr, LANES)
    freq3 = freq.reshape(k, sr, LANES)
    # rcp computed outside the kernel (XLA): freq < 2^24 is exact in f32
    rcp3 = jnp.float32(1.0) / freq3.astype(jnp.int32).astype(jnp.float32)
    words, flags, hi, lo = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((k, sr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((sr, LANES), jnp.uint32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(cdf3, freq3, rcp3)
    return (
        words.reshape(k * S),
        flags.reshape(k * S),
        hi.reshape(S),
        lo.reshape(S),
    )
