"""Quantized discretized-logistic CDF for the rANS coder.

This reproduces the *semantics* of the reference symbol model
(reference: rans/rans.pyx:25-35,51):

- symbols live on the 1/256 grid; each symbol is the integer bin
  v = round(x * 256), restricted to a 2048-bin window centred on the mean:
  [lower, lower + 2047] with lower = rint(mean * 256) - 1024.
- the cumulative distribution at precision M = 2^24 is
      CDF(v) = rint(sigmoid((v/256 + 0.5/256 - mean)/scale) * (M - 2048))
             + (v - lower) + 1
  The linear term guarantees every bin has frequency >= 1, and
  CDF(lower - 1) = 0, CDF(lower + 2047) = M.

Two twin implementations (NumPy / jax.numpy) use the *same explicit op
sequence* in float32 so that a given backend is always self-consistent
(encode and decode evaluate identical code).  Cross-backend bit-parity of
`exp` is not guaranteed by IEEE; the codec therefore treats the evaluation
backend as part of the stream contract, and tests verify empirical parity.
"""

from __future__ import annotations

import numpy as np

PRECISION_BITS = 24
PRECISION = 1 << PRECISION_BITS  # M = 2^24
NBINS = 2048
NBINS_LOG2 = 11
GRID_BITS = 8
GRID = 1 << GRID_BITS  # 256 bins per unit
_HALF_BIN = np.float32(0.5 / GRID)
_INV_GRID = np.float32(1.0 / GRID)
_PMAX = np.float32(PRECISION - NBINS)


def lower_bin(mean, xp=np):
    """Integer lower edge of the 2048-bin window: rint(mean*256) - 1024."""
    m = xp.asarray(mean, dtype=xp.float32)
    return xp.round(m * xp.float32(GRID)).astype(xp.int32) - xp.int32(NBINS // 2)


def _cdf_bits(v, mean, scale, lower, xp):
    """CDF(v) in [0, 2^24] as uint32. v, lower: int32 bins; mean, scale: f32."""
    vf = v.astype(xp.float32) * _INV_GRID
    t = (vf + _HALF_BIN - mean) / scale
    sig = xp.float32(1.0) / (xp.float32(1.0) + xp.exp(-t))
    part1 = xp.round(sig * _PMAX).astype(xp.int32)
    part2 = v - lower + xp.int32(1)
    return (part1 + part2).astype(xp.uint32)


def cdf_bits_np(v, mean, scale, lower):
    v = np.asarray(v, np.int32)
    mean = np.asarray(mean, np.float32)
    scale = np.asarray(scale, np.float32)
    lower = np.asarray(lower, np.int32)
    with np.errstate(over="ignore"):
        return _cdf_bits(v, mean, scale, lower, np)


def cdf_bits_jnp(v, mean, scale, lower):
    import jax.numpy as jnp

    return _cdf_bits(
        jnp.asarray(v, jnp.int32),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(lower, jnp.int32),
        jnp,
    )


def symbol_freq_np(v, mean, scale):
    """(cdf_start, freq) of bin v -- NumPy path."""
    lower = lower_bin(mean, np)
    start = cdf_bits_np(v - 1, mean, scale, lower)
    end = cdf_bits_np(v, mean, scale, lower)
    return start, end - start
