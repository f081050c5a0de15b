"""Pallas kernel logic under TPU interpret mode (runs on CPU).

The real-hardware parity suite (tests/test_pallas.py) skips off-TPU; this
covers the kernels' INDEXING/ARITHMETIC logic -- in particular the
HBM-windowed decode's window base/rebase math -- in the plain CPU suite,
so a logic regression fails fast without a chip.  (Bit-parity with XLA's
transcendentals is only asserted on hardware; interpret mode evaluates
the same formula with the same float ops on CPU, so round-trips against
the scan-path encoder are still exact here.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu


def _symbols(n, seed=5):
    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        lower_bin,
    )

    rng = np.random.default_rng(seed)
    means = rng.uniform(-2, 2, n).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n)).astype(np.float32)
    v = np.round(
        (means + scales * rng.logistic(0, 1, n).astype(np.float32)) * 256
    ).astype(np.int32)
    low = lower_bin(means)
    return np.clip(v, low, low + NBINS - 1), means, scales


@pytest.mark.parametrize("windowed", [False, True])
def test_decode_kernel_interpret_roundtrip(windowed):
    from finalproject_losslessimagecompression_tpu.codec import NBINS
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )
    from finalproject_losslessimagecompression_tpu.codec.cdf import GRID
    from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
        pallas_decode_core,
    )

    n, S = 4096, 128
    v, means, scales = _symbols(n)
    k = IL._plan_steps(n, S)
    buf, tot, hi, lo, *_ = IL._encode_scan(
        v, means, scales, S, k, False, None
    )

    def dec(buf, nw, hi, lo, m, s):
        mm = IL._layout(jnp.asarray(m, jnp.float32), n, S, k, IL.PAD_MEAN)
        ss = IL._layout(jnp.asarray(s, jnp.float32), n, S, k, IL.PAD_SCALE)
        lower = jnp.round(mm * jnp.float32(GRID)).astype(jnp.int32) - (
            jnp.int32(NBINS // 2)
        )
        return pallas_decode_core(
            buf, nw, hi, lo, mm, ss, lower, S, k, windowed=windowed
        )

    with pltpu.force_tpu_interpret_mode():
        vals, h2, l2 = dec(
            buf, tot.astype(jnp.int32), hi, lo, means, scales
        )
    assert np.array_equal(np.asarray(vals).reshape(-1)[:n], v)
    assert np.all(np.asarray(h2) == 1)
    assert np.all(np.asarray(l2) == 0)


def test_encode_kernel_interpret_matches_scan():
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )

    n, S = 4096, 128
    v, means, scales = _symbols(n, seed=9)
    k = IL._plan_steps(n, S)
    a = IL._encode_scan(v, means, scales, S, k, False, None)
    with pltpu.force_tpu_interpret_mode():
        b = IL._encode_core(v, means, scales, S, k, True, None)
    for x, y in zip(a[:4], b[:4]):
        assert bool(jnp.array_equal(x, y))
