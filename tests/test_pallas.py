"""Pallas rANS kernel: bit-parity with the lax.scan path (TPU only).

The kernel consumes the same XLA-precomputed (cdf, freq) tiles as the scan
path, so its streams must be bit-identical; on CPU the kernel is not
compiled and these tests skip (the CI mesh is CPU -- the driver's bench run
exercises this on hardware every round as well)."""

import numpy as np
import pytest

import jax


pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernel is TPU-only"
)


def test_pallas_matches_scan():
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        lower_bin,
    )
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _encode_scan,
        _plan_steps,
        pick_num_streams,
    )

    n = 32768
    rng = np.random.default_rng(5)
    means = rng.uniform(-2, 2, n).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n)).astype(np.float32)
    v = np.round(
        (means + scales * rng.logistic(0, 1, n).astype(np.float32)) * 256
    ).astype(np.int32)
    low = lower_bin(means)
    v = np.clip(v, low, low + NBINS - 1)
    S = pick_num_streams(n, 4096)
    k = _plan_steps(n, S)
    if S % 128 != 0:
        pytest.skip("stream count not lane-aligned")
    a = _encode_scan(v, means, scales, S, k, False)
    b = _encode_scan(v, means, scales, S, k, True)
    for x, y in zip(a[:4], b[:4]):
        assert bool(jnp.array_equal(x, y))
