"""Pallas rANS kernels: bit-parity with the lax.scan path (TPU only).

Kernels evaluate the quantized CDF in-kernel; the backend contract rests on
Mosaic's exp being bit-identical to XLA's on TPU, which test_exp_bit_parity
asserts directly (if it ever regresses, pallas_supported pairing keeps
each message decodable by its own backend, and these parity tests fail
loudly).  On CPU the Mosaic kernels cannot compile and these tests skip;
the driver's bench run exercises them on hardware every round as well."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only"
)


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


def _plan(n, requested=512):
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _plan_steps,
        pick_num_streams,
    )

    S = pick_num_streams(n, requested)
    return S, _plan_steps(n, S)


def test_exp_bit_parity():
    """Mosaic exp (and the whole CDF formula) must match XLA bitwise --
    the foundation of kernel<->scan stream compatibility."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from finalproject_losslessimagecompression_tpu.codec.cdf import (
        _HALF_BIN,
        _INV_GRID,
        _PMAX,
    )

    def formula(v, m, s, low):
        vf = v.astype(jnp.float32) * _INV_GRID
        t = (vf + _HALF_BIN - m) / s
        sig = jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-t))
        p1 = jnp.round(sig * _PMAX).astype(jnp.int32)
        return (p1 + v - low + jnp.int32(1)).astype(jnp.uint32)

    def kernel(v_ref, m_ref, s_ref, l_ref, out_ref):
        out_ref[...] = formula(v_ref[...], m_ref[...], s_ref[...], l_ref[...])

    n = 1 << 16
    rng = np.random.default_rng(0)
    m = rng.uniform(-4, 4, n).astype(np.float32).reshape(-1, 128)
    s = np.exp(rng.uniform(-9, 2, n).astype(np.float32)).reshape(-1, 128)
    low = np.round(m * 256).astype(np.int32) - 1024
    v = low + rng.integers(0, 2048, n).reshape(-1, 128).astype(np.int32)

    a = jax.jit(formula)(v, m, s, low)
    b = jax.jit(
        lambda v, m, s, l: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v.shape, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v, m, s, l)
    )(v, m, s, low)
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("seeded", [False, True])
def test_encode_matches_scan(seeded):
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _encode_scan,
    )
    from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
        pallas_supported,
    )

    n = 32768
    v, means, scales = _symbols(n)
    S, k = _plan(n)
    assert pallas_supported(S, k)
    seeds = (
        (np.arange(S, dtype=np.uint64) * np.uint64(2654435761))
        .astype(np.uint32)
        if seeded
        else None
    )
    a = _encode_scan(v, means, scales, S, k, False, seeds)
    b = _encode_scan(v, means, scales, S, k, True, seeds)
    for x, y in zip(a[:4], b[:4]):
        assert bool(jnp.array_equal(x, y))


@pytest.mark.parametrize("enc_pallas,dec_pallas",
                         [(False, True), (True, False), (True, True)])
def test_decode_cross_path(enc_pallas, dec_pallas):
    """Every encode/decode backend pairing round-trips bit-exactly and
    returns the state invariant (hi == 1, lo == 0)."""
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _decode_scan,
        _encode_scan,
    )

    n = 32768
    v, means, scales = _symbols(n, seed=7)
    S, k = _plan(n)
    buf, tot, hi, lo, *_ = _encode_scan(v, means, scales, S, k, enc_pallas,
                                        None)
    vals, h2, l2, _ = _decode_scan(
        buf, tot.astype(jnp.int32), hi, lo, means, scales, S, k, None, None,
        dec_pallas,
    )
    assert np.array_equal(np.asarray(vals), v)
    assert np.all(np.asarray(h2) == 1) and np.all(np.asarray(l2) == 0)


def test_seeded_decode_recovers_seeds():
    """Bits-back contract: a seeded pallas decode returns lo == seeds."""
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _decode_scan,
        _encode_scan,
    )

    n = 32768
    v, means, scales = _symbols(n, seed=9)
    S, k = _plan(n)
    seeds = (np.arange(S, dtype=np.uint64) * np.uint64(0x9E3779B9)).astype(
        np.uint32
    )
    buf, tot, hi, lo, *_ = _encode_scan(v, means, scales, S, k, True, seeds)
    vals, h2, l2, _ = _decode_scan(
        buf, tot.astype(jnp.int32), hi, lo, means, scales, S, k, None, None,
        True,
    )
    assert np.array_equal(np.asarray(vals), v)
    assert np.all(np.asarray(h2) == 1)
    assert np.array_equal(np.asarray(l2), seeds)


def test_default_on_public_api():
    """With no env override, supported shapes route through the kernels on
    TPU and round-trip via the public API."""
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved_decode,
        interleaved_encode,
    )
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _pallas_ok,
        _plan_steps,
    )

    n = 65536
    v, means, scales = _symbols(n, seed=11)
    enc = interleaved_encode(v, means, scales, num_streams=512)
    assert _pallas_ok(enc.num_streams, _plan_steps(n, enc.num_streams))
    dec, hi, lo = interleaved_decode(enc, means, scales)
    assert np.array_equal(np.asarray(dec), v)


def test_windowed_decode_large_message():
    """Messages whose word buffer exceeds the VMEM budget decode through
    the HBM-windowed kernel (VERDICT r2 item 5: the resident form capped
    Pallas decode at ~2.5M words; beyond it the decoder used to silently
    fall back to the scan path)."""
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _decode_scan,
        _encode_scan,
        _plan_steps,
    )
    from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
        _decode_resident_ok,
        pallas_supported,
    )

    n = 4 * 1024 * 1024
    v, means, scales = _symbols(n, seed=13)
    S = 8192
    k = _plan_steps(n, S)
    assert pallas_supported(S, k)
    assert not _decode_resident_ok(S, k)  # actually exercises the window
    buf, tot, hi, lo, *_ = _encode_scan(v, means, scales, S, k, True, None)
    vals, h2, l2, _ = _decode_scan(
        buf, tot.astype(jnp.int32), hi, lo, means, scales, S, k, None, None,
        True,
    )
    assert np.array_equal(np.asarray(vals), v)
    assert np.all(np.asarray(h2) == 1) and np.all(np.asarray(l2) == 0)


def test_windowed_decode_seeded():
    """Bits-back seeds survive the windowed form: lo returns to the seeds
    (the FlowCodec level-chaining contract) when the word buffer is
    decoded through the HBM-windowed kernel."""
    from finalproject_losslessimagecompression_tpu.codec.interleaved import (
        _layout,
        _encode_scan,
        _plan_steps,
        PAD_MEAN,
        PAD_SCALE,
    )
    from finalproject_losslessimagecompression_tpu.codec.cdf import GRID
    from finalproject_losslessimagecompression_tpu.codec import NBINS
    from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
        pallas_decode_core,
    )

    n, S = 262144, 512
    v, means, scales = _symbols(n, seed=17)
    k = _plan_steps(n, S)
    seeds = (np.arange(S, dtype=np.uint64) * np.uint64(0x9E3779B9)).astype(
        np.uint32
    )
    buf, tot, hi, lo, *_ = _encode_scan(v, means, scales, S, k, True, seeds)

    @jax.jit
    def dec(buf, nw, hi, lo, m, s):
        mm = _layout(jnp.asarray(m, jnp.float32), n, S, k, PAD_MEAN)
        ss = _layout(jnp.asarray(s, jnp.float32), n, S, k, PAD_SCALE)
        lower = jnp.round(mm * jnp.float32(GRID)).astype(jnp.int32) - (
            jnp.int32(NBINS // 2)
        )
        return pallas_decode_core(
            buf, nw, hi, lo, mm, ss, lower, S, k, windowed=True
        )

    vals, h2, l2 = dec(buf, tot.astype(jnp.int32), hi, lo, means, scales)
    assert np.array_equal(np.asarray(vals).reshape(-1)[:n], v)
    assert np.all(np.asarray(h2) == 1)
    assert np.array_equal(np.asarray(l2).reshape(-1), seeds)
