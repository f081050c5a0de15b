"""Benchmark: end-to-end lossless compress+decompress throughput on the
current accelerator, verified bit-exact, vs the reference-design baseline
(single-threaded C++ rANS, the reference's CPU coder architecture --
rans/rans.pyx compiled; here our native/rans.cpp single-stream port).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric (BASELINE.json): images/s/chip encode+decode on
ImageNet64-sized inputs, bit-exact round-trip required.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_model(quick: bool):
    import jax
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.models import (
        CouplingCfg,
        DenseBlockCfg,
        FlowCfg,
        FlowCodec,
        IDFlow,
    )

    if quick:
        cfg = FlowCfg(
            H=64, W=64, C=3, nflows=2, nsplit=2,
            couple=CouplingCfg(0.75, DenseBlockCfg(32, 2, "LeakyReLU")),
            prior_nn=DenseBlockCfg(32, 2, "LeakyReLU"),
        )
    else:
        # ImageNet64-class model (reference: configs/imagenet64.yaml scale)
        cfg = FlowCfg(
            H=64, W=64, C=3, nflows=8, nsplit=3,
            couple=CouplingCfg(0.75, DenseBlockCfg(128, 4, "LeakyReLU")),
            prior_nn=DenseBlockCfg(128, 4, "LeakyReLU"),
        )
    model = IDFlow(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.round(rng.uniform(0, 1, (1, 64, 64, 3)) * 256).astype(np.float32)
        / 256.0
    )
    import jax

    params = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, params


def bench_e2e(cfg, model, params, batch: int, iters: int, queue: int = 4):
    """Pipelined serving round trip: a queue of `queue` batches is
    compressed with compress_many (one host sync packs every container)
    and decoded with decompress_many (one sync verifies every state
    invariant).  Median-of-iters timing -- the remote tunnel's latency
    variance otherwise dominates single measurements."""
    import statistics

    import jax
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.models import FlowCodec

    rng = np.random.default_rng(1)
    xs = [
        jnp.asarray(
            np.round(rng.uniform(0, 1, (batch, 64, 64, 3)) * 256).astype(
                np.float32
            )
            / 256.0
        )
        for _ in range(queue)
    ]
    codec = FlowCodec(model, num_streams=8192)
    # warmup (compiles)
    packed = codec.compress_many(params, xs)
    recs = codec.decompress_many(params, packed)
    exact = all(
        bool(np.array_equal(np.asarray(r), np.asarray(x)))
        for r, x in zip(recs, xs)
    )
    bpd = float(
        np.mean([codec.real_bpd(blobs, info) for blobs, info in packed])
    )

    # analytic bpd for the codec-overhead gap
    import math

    from finalproject_losslessimagecompression_tpu.models.idflow import (
        log_likelihood,
    )

    @jax.jit
    def _loss(params, batch):
        latents, means, logscales = model.apply(params, batch)
        lp, _ = log_likelihood(cfg, latents, means, logscales)
        return -jnp.mean(lp)

    analytic_bpd = float(_loss(params, xs[0])) / math.log(2.0)

    times = []
    for _ in range(iters):
        t0 = time.time()
        packed = codec.compress_many(params, xs)
        recs = codec.decompress_many(params, packed)
        jax.block_until_ready(recs[-1])
        times.append(time.time() - t0)
    dt = statistics.median(times)
    return queue * batch / dt, exact, bpd, analytic_bpd


def bench_codec_only(n_symbols: int, iters: int):
    """Raw interleaved-rANS symbol throughput (encode+decode), device."""
    import jax

    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved_decode,
        interleaved_encode,
    )

    rng = np.random.default_rng(2)
    means = rng.uniform(-2, 2, n_symbols).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n_symbols)).astype(np.float32)
    raw = means + scales * rng.logistic(0, 1, n_symbols).astype(np.float32)
    v = np.round(raw * 256).astype(np.int32)
    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        lower_bin,
    )

    low = lower_bin(means)
    v = np.clip(v, low, low + NBINS - 1)

    enc = interleaved_encode(v, means, scales, num_streams=8192)
    dec, hi, lo = interleaved_decode(enc, means, scales)
    assert np.array_equal(np.asarray(dec), v)

    # host-in-the-loop throughput (numpy in, containers out)
    t0 = time.time()
    for _ in range(iters):
        enc = interleaved_encode(v, means, scales, num_streams=8192)
        dec, hi, lo = interleaved_decode(enc, means, scales)
    jax.block_until_ready(dec)
    dt = (time.time() - t0) / iters
    host_rate = n_symbols / dt

    # device-resident throughput (data already on device, pipelined --
    # what a fused serving pipeline sees)
    import jax.numpy as jnp

    vd = jnp.asarray(v)
    md = jnp.asarray(means)
    sd = jnp.asarray(scales)
    jax.block_until_ready((vd, md, sd))
    dev_iters = max(iters * 5, 10)
    t0 = time.time()
    for _ in range(dev_iters):
        enc = interleaved_encode(vd, md, sd, num_streams=8192)
        dec, hi, lo = interleaved_decode(enc, md, sd)
    jax.block_until_ready(dec)
    dev_rate = n_symbols / ((time.time() - t0) / dev_iters)
    return host_rate, dev_rate, (v, means, scales)


def bench_native_baseline(v, means, scales, max_n: int = 300000):
    """Reference-design baseline: single-threaded C++ serial rANS
    (measured on a slice and reported per-symbol)."""
    from finalproject_losslessimagecompression_tpu import native

    if not native.available():
        return None
    v, means, scales = v[:max_n], means[:max_n], scales[:max_n]
    t0 = time.time()
    state, words = native.encode_single(v, means, scales)
    st2, dec = native.decode_single(
        state, words, len(v), means[::-1], scales[::-1]
    )
    dt = time.time() - t0
    assert st2 == (1 << 32) and np.array_equal(dec[::-1], v)
    return len(v) / dt


def main():
    # persistent compilation cache: the fused compress/decompress programs
    # are expensive to compile (remote-compile environments especially);
    # cache them across runs
    import os

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="ImageNet64-class model (long compile)")
    ap.add_argument("--quick", action="store_true",
                    help="alias for the default small model")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--queue", type=int, default=4,
                    help="pipelined batches per serving iteration")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    platform = jax.devices()[0].platform

    cfg, model, params = build_model(not args.full)
    imgs_per_s, exact, bpd, analytic_bpd = bench_e2e(
        cfg, model, params, args.batch, args.iters, args.queue
    )
    n_sym = 96 * 64 * 64 * 3  # production-scale message (~1.2M symbols)
    sym_per_s, dev_sym_per_s, (v, m, s) = bench_codec_only(n_sym, args.iters)
    base = bench_native_baseline(v, m, s)
    vs_baseline = (dev_sym_per_s / base) if base else None

    out = {
        "metric": "e2e_encode_decode_throughput",
        "value": round(imgs_per_s, 3),
        "unit": "images/s/chip (64x64x3, bit-exact)",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "bit_exact": exact,
        "real_bpd": round(bpd, 4),
        "analytic_bpd": round(analytic_bpd, 4),
        "codec_sym_per_s": round(sym_per_s, 1),
        "codec_device_sym_per_s": round(dev_sym_per_s, 1),
        "native_baseline_sym_per_s": round(base, 1) if base else None,
        "platform": platform,
        "quick": not args.full,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
