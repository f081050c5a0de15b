"""Benchmark: end-to-end lossless compress+decompress throughput on the
current accelerator, verified bit-exact, vs the reference-design baseline
(single-threaded C++ rANS, the reference's CPU coder architecture --
rans/rans.pyx compiled; here our native/rans.cpp single-stream port).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric (BASELINE.json): images/s/chip encode+decode on
ImageNet64-sized inputs, bit-exact round-trip required.  The DEFAULT model
is the flagship ImageNet64-class config (reference configs/imagenet64.yaml:
nflows=8, nsplit=3, growth 512, depth 12); --quick selects a small model
for fast iteration.  Also reported: per-phase wall-clock split, device
codec throughput for BOTH backends (Pallas kernels vs the lax.scan path),
and non-pipelined single-image latency (vs the serial C++ coder's
single-image time -- the reference architecture's latency floor).
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def _fence(x):
    """The repo's canonical value fence (see utils/profiling.value_fence):
    jax.block_until_ready can return before remote execution completes on
    the tunnel runtime, so every timed region here syncs by fetching one
    element's VALUE.  Warm it on same-shaped data before any timed region
    (its eager ravel/slice pays a one-time per-shape remote compile)."""
    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        value_fence,
    )

    return value_fence(x)


def build_model(quick: bool, seed: int = 0, bf16: bool = False):
    import jax
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.models import (
        CouplingCfg,
        DenseBlockCfg,
        FlowCfg,
        IDFlow,
    )

    dt = "bfloat16" if bf16 else "float32"
    if quick:
        cfg = FlowCfg(
            H=64, W=64, C=3, nflows=2, nsplit=2,
            couple=CouplingCfg(0.75, DenseBlockCfg(32, 2, "LeakyReLU", dt)),
            prior_nn=DenseBlockCfg(32, 2, "LeakyReLU", dt),
        )
    else:
        # flagship: reference configs/imagenet64.yaml scale
        # (nflows=8, nsplit=3, growth 512/512, depth 12/12)
        cfg = FlowCfg(
            H=64, W=64, C=3, nflows=8, nsplit=3,
            couple=CouplingCfg(0.75, DenseBlockCfg(512, 12, "ReLU", dt)),
            prior_nn=DenseBlockCfg(512, 12, "ReLU", dt),
        )
    model = IDFlow(cfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        np.round(rng.uniform(0, 1, (1, 64, 64, 3)) * 256).astype(np.float32)
        / 256.0
    )
    # jit the init: eager flax init pays one tunnel RT per op (minutes
    # for the flagship model; cli/codec.py measured ~335 s eager)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return cfg, model, params


def _batches(batch: int, queue: int, seed: int = 1):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(
            np.round(rng.uniform(0, 1, (batch, 64, 64, 3)) * 256).astype(
                np.float32
            )
            / 256.0
        )
        for _ in range(queue)
    ]


def bench_e2e(cfg, model, params, batch: int, iters: int, queue: int = 4):
    """Pipelined serving round trip: a queue of `queue` batches is
    compressed with compress_many (one host sync packs every container)
    and decoded with decompress_many (one sync verifies every state
    invariant).  Median-of-iters timing -- the remote tunnel's latency
    variance otherwise dominates single measurements."""
    import math

    import jax

    from finalproject_losslessimagecompression_tpu.models import FlowCodec
    from finalproject_losslessimagecompression_tpu.models.idflow import (
        log_likelihood,
    )

    xs = _batches(batch, queue)
    codec = FlowCodec(model, num_streams=8192)
    # warmup (compiles)
    packed = codec.compress_many(params, xs)
    recs = codec.decompress_many(params, packed, fetch=True)
    exact = all(
        bool(np.array_equal(np.asarray(r), np.asarray(x)))
        for r, x in zip(recs, xs)
    )
    bpd = float(
        np.mean([codec.real_bpd(blobs, info) for blobs, info in packed])
    )

    import jax.numpy as jnp

    @jax.jit
    def _loss(params, batch):
        latents, means, logscales = model.apply(params, batch)
        lp, _ = log_likelihood(model.cfg, latents, means, logscales)
        return -jnp.mean(lp)  # nats/dim

    analytic_bpd = float(_loss(params, xs[0])) / math.log(2.0)

    times = []
    for _ in range(iters):
        t0 = time.time()
        packed = codec.compress_many(params, xs)
        recs = codec.decompress_many(params, packed, fetch=True)
        times.append(time.time() - t0)
    dt = statistics.median(times)

    # per-phase split for one queue pass: NN+rANS dispatch vs host pack
    # (encode), decode dispatch vs invariant sync (decode)
    from finalproject_losslessimagecompression_tpu.codec.container import (
        pack_streams_many,
    )

    # warm pass: dispatches everything once so the fences' one-time
    # eager-op compiles (see _fence) happen OUTSIDE the timed phases
    per_batch = [codec._compress_deferred(params, x) for x in xs]
    flat = [e for encs, _ in per_batch for e in encs]
    _fence([e.words for e in flat])
    warm_blobs = pack_streams_many(flat)
    n = len(per_batch[0][0])
    warm_packed = [
        (warm_blobs[i * n : (i + 1) * n], info)
        for i, (_, info) in enumerate(per_batch)
    ]
    outs = [codec._decompress_deferred(params, b, i) for b, i in warm_packed]
    _fence([x for x, _ in outs])
    codec._check_oks([ok for _, oks in outs for ok in oks])

    t0 = time.time()
    per_batch = [codec._compress_deferred(params, x) for x in xs]
    flat = [e for encs, _ in per_batch for e in encs]
    _fence([e.words for e in flat])
    t_enc_device = time.time() - t0
    t0 = time.time()
    blobs = pack_streams_many(flat)
    t_pack = time.time() - t0
    n = len(per_batch[0][0])
    packed2 = [
        (blobs[i * n : (i + 1) * n], info)
        for i, (_, info) in enumerate(per_batch)
    ]
    t0 = time.time()
    outs = [codec._decompress_deferred(params, b, i) for b, i in packed2]
    _fence([x for x, _ in outs])
    t_dec_device = time.time() - t0
    t0 = time.time()
    codec._check_oks([ok for _, oks in outs for ok in oks])
    t_verify = time.time() - t0
    phases = {
        "encode_device_s": round(t_enc_device, 4),
        "pack_host_s": round(t_pack, 4),
        "decode_device_s": round(t_dec_device, 4),
        "verify_sync_s": round(t_verify, 4),
    }
    return queue * batch / dt, exact, bpd, analytic_bpd, phases


def bench_single_image_latency(cfg, model, params, iters: int = 20):
    """Non-pipelined single-image compress -> decompress wall clock (the
    serving latency floor; dominated by dispatch/sync on remote tunnels).
    Compared against the reference architecture's floor: the serial C++
    coder's encode+decode time for one image's symbols."""
    import jax

    from finalproject_losslessimagecompression_tpu.models import FlowCodec

    x = _batches(1, 1, seed=3)[0]
    codec = FlowCodec(model, num_streams=8192)
    blobs, info = codec.compress(params, x)  # warm compile
    rec = codec.decompress(params, blobs, info, fetch=True)
    assert np.array_equal(np.asarray(rec), np.asarray(x))
    times = []
    for _ in range(iters):
        t0 = time.time()
        blobs, info = codec.compress(params, x)
        rec = codec.decompress(params, blobs, info, fetch=True)
        times.append(time.time() - t0)

    # the tunnel round-trip floor: a compress (1 blocking fetch in
    # pack_streams_many) + decompress (1 blocking fetch of data+invariants)
    # cannot beat ~2 host<->device round trips regardless of compute
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1)
    z = jax.block_until_ready(f(jnp.zeros(())))
    rts = []
    for _ in range(10):
        # a FRESH dispatch + result fetch each sample (a fetched jax.Array
        # caches its host value, so re-fetching z would measure nothing)
        t0 = time.time()
        z = jax.device_get(f(z))
        rts.append(time.time() - t0)
        z = jnp.asarray(z)
    rt = statistics.median(rts)
    return statistics.median(times), rt


def bench_train_mfu(cfg, model, params, batch: int, steps: int = 10,
                    windows: int = 3):
    """Flagship train-step wall clock + model FLOPs -> achieved TFLOP/s and
    MFU (fraction of the chip's matmul peak).  FLOPs come from XLA's own
    cost analysis of the compiled step (includes fwd+bwd+optimizer),
    cross-checked against an analytic conv-MAC hand count
    (results/mfu_roofline_r04.json).

    TWO timings, both medians over `windows` windows, both fenced by a
    VALUE fetch (float(loss)) -- jax.block_until_ready has been observed
    to return before remote execution completes on the tunnel runtime
    (r3's '17.9 ms / 68% MFU' roofline was this artifact: the same
    'timing' reported a 20.7-TFLOP variant at 5.6x the chip's peak; only
    a value fetch is a trustworthy fence, see CLAUDE.md):
    - train_step_time_ms: host-observed loop of single-step dispatches --
      what a naive per-step training loop pays (includes ~one tunnel
      dispatch per step of host overhead);
    - train_step_time_device_ms: `steps` steps inside ONE lax.scan'd
      program (make_multi_train_step) -- pure device compute, one
      dispatch per window; this is the MFU numerator and also the real
      trainer fast path (Trainer steps_per_dispatch).

    MFU denominator: the chip's bf16 matmul peak for BOTH dtypes.  Under
    JAX's default matmul precision, float32-parameter convs execute on
    the MXU with bfloat16 multiplies (f32 accumulate) -- one MXU pass,
    the same rate as an explicit bf16 model -- so the bf16 peak is the
    physically correct ceiling for the f32 configs too."""
    import jax.numpy as jnp
    import optax

    from finalproject_losslessimagecompression_tpu.train.trainer import (
        make_multi_train_step,
        make_train_step,
    )
    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        compiled_flops,
        device_peak_tflops,
    )

    opt = optax.adamax(1e-4)
    opt_state = opt.init(params)
    step_fn, _ = make_train_step(model, opt)
    multi = make_multi_train_step(model, opt, steps)
    x = _batches(batch, 1, seed=5)[0]
    xs = jnp.stack([x] * steps)
    flops = compiled_flops(step_fn, params, opt_state, x)
    flops_multi = compiled_flops(multi, params, opt_state, xs)
    # warmup (compile + cache); both programs donate, so thread state
    for _ in range(2):
        params, opt_state, loss, _ = step_fn(params, opt_state, x)
    float(loss)  # value fence
    host_w = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, loss, _ = step_fn(params, opt_state, x)
        float(loss)  # value fence
        host_w.append((time.time() - t0) / steps)
    params, opt_state, losses = multi(params, opt_state, xs)  # warm compile
    float(losses[-1])
    dev_w = []
    for _ in range(windows):
        t0 = time.time()
        params, opt_state, losses = multi(params, opt_state, xs)
        float(losses[-1])  # value fence
        dev_w.append((time.time() - t0) / steps)
    dt_host = statistics.median(host_w)
    dt_dev = statistics.median(dev_w)
    spread = (max(dev_w) - min(dev_w)) / dt_dev if dt_dev else 0.0
    out = {
        "train_step_time_ms": round(dt_host * 1e3, 2),
        "train_step_time_device_ms": round(dt_dev * 1e3, 2),
        "train_dispatch_overhead_ms": round((dt_host - dt_dev) * 1e3, 2),
        "train_step_time_windows_ms": [round(t * 1e3, 2) for t in host_w],
        "train_step_device_windows_ms": [round(t * 1e3, 2) for t in dev_w],
        "train_step_time_spread_pct": round(100.0 * spread, 1),
    }
    # XLA cost analysis counts a lax.scan body ONCE (trip count is not
    # folded in at the HLO level), so flops_multi is already ~per-step;
    # prefer the single-step program's count (it includes the aux terms)
    step_flops = flops or flops_multi
    if step_flops:
        tflops = step_flops / dt_dev / 1e12
        out["train_flops_per_step"] = step_flops
        out["train_achieved_tflops"] = round(tflops, 2)
        peak = device_peak_tflops()
        if peak:
            out["train_mfu_pct"] = round(100.0 * tflops / peak, 2)
            out["train_mfu_host_pct"] = (
                round(100.0 * step_flops / dt_host / 1e12 / peak, 2)
            )
            out["mfu_peak_tflops_bf16"] = peak
            out["mfu_note"] = (
                "MFU from the scanned device-side step time, value-"
                "fenced; denominator is the bf16 MXU peak for all "
                "dtypes (JAX default matmul precision runs f32 convs "
                "as one bf16 MXU pass, f32 accumulate)"
            )
    return out


def bench_codec_only(n_symbols: int, iters: int):
    """Raw interleaved-rANS symbol throughput (encode+decode) on device,
    for BOTH backends: Pallas kernels (default on TPU) and the lax.scan
    path; plus the host-in-the-loop rate (numpy in, containers out)."""
    import jax
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        interleaved_decode,
        interleaved_encode,
        lower_bin,
    )
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )

    rng = np.random.default_rng(2)
    means = rng.uniform(-2, 2, n_symbols).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n_symbols)).astype(np.float32)
    raw = means + scales * rng.logistic(0, 1, n_symbols).astype(np.float32)
    v = np.round(raw * 256).astype(np.int32)
    low = lower_bin(means)
    v = np.clip(v, low, low + NBINS - 1)

    enc = interleaved_encode(v, means, scales, num_streams=8192)
    dec, hi, lo = interleaved_decode(enc, means, scales)
    assert np.array_equal(np.asarray(dec), v)
    _fence(dec)  # warm the fence's eager ops (one-time remote compile)

    # host-in-the-loop throughput
    t0 = time.time()
    for _ in range(iters):
        enc = interleaved_encode(v, means, scales, num_streams=8192)
        dec, hi, lo = interleaved_decode(enc, means, scales)
    _fence(dec)
    host_rate = n_symbols / ((time.time() - t0) / iters)

    # device-resident throughput per backend
    S = enc.num_streams
    k = IL._plan_steps(n_symbols, S)
    vd, md, sd = jnp.asarray(v), jnp.asarray(means), jnp.asarray(scales)
    jax.block_until_ready((vd, md, sd))
    rates = {}
    backends = {"scan": False}
    if IL._pallas_ok(S, k):
        backends["pallas"] = True
    for name, up in backends.items():
        be, tot, bh, bl, *_ = IL._encode_scan(vd, md, sd, S, k, up, None)
        vals, h2, l2, _ = IL._decode_scan(
            be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None, None, up
        )
        assert np.array_equal(np.asarray(vals), v)
        _fence(vals)  # warm the fence's eager ops before timing
        dev_iters = max(iters * 5, 10)
        t0 = time.time()
        for _ in range(dev_iters):
            be, tot, bh, bl, *_ = IL._encode_scan(vd, md, sd, S, k, up, None)
            vals, h2, l2, _ = IL._decode_scan(
                be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None, None,
                up,
            )
        _fence(vals)
        rates[name] = n_symbols / ((time.time() - t0) / dev_iters)
    return host_rate, rates, (v, means, scales)


def bench_codec_device_large(n_symbols: int, iters: int = 3):
    """Device-resident codec throughput at LARGE message size (the word
    buffer exceeds the Pallas decode VMEM budget, so the kernel path runs
    the HBM-windowed form) -- the crossover check vs the scan path that
    VERDICT r2 item 5 asked for.  Returns {backend: sym/s} plus whether
    the windowed form was actually exercised."""
    import jax
    import jax.numpy as jnp

    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        lower_bin,
    )
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )

    rng = np.random.default_rng(4)
    means = rng.uniform(-2, 2, n_symbols).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n_symbols)).astype(np.float32)
    raw = means + scales * rng.logistic(0, 1, n_symbols).astype(np.float32)
    v = np.round(raw * 256).astype(np.int32)
    low = lower_bin(means)
    v = np.clip(v, low, low + NBINS - 1)
    S = 8192
    k = IL._plan_steps(n_symbols, S)
    vd, md, sd = jnp.asarray(v), jnp.asarray(means), jnp.asarray(scales)
    jax.block_until_ready((vd, md, sd))
    rates = {}
    backends = {"scan": False}
    windowed = None
    if IL._pallas_ok(S, k):
        backends["pallas"] = True
        from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
            _decode_resident_ok,
        )

        windowed = not _decode_resident_ok(S, k)
    for name, up in backends.items():
        be, tot, bh, bl, *_ = IL._encode_scan(vd, md, sd, S, k, up, None)
        vals, h2, l2, _ = IL._decode_scan(
            be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None, None, up
        )
        assert np.array_equal(np.asarray(vals), v), name
        _fence(vals)  # warm the fence's eager ops before timing
        t0 = time.time()
        for _ in range(iters):
            be, tot, bh, bl, *_ = IL._encode_scan(vd, md, sd, S, k, up, None)
            vals, h2, l2, _ = IL._decode_scan(
                be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None, None,
                up,
            )
        _fence(vals)
        rates[name] = n_symbols / ((time.time() - t0) / iters)
    return rates, windowed


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
    ap.add_argument("--quick", action="store_true",
                    help="small model for fast iteration (the default is "
                    "the flagship ImageNet64-class config)")
    ap.add_argument("--full", action="store_true",
                    help="(default) flagship model; kept for back-compat")
    ap.add_argument("--batch", type=int, default=0,
                    help="images per batch (default 64 quick / 16 full)")
    ap.add_argument("--queue", type=int, default=4,
                    help="pipelined batches per serving iteration")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bf16", action="store_true", default=True,
                    help="(default) compute the coupling/prior conv "
                    "stacks in bfloat16 (MXU-native; coding stays "
                    "bit-exact -- asserted every run, and containers "
                    "are identical to the f32 variant's).  Measured "
                    "+11.4%% e2e same-session vs f32 "
                    "(results/serving_roofline_r05.json)")
    ap.add_argument("--f32", action="store_true",
                    help="compute the conv stacks in float32 instead")
    args = ap.parse_args()
    if args.f32:
        args.bf16 = False
    quick = args.quick and not args.full
    batch = args.batch or (64 if quick else 16)

    platform = jax.devices()[0].platform

    cfg, model, params = build_model(quick, bf16=args.bf16)
    imgs_per_s, exact, bpd, analytic_bpd, phases = bench_e2e(
        cfg, model, params, batch, args.iters, args.queue
    )
    latency_s, tunnel_rt_s = bench_single_image_latency(cfg, model, params)
    mfu = bench_train_mfu(cfg, model, params, batch)
    n_sym = 96 * 64 * 64 * 3  # production-scale message (~1.2M symbols)
    sym_per_s, dev_rates, (v, m, s) = bench_codec_only(n_sym, args.iters)
    # large message: word buffer beyond the Pallas VMEM budget -> the
    # kernel path runs HBM-windowed; compare against the scan path there
    n_large = 8 * 1024 * 1024
    large_rates, large_windowed = bench_codec_device_large(n_large)
    base = bench_native_baseline(v, m, s)
    dev_best = max(dev_rates.values())
    vs_baseline = (dev_best / base) if base else None
    # reference-architecture latency floor: serial C++ coder on one image's
    # symbols (no NN -- a lower bound for the reference design)
    sym_per_img = 64 * 64 * 3
    native_img_latency = (2.0 * sym_per_img / base) if base else None

    out = {
        "metric": "e2e_encode_decode_throughput",
        "value": round(imgs_per_s, 3),
        "unit": "images/s/chip (64x64x3, bit-exact)",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "bit_exact": exact,
        "real_bpd": round(bpd, 4),
        "analytic_bpd": round(analytic_bpd, 4),
        "single_image_latency_ms": round(latency_s * 1e3, 2),
        # compress + decompress each carry one mandatory blocking
        # host<->device round trip; 2x the measured tunnel RT is the
        # architecture's latency floor on this runtime
        "tunnel_rt_ms": round(tunnel_rt_s * 1e3, 2),
        "latency_floor_ms": round(2 * tunnel_rt_s * 1e3, 2),
        # the 2-RT floor counts only the two blocking fetches; each
        # direction also pays its dispatch SEND (~0.5 RT) before the
        # device can start, so the realistic architecture floor is ~3 RT
        # -- measured latency sits at floor + ~0.8 RT across sessions
        "latency_floor_3rt_ms": round(3 * tunnel_rt_s * 1e3, 2),
        "native_single_image_ms": (
            round(native_img_latency * 1e3, 2) if base else None
        ),
        **mfu,
        "codec_sym_per_s": round(sym_per_s, 1),
        "codec_device_sym_per_s": round(dev_best, 1),
        "codec_device_scan_sym_per_s": round(dev_rates["scan"], 1),
        "codec_device_pallas_sym_per_s": (
            round(dev_rates["pallas"], 1) if "pallas" in dev_rates else None
        ),
        "native_baseline_sym_per_s": round(base, 1) if base else None,
        "codec_large_n_sym": n_large,
        "codec_large_scan_sym_per_s": round(large_rates["scan"], 1),
        "codec_large_pallas_sym_per_s": (
            round(large_rates["pallas"], 1)
            if "pallas" in large_rates else None
        ),
        "codec_large_pallas_windowed": large_windowed,
        "phases": phases,
        "batch": batch,
        "queue": args.queue,
        "platform": platform,
        "quick": quick,
        "bf16": args.bf16,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
