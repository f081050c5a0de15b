"""Serving-path roofline, round 5 (VERDICT r4 item 2): attribute the
serving pipeline's device time between the flow NN and the rANS coder,
then attack the dominant term.

BENCH_r04 phases for 64 flagship images: encode 0.100 s + decode 0.131 s
of device time (~3.6 ms/img round trip).  This script decomposes, all
value-fenced (utils/profiling.value_fence):
  nn_fwd      -- flows + priors forward (model.apply), the NN side of
                 compress;
  nn_inv      -- prior regeneration + inverse flows (mirrors
                 FlowCodec._decompress_all minus _decode_core), the NN
                 side of decompress;
  rans_enc    -- the per-level _encode_core calls alone, model-shaped
                 (n, S, k) per level, one fused program;
  rans_dec    -- same for _decode_core;
  compress_total / decompress_total -- the shipped fused pipelines.
Attribution closes if nn + rans ~= total per direction (the residual is
round/reshape/bits-back glue).

Improvement probe: the coder's stream count S trades per-stream scan
steps k against per-stream flush waste and (on the Pallas kernels) VMEM
residency; sweep num_streams over the serving pipeline and record the
throughput curve vs the shipped default (8192).

Usage:  python demo/run_serving_roofline_r05.py \
            [--out results/serving_roofline_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/serving_roofline_r05.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--queue", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--streams", default="4096,8192,16384")
    ap.add_argument("--quick", action="store_true",
                    help="small model (CPU smoke of the harness itself)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        enable_compile_cache,
        value_fence,
    )

    enable_compile_cache()
    from bench import _batches, build_model

    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )
    from finalproject_losslessimagecompression_tpu.models.exact import (
        FlowCodec,
    )
    from finalproject_losslessimagecompression_tpu.models.idflow import (
        IDFlow,
    )
    from finalproject_losslessimagecompression_tpu.ops.reshape import (
        depth_to_space,
    )

    cfg, model, params = build_model(args.quick)
    codec = FlowCodec(
        model, num_streams=8192, granularity="fused"
    )
    B = args.batch
    xs = _batches(B, args.queue)
    x = xs[0]
    n_img = B * args.queue

    # ---- NN forward (flows + priors): the compress-side NN ------------
    fwd = jax.jit(model.apply)
    out = fwd(params, x)
    value_fence(out)
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        for xb in xs:
            out = fwd(params, xb)
        value_fence(out)
        ts.append(time.time() - t0)
    t_nn_fwd = statistics.median(ts)
    # reference latents for the inverse check / rANS shapes: batch xs[0]
    latents, means, logscales = fwd(params, x)

    # ---- NN inverse (prior regen + inverse flows) ----------------------
    plans = codec.plans

    def nn_inv(params, lats):
        # mirrors _decompress_all minus _decode_core; the prior outputs
        # are returned (summed) so DCE cannot drop the prior convs that
        # the real decoder must run to parameterize the rANS CDFs
        x = None
        acc = jnp.float32(0)
        for level in range(cfg.nsplit - 1, -1, -1):
            p = plans[level]
            last = level == cfg.nsplit - 1
            ref = (jnp.zeros((B, p.h, p.w, p.z_ch), jnp.float32)
                   if last else x)
            mean, logscale = model.apply(
                params, ref, level, None, method=IDFlow.prior_params
            )
            acc = acc + jnp.sum(mean) + jnp.sum(logscale)
            z = lats[level]
            xi = z if last else jnp.concatenate([z, x], axis=-1)
            xi = model.apply(
                params, xi, level, method=IDFlow._flow_level_inverse
            )
            x = depth_to_space(xi, cfg.extend_scale)
        return x, acc

    inv = jax.jit(nn_inv)
    rec, _acc = inv(params, latents)
    value_fence(_acc)
    assert np.array_equal(np.asarray(rec), np.asarray(x)), (
        "NN inverse does not reconstruct the forward input"
    )
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        for _xb in xs:
            rec, _acc = inv(params, latents)
        value_fence((rec, _acc))
        ts.append(time.time() - t0)
    t_nn_inv = statistics.median(ts)

    # ---- rANS cores alone, model-shaped per level ----------------------
    # arrays are ARGUMENTS (not jit-closure constants, which XLA could
    # const-fold away); the static (S, k, use_pallas) plan is closed over
    statics, arrs = [], []
    for level in range(cfg.nsplit):
        p = plans[level]
        n = B * p.z_ch * p.h * p.w
        S = codec._level_S(level, B)
        k = codec._plan_steps(n, S)
        v = jnp.round(latents[level] * 256.0).astype(jnp.int32).reshape(-1)
        m = means[level].reshape(-1)
        s = jnp.exp(logscales[level]).reshape(-1)
        statics.append((S, k, IL._pallas_ok(S, k)))
        arrs.append((v, m, s))

    def rans_enc(arrs_):
        return tuple(
            IL._encode_core(v, m, s, S, k, up, None)
            for (v, m, s), (S, k, up) in zip(arrs_, statics)
        )

    enc_j = jax.jit(rans_enc)
    encs = enc_j(arrs)
    value_fence([e[0] for e in encs])
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        for _xb in xs:
            encs = enc_j(arrs)
        value_fence([e[0] for e in encs])
        ts.append(time.time() - t0)
    t_rans_enc = statistics.median(ts)

    dec_arrs = [
        (e[0], e[1].astype(jnp.int32), e[2], e[3], m, s)
        for (v, m, s), e in zip(arrs, encs)
    ]

    def rans_dec(dec_arrs_):
        return tuple(
            IL._decode_core(buf, tot, hi, lo, m, s, S, k, use_pallas=up)
            for (buf, tot, hi, lo, m, s), (S, k, up)
            in zip(dec_arrs_, statics)
        )

    dec_j = jax.jit(rans_dec)
    decs = dec_j(dec_arrs)
    value_fence([d[0] for d in decs])
    for (v, *_), d in zip(arrs, decs):
        assert np.array_equal(np.asarray(d[0]), np.asarray(v))
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        for _xb in xs:
            decs = dec_j(dec_arrs)
        value_fence([d[0] for d in decs])
        ts.append(time.time() - t0)
    t_rans_dec = statistics.median(ts)

    # ---- shipped fused pipelines (device time, no host pack) -----------
    per_batch = [codec._compress_deferred(params, xb) for xb in xs]
    value_fence([e.words for encs_, _ in per_batch for e in encs_])
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        per_batch = [codec._compress_deferred(params, xb) for xb in xs]
        value_fence([e.words for encs_, _ in per_batch for e in encs_])
        ts.append(time.time() - t0)
    t_comp_total = statistics.median(ts)

    from finalproject_losslessimagecompression_tpu.codec.container import (
        pack_streams_many,
    )

    flat = [e for encs_, _ in per_batch for e in encs_]
    blobs = pack_streams_many(flat)
    nseg = len(per_batch[0][0])
    packed = [
        (blobs[i * nseg : (i + 1) * nseg], info)
        for i, (_, info) in enumerate(per_batch)
    ]
    outs = [codec._decompress_deferred(params, b, i) for b, i in packed]
    value_fence([o for o, _ in outs])
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        outs = [codec._decompress_deferred(params, b, i) for b, i in packed]
        value_fence([o for o, _ in outs])
        ts.append(time.time() - t0)
    t_dec_total = statistics.median(ts)

    # ---- improvement probe 1: stream-count sweep over the pipeline -----
    # NOTE: pick_num_streams caps each level's effective stream count at
    # n_level / sym_per_stream (flush-waste bound), so at this batch size
    # the requested values may all resolve to the SAME effective plan --
    # eff_S below records it, and identical eff_S rows differ by noise
    # only.  That itself is a roofline finding: rANS parallelism is not
    # the knob, the NN is the critical path.
    def eff_streams(c):
        return [c._level_S(level, B) for level in range(cfg.nsplit)]

    sweep = {}
    for S0 in [int(s) for s in args.streams.split(",") if s]:
        c2 = FlowCodec(model, num_streams=S0, granularity="fused")
        pb = [c2._compress_deferred(params, xb) for xb in xs]
        value_fence([e.words for encs_, _ in pb for e in encs_])
        fl = [e for encs_, _ in pb for e in encs_]
        bl = pack_streams_many(fl)
        pk = [
            (bl[i * nseg : (i + 1) * nseg], info)
            for i, (_, info) in enumerate(pb)
        ]
        oo = [c2._decompress_deferred(params, b, i) for b, i in pk]
        value_fence([o for o, _ in oo])
        c2._check_oks([ok for _, oks in oo for ok in oks])
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            pb = [c2._compress_deferred(params, xb) for xb in xs]
            value_fence([e.words for encs_, _ in pb for e in encs_])
            oo = [c2._decompress_deferred(params, b, i) for b, i in pk]
            value_fence([o for o, _ in oo])
            ts.append(time.time() - t0)
        dt = statistics.median(ts)
        bpd = float(np.mean(
            [c2.real_bpd(b, i) for b, i in pk]
        ))
        sweep[S0] = {
            "roundtrip_device_s": round(dt, 4),
            "imgs_per_s": round(n_img / dt, 1),
            "real_bpd": round(bpd, 4),
            "effective_level_streams": eff_streams(c2),
        }
        print("num_streams", S0, sweep[S0])

    # ---- improvement probe 2: bfloat16 serving variant ------------------
    # The pipeline is NN-bound (phases above); if the 26%-MFU parity NN is
    # HBM-bound, bf16 activations halve the conv stack's traffic.  Not the
    # same float function (latents differ), but a valid serving variant:
    # coding stays bit-exact under the shared-executable contract and the
    # rate is re-measured.
    bf16_probe = None
    try:
        from bench import build_model as _bm

        _, bmodel, _ = _bm(args.quick, bf16=True)
        # same trained params (f32) run through the bf16-compute stack
        cb = FlowCodec(bmodel, num_streams=8192, granularity="fused")
        pb = [cb._compress_deferred(params, xb) for xb in xs]
        value_fence([e.words for encs_, _ in pb for e in encs_])
        fl = [e for encs_, _ in pb for e in encs_]
        bl = pack_streams_many(fl)
        nsegb = len(pb[0][0])
        pk = [
            (bl[i * nsegb : (i + 1) * nsegb], info)
            for i, (_, info) in enumerate(pb)
        ]
        oo = [cb._decompress_deferred(params, b, i) for b, i in pk]
        value_fence([o for o, _ in oo])
        cb._check_oks([ok for _, oks in oo for ok in oks])
        exact = all(
            bool(np.array_equal(np.asarray(o), np.asarray(xb)))
            for (o, _), xb in zip(oo, xs)
        )
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            pb = [cb._compress_deferred(params, xb) for xb in xs]
            value_fence([e.words for encs_, _ in pb for e in encs_])
            oo = [cb._decompress_deferred(params, b, i) for b, i in pk]
            value_fence([o for o, _ in oo])
            ts.append(time.time() - t0)
        dt = statistics.median(ts)
        bf16_probe = {
            "roundtrip_device_s": round(dt, 4),
            "imgs_per_s": round(n_img / dt, 1),
            "real_bpd": round(float(np.mean(
                [cb.real_bpd(b, i) for b, i in pk]
            )), 4),
            "bit_exact": exact,
        }
        print("bf16 probe", bf16_probe)
    except Exception as e:  # record rather than fail the roofline
        bf16_probe = {"error": repr(e)[:300]}

    res = {
        "what": "serving-path roofline: device time attribution between "
                "flow NN and rANS for one queue pass "
                f"({n_img} flagship images), value-fenced medians",
        "hardware": jax.devices()[0].device_kind,
        "batch": B, "queue": args.queue,
        "phases_s": {
            "nn_fwd": round(t_nn_fwd, 4),
            "nn_inv": round(t_nn_inv, 4),
            "rans_enc": round(t_rans_enc, 4),
            "rans_dec": round(t_rans_dec, 4),
            "compress_total": round(t_comp_total, 4),
            "decompress_total": round(t_dec_total, 4),
        },
        "attribution": {
            "encode_nn_plus_rans_s": round(t_nn_fwd + t_rans_enc, 4),
            "decode_nn_plus_rans_s": round(t_nn_inv + t_rans_dec, 4),
            "encode_residual_s": round(
                t_comp_total - t_nn_fwd - t_rans_enc, 4
            ),
            "decode_residual_s": round(
                t_dec_total - t_nn_inv - t_rans_dec, 4
            ),
        },
        "stream_sweep": sweep,
        "bf16_serving_probe": bf16_probe,
        "nn_inverse_reconstructs": True,
    }
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("what",)}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
