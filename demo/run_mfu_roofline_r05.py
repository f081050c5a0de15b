"""MFU roofline, round 5: the FUNCTION-PRESERVING throughput attack on the
parity family (VERDICT r4 item 3).

r4 established (value-fenced): the parity flagship sustains ~26% MFU and
the SAME framework sustains 54% once growth is lane-padded -- but the 54%
row was a different (randomly initialized, non-parity) function.  This
experiment runs the PARITY FUNCTION through the lane-padded architecture:
`pad_growth_params` zero-pads a parity checkpoint into the
`growth_multiple=m` architecture, computing the same function (padded
channels carry exact zeros; models/layers.py docstring), so any wall-clock
change is a free win (or loss) for the deployed parity model.

Accounting: the padded program executes MORE raw FLOPs (both conv input
and output channels grow), so the decisive metric is the EFFECTIVE
parity-function MFU = parity FLOPs / (padded step time * peak) -- the
goodput of the function the user actually wanted.  A refutation (effective
MFU below the parity baseline) is a valid outcome and is recorded with
numbers.

Also verified on-device: the padded variant's latents equal the parity
latents bit-for-bit on a real batch, and the padded codec round-trips
bit-exactly.

Usage:  python demo/run_mfu_roofline_r05.py \
            [--out results/mfu_roofline_r05.json] [--multiples 16,64,128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/mfu_roofline_r05.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--multiples", default="16,64,128")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from bench import bench_train_mfu, build_model

    from finalproject_losslessimagecompression_tpu.models.config import (
        with_growth_multiple,
    )
    from finalproject_losslessimagecompression_tpu.models.exact import (
        FlowCodec,
    )
    from finalproject_losslessimagecompression_tpu.models.idflow import (
        IDFlow,
    )
    from finalproject_losslessimagecompression_tpu.models.layers import (
        pad_growth_params,
    )

    multiples = [int(m) for m in args.multiples.split(",") if m]
    cfg, model, params = build_model(False)  # flagship parity (fused)
    # host copy BEFORE any donating bench run invalidates the buffers
    host_params = jax.device_get(params)

    rng = np.random.default_rng(11)
    x = jnp.asarray(
        np.round(rng.uniform(0, 1, (4, 64, 64, 3)) * 256)
        .astype(np.float32) / 256.0
    )

    # -- on-device function preservation at the largest multiple --------
    mv = max(multiples)
    pcfg = with_growth_multiple(cfg, mv)
    pmodel = IDFlow(pcfg)
    pparams = pad_growth_params(host_params, mv)
    la = jax.jit(model.apply)(params, x)
    lb = jax.jit(pmodel.apply)(pparams, x)
    lat_equal = all(
        bool(np.array_equal(np.asarray(a), np.asarray(b)))
        for a, b in zip(la[0], lb[0])
    )
    mean_dev = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(la[1], lb[1])
    )
    codec = FlowCodec(pmodel, num_streams=8192)
    blobs, info = codec.compress(pparams, x)
    rec = codec.decompress(pparams, blobs, info, fetch=True)
    codec_exact = bool(np.array_equal(np.asarray(rec), np.asarray(x)))
    preserve = {
        "checked_multiple": mv,
        "latents_bit_equal": lat_equal,
        "max_mean_abs_dev": mean_dev,
        "padded_codec_bit_exact": codec_exact,
    }
    print("function preservation:", preserve)

    # -- parity baseline ------------------------------------------------
    parity = bench_train_mfu(cfg, model, params, args.batch)
    parity_flops = parity["train_flops_per_step"]
    peak = parity.get("mfu_peak_tflops_bf16")
    rows = [{"variant": "parity", "growth_multiple": 0,
             "effective_parity_mfu_pct": parity.get("train_mfu_pct"),
             **parity}]
    print(rows[-1])

    # -- padded variants of the SAME function ---------------------------
    for m in multiples:
        pcfg = with_growth_multiple(cfg, m)
        pmodel = IDFlow(pcfg)
        pparams = jax.device_put(pad_growth_params(host_params, m))
        out = bench_train_mfu(pcfg, pmodel, pparams, args.batch)
        t = out["train_step_time_device_ms"] / 1e3
        eff = parity_flops / t / 1e12
        row = {
            "variant": f"parity_padded_gm{m}",
            "growth_multiple": m,
            "effective_parity_tflops": round(eff, 2),
            "effective_parity_mfu_pct": (
                round(100.0 * eff / peak, 2) if peak else None
            ),
            "raw_over_parity_flops": round(
                out["train_flops_per_step"] / parity_flops, 2
            ),
            **out,
        }
        rows.append(row)
        print(row)

    best = max(rows, key=lambda r: r["effective_parity_mfu_pct"] or 0)
    out = {
        "what": "r5 function-preserving MFU attack on the parity family: "
                "a parity checkpoint zero-padded into lane-padded "
                "growth architectures (same function, padded channels "
                "carry exact zeros).  effective_parity_mfu_pct = parity "
                "FLOPs / padded step time / peak -- the goodput of the "
                "parity function.",
        "hardware": jax.devices()[0].device_kind,
        "batch": args.batch,
        "function_preservation": preserve,
        "parity_flops_per_step": parity_flops,
        "rows": rows,
        "best_variant": best["variant"],
        "best_effective_parity_mfu_pct": best["effective_parity_mfu_pct"],
        "verdict": (
            "CONFIRMED: lane padding runs the parity function faster"
            if best["variant"] != "parity"
            else "REFUTED: every padded variant's extra FLOPs outweigh "
                 "its lane-efficiency gain -- the parity function is "
                 "fastest in its native shape; numbers above"
        ),
    }
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
