"""Codec stress at the reference's own scale (VERDICT r4 item 4): 50M
symbols through the device codec, bit-exact, sym/s recorded for both the
Pallas kernels (HBM-windowed decode at this size) and the lax.scan path.

The reference's stress harness is /root/reference/rans/test.py:6-36 (50M
random logistic symbols through the serial C++ coder); this is the same
experiment against the TPU-resident interleaved coder, plus the
host-in-the-loop rate (numpy in, container bytes out) for the number a
user actually observes.

Usage:  python demo/run_stress_50m.py [--n 50000000]
            [--out results/stress_50m_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="results/stress_50m_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        enable_compile_cache,
        value_fence,
    )

    enable_compile_cache()
    from finalproject_losslessimagecompression_tpu.codec import (
        NBINS,
        interleaved_decode,
        interleaved_encode,
        lower_bin,
    )
    from finalproject_losslessimagecompression_tpu.codec import (
        interleaved as IL,
    )

    n = args.n
    # the reference draws logistic symbols (rans/test.py:10-13); same here
    rng = np.random.default_rng(6)
    means = rng.uniform(-2, 2, n).astype(np.float32)
    scales = np.exp(rng.uniform(-4, 0, n)).astype(np.float32)
    raw = means + scales * rng.logistic(0, 1, n).astype(np.float32)
    v = np.round(raw * 256).astype(np.int32)
    low = lower_bin(means)
    v = np.clip(v, low, low + NBINS - 1)

    out = {
        "what": f"codec stress at the reference's scale: {n} logistic "
                "symbols (reference rans/test.py:6-36), bit-exact "
                "required",
        "n_symbols": n,
        "hardware": jax.devices()[0].device_kind,
    }

    # host-in-the-loop: numpy arrays in, packed container out, decode back
    t0 = time.time()
    enc = interleaved_encode(v, means, scales, num_streams=8192)
    t_enc_host = time.time() - t0
    t0 = time.time()
    dec, hi, lo = interleaved_decode(enc, means, scales)
    dec_np = np.asarray(dec)
    t_dec_host = time.time() - t0
    exact = bool(np.array_equal(dec_np, v))
    out["bit_exact"] = exact
    out["host_encode_s"] = round(t_enc_host, 3)
    out["host_decode_s"] = round(t_dec_host, 3)
    out["host_sym_per_s"] = round(2 * n / (t_enc_host + t_dec_host), 1)
    out["coded_bits_per_sym"] = round(
        32.0 * float(np.asarray(enc.num_words).sum()) / n, 4
    )
    print({k: out[k] for k in ("bit_exact", "host_sym_per_s")})

    # device-resident, both backends; Pallas decode must take the
    # HBM-windowed path at this size (the VMEM-resident form cannot hold
    # a 50M-symbol word buffer)
    S = 8192
    k = IL._plan_steps(n, S)
    vd, md, sd = jnp.asarray(v), jnp.asarray(means), jnp.asarray(scales)
    jax.block_until_ready((vd, md, sd))
    backends = {"scan": False}
    if IL._pallas_ok(S, k):
        from finalproject_losslessimagecompression_tpu.codec.pallas_rans import (
            _decode_resident_ok,
        )

        backends["pallas"] = True
        out["pallas_decode_windowed"] = not _decode_resident_ok(S, k)
    for name, up in backends.items():
        be, tot, bh, bl, *_ = IL._encode_scan(vd, md, sd, S, k, up, None)
        vals, h2, l2, _ = IL._decode_scan(
            be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None, None, up
        )
        ok = bool(np.array_equal(np.asarray(vals), v))
        out[f"{name}_bit_exact"] = ok
        assert ok, name
        value_fence(vals)  # warm the fence's eager ops before timing
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            be, tot, bh, bl, *_ = IL._encode_scan(
                vd, md, sd, S, k, up, None
            )
            vals, h2, l2, _ = IL._decode_scan(
                be, tot.astype(jnp.int32), bh, bl, md, sd, S, k, None,
                None, up,
            )
            value_fence(vals)
            ts.append(time.time() - t0)
        import statistics

        out[f"{name}_device_sym_per_s"] = round(
            n / statistics.median(ts), 1
        )
        print(name, out[f"{name}_device_sym_per_s"], "sym/s")

    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
