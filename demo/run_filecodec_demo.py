"""File-codec demo: drive cli/codec.py over the committed corpus and record
bytes vs classical codecs (VERDICT r2 item 10 -- the user-facing proof the
reference never had: its coding existed only inside the eval loop,
reference trainer.py:304-331).

Usage (after training a model, e.g. configs/synthetic64.yaml):
    python demo/run_filecodec_demo.py \
        --config configs/synthetic64.yaml --ckpt logs/synthetic64_r04.ckpt \
        [--out RESULTS_filecodec_r04.json]

For every demo/corpus/*.png (structured synthetic images at several sizes,
including non-divisible dims that exercise the pad+tile paths):
  compress -> .lic -> decompress -> assert EXACT pixel equality, and record
  .lic bytes vs PNG (optimized), lossless WebP, and gzip of the raw array.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import io
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic64.yaml")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="RESULTS_filecodec_r03.json")
    ap.add_argument("--corpus", default=os.path.join(ROOT, "demo/corpus"))
    ap.add_argument("--workdir", default="/tmp/filecodec_demo")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    from PIL import Image

    from finalproject_losslessimagecompression_tpu.cli.codec import main as cli

    files = sorted(glob.glob(os.path.join(args.corpus, "*.png")))
    assert files, f"no corpus at {args.corpus}"
    licdir = os.path.join(args.workdir, "lic")
    recdir = os.path.join(args.workdir, "rec")
    os.makedirs(licdir, exist_ok=True)
    os.makedirs(recdir, exist_ok=True)

    # cold pass: includes model load + any program compiles not in the
    # persistent cache.  warm pass: same CLI invocation again -- every
    # program is a cache hit, so this is the steady-state number a user
    # sees from the second run on (VERDICT r3 item 4: the cold number
    # alone misread as the product's speed).
    t0 = time.time()
    cli(["compress", "--config", args.config, "--ckpt", args.ckpt,
         "--input", *files, "--outdir", licdir])
    t_compress_cold = time.time() - t0
    t0 = time.time()
    cli(["compress", "--config", args.config, "--ckpt", args.ckpt,
         "--input", *files, "--outdir", licdir])
    t_compress = time.time() - t0
    lics = [
        os.path.join(licdir, os.path.basename(f)[:-4] + ".lic")
        for f in files
    ]
    t0 = time.time()
    cli(["decompress", "--config", args.config, "--ckpt", args.ckpt,
         "--input", *lics, "--outdir", recdir])
    t_decompress_cold = time.time() - t0
    t0 = time.time()
    cli(["decompress", "--config", args.config, "--ckpt", args.ckpt,
         "--input", *lics, "--outdir", recdir])
    t_decompress = time.time() - t0

    rows = []
    for f, lic in zip(files, lics):
        orig = np.asarray(Image.open(f).convert("RGB"))
        rec = np.asarray(
            Image.open(
                os.path.join(recdir, os.path.basename(lic)[:-4] + ".png")
            ).convert("RGB")
        )
        exact = bool(np.array_equal(orig, rec))
        lic_bytes = os.path.getsize(lic)
        png_bytes = os.path.getsize(f)
        wb = io.BytesIO()
        Image.fromarray(orig).save(wb, format="WEBP", lossless=True)
        webp_bytes = wb.tell()
        gz_bytes = len(gzip.compress(orig.tobytes(), 9))
        numel = orig.size
        rows.append({
            "file": os.path.basename(f),
            "shape": list(orig.shape),
            "bit_exact": exact,
            "lic_bytes": lic_bytes,
            "png_bytes": png_bytes,
            "webp_lossless_bytes": webp_bytes,
            "gzip9_bytes": gz_bytes,
            "lic_bpd": round(8.0 * lic_bytes / numel, 4),
            "png_bpd": round(8.0 * png_bytes / numel, 4),
            "webp_bpd": round(8.0 * webp_bytes / numel, 4),
        })
        status = "OK " if exact else "MISMATCH"
        print(f"{status} {rows[-1]['file']}: lic {lic_bytes}B "
              f"vs png {png_bytes}B vs webp {webp_bytes}B")

    tot = lambda k: sum(r[k] for r in rows)  # noqa: E731
    out = {
        "what": "file-level codec demo: cli/codec.py over demo/corpus "
                "(structured synthetic images; sizes exercise native dims, "
                "tiling, non-divisible padding)",
        "config": args.config,
        "ckpt": os.path.basename(args.ckpt),
        "platform": jax.devices()[0].platform,
        "all_bit_exact": all(r["bit_exact"] for r in rows),
        "total_lic_bytes": tot("lic_bytes"),
        "total_png_bytes": tot("png_bytes"),
        "total_webp_bytes": tot("webp_lossless_bytes"),
        "total_gzip9_bytes": tot("gzip9_bytes"),
        "lic_vs_png": round(tot("lic_bytes") / tot("png_bytes"), 4),
        "lic_vs_webp": round(
            tot("lic_bytes") / tot("webp_lossless_bytes"), 4
        ),
        "compress_wall_warm_s": round(t_compress, 2),
        "compress_wall_cold_s": round(t_compress_cold, 2),
        "decompress_wall_warm_s": round(t_decompress, 2),
        "decompress_wall_cold_s": round(t_decompress_cold, 2),
        "files": rows,
    }
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "files"},
                     indent=1))
    if not out["all_bit_exact"]:
        raise SystemExit("round trip NOT bit-exact")


if __name__ == "__main__":
    main()
