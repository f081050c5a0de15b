"""Classical-codec baseline harness (reference: test_png.py:16-83).

Measures bpd + wall-clock of gzip / bz2 / lzma over raw bytes, PNG / WebP
(lossless) via PIL, and gzip-of-PNG, over any registered dataloader -- the
comparison panel for the learned codec's real bpd.

Usage: python -m finalproject_losslessimagecompression_tpu.cli.baselines
           --config <yaml> [--max-batches N]
(uses train.test_dataloader from the config; or --synthetic for a data-free
run)
"""

from __future__ import annotations

import argparse
import bz2
import gzip
import io
import lzma
import time

import numpy as np
import yaml

from ..data.loader import DataLoader  # noqa: F401
from ..registry import DATALOADERS, build


def _to_uint8(batch: np.ndarray) -> np.ndarray:
    return np.clip(np.round(batch * 255.0), 0, 255).astype(np.uint8)


def compress_bytes(name: str, arr: np.ndarray) -> int:
    raw = arr.tobytes()
    if name == "gzip":
        return len(gzip.compress(raw, 9))
    if name == "bz2":
        return len(bz2.compress(raw, 9))
    if name == "lzma":
        return len(lzma.compress(raw))
    raise KeyError(name)


def compress_image(name: str, arr: np.ndarray) -> int:
    from PIL import Image

    img = Image.fromarray(arr)
    buf = io.BytesIO()
    if name == "png":
        img.save(buf, format="PNG", optimize=True)
    elif name == "webp":
        img.save(buf, format="WEBP", lossless=True)
    elif name == "gzip_png":
        tmp = io.BytesIO()
        img.save(tmp, format="PNG", optimize=True)
        return len(gzip.compress(tmp.getvalue(), 9))
    else:
        raise KeyError(name)
    return buf.tell()


def run(loader, max_batches: int = 0):
    codecs_b = ["gzip", "bz2", "lzma"]
    codecs_i = ["png", "webp", "gzip_png"]
    bits = {c: 0 for c in codecs_b + codecs_i}
    times = {c: 0.0 for c in codecs_b + codecs_i}
    dims = 0
    n_batches = 0
    for batch in iter(loader):
        u8 = _to_uint8(batch)
        dims += u8.size
        for c in codecs_b:
            t0 = time.time()
            for img in u8:
                bits[c] += 8 * compress_bytes(c, img)
            times[c] += time.time() - t0
        for c in codecs_i:
            t0 = time.time()
            for img in u8:
                bits[c] += 8 * compress_image(c, img)
            times[c] += time.time() - t0
        n_batches += 1
        if max_batches and n_batches >= max_batches:
            break
    return {
        c: {"bpd": bits[c] / dims, "seconds": times[c]}
        for c in bits
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--max-batches", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args(argv)
    if args.synthetic or not args.config:
        loader = build(
            DATALOADERS,
            dict(
                name="CustomDataLoader",
                dataset=dict(name="SyntheticImages", size=[64, 64, 3],
                             length=32, seed=0),
                batch_size=8,
                shuffle=False,
            ),
        )
    else:
        with open(args.config) as f:
            config = yaml.safe_load(f)
        loader = build(DATALOADERS, dict(config["train"]["test_dataloader"]))
    results = run(loader, args.max_batches)
    for name, r in sorted(results.items()):
        print(f"{name:10s} bpd={r['bpd']:.4f}  time={r['seconds']:.2f}s")


if __name__ == "__main__":
    main()
