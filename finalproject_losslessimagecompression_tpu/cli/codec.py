"""File-level compress/decompress CLI: images <-> `.lic` containers.

The missing user-facing tool of the reference (its coding path exists only
inside the Trainer's eval loop, reference: trainer.py:304-331): compress an
image file (PNG/anything PIL reads, or a .npy uint8 array) into a
self-describing `.lic` file with a trained flow checkpoint, and decompress
it back to the EXACT original pixels.

Usage:
  python -m finalproject_losslessimagecompression_tpu.cli.codec compress \
      --config configs/synthetic64.yaml --ckpt logs/synthetic64.ckpt \
      --input img.png [img2.npy ...] [--outdir DIR]
  python -m finalproject_losslessimagecompression_tpu.cli.codec decompress \
      --config configs/synthetic64.yaml --ckpt logs/synthetic64.ckpt \
      --input img.lic [--outdir DIR]

Pixels are mapped uint8 v -> v/256 (exact points of the 1/256 coding grid)
and replication-padded up to the model's HxW; the original size is stored in
the header and the padding cropped away on decompress, so round-trips are
bit-exact on the original array.  Images LARGER than the model dims are
replication-padded to tile multiples and split into model-size tiles
(reference Patching semantics, extenddim.py:41-67) compressed as ONE
batch -- arbitrary image sizes work with any trained config.

`.lic` layout: magic b"LIC1" | u32 header_len | JSON header | blobs.
The header records the original size, nbits, per-level blob lengths, and a
model fingerprint (config hash) so mismatched checkpoints fail loudly
instead of decoding garbage.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import struct

import numpy as np
import yaml

_MAGIC = b"LIC1"


def _load_model(config_path: str, ckpt_path: str, num_streams: int):
    import jax
    import jax.numpy as jnp

    from ..models import FlowCodec, IDFlow
    from ..models.config import FlowCfg
    from ..train.checkpoint import load_raw

    with open(config_path) as f:
        config = yaml.safe_load(f)
    model_cfg = dict(config["train"]["model"])
    model_cfg.pop("load_path", None)
    cfg = FlowCfg.from_ref(model_cfg)
    model = IDFlow(cfg)
    init_x = jnp.zeros((1, cfg.H, cfg.W, cfg.C), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), init_x)
    raw = load_raw(ckpt_path)
    if "params" not in raw:
        raise SystemExit(f"{ckpt_path}: not a trainer checkpoint")
    from flax import serialization

    params = serialization.from_state_dict(params, raw["params"])
    # fingerprint ties .lic files to the (architecture, weights) pair
    h = hashlib.sha256()
    h.update(json.dumps(model_cfg, sort_keys=True).encode())
    with open(ckpt_path, "rb") as f:
        h.update(f.read(1 << 20))
    fingerprint = h.hexdigest()[:16]
    return cfg, FlowCodec(model, num_streams=num_streams), params, fingerprint


def _read_image(path: str) -> np.ndarray:
    """-> uint8 [H, W, C]."""
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.dtype != np.uint8:
            raise SystemExit(f"{path}: expected uint8 array")
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.uint8)


def _write_image(path: str, arr: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, arr)
        return
    from PIL import Image

    Image.fromarray(arr.squeeze() if arr.shape[-1] == 1 else arr).save(path)


def _to_tiles(cfg, in_path):
    """image file -> (model-size tile batch [N,H,W,C] float grid, orig shape)."""
    import jax.numpy as jnp

    from ..data.loader import _pad_replicate
    from ..ops.reshape import patch_split

    arr = _read_image(in_path)
    H, W, C = arr.shape
    if C != cfg.C:
        raise SystemExit(
            f"{in_path}: {C} channels, model expects {cfg.C}"
        )
    # pad up to tile multiples, then tile into a model-size batch
    x = arr.astype(np.float32) / 256.0
    x = _pad_replicate(x[None], -H % cfg.H, -W % cfg.W)
    return jnp.asarray(patch_split(x, cfg.H, cfg.W)), (H, W, C)


def _write_lic(cfg, fingerprint, out_path, blobs, info, orig, in_path):
    header = json.dumps({
        "orig": list(orig),
        "nbits": cfg.nbits,
        "blob_lens": [len(b) for b in blobs],
        "fingerprint": fingerprint,
        "info": {k: v for k, v in info.items()
                 if isinstance(v, (int, float, str, bool))},
    }).encode()
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for b in blobs:
            f.write(b)
    coded = os.path.getsize(out_path)
    H, W, C = orig
    print(f"{in_path} -> {out_path}: {coded} bytes, "
          f"{8.0 * coded / (H * W * C):.4f} bpd")


def compress_files(cfg, codec, params, fingerprint, in_paths, out_paths):
    """Pipelined: ALL files are dispatched sync-free and packed with one
    host transfer (FlowCodec.compress_many serving discipline)."""
    tiles, origs = [], []
    for p in in_paths:
        x, orig = _to_tiles(cfg, p)
        tiles.append(x)
        origs.append(orig)
    packed = codec.compress_many(params, tiles)
    for in_path, out_path, (blobs, info), orig in zip(
        in_paths, out_paths, packed, origs
    ):
        _write_lic(cfg, fingerprint, out_path, blobs, info, orig, in_path)


def compress_file(cfg, codec, params, fingerprint, in_path, out_path):
    compress_files(cfg, codec, params, fingerprint, [in_path], [out_path])


def _read_lic(cfg, fingerprint, in_path):
    """-> ((blobs, info), orig shape), with loud validation."""
    with open(in_path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC or len(data) < 8:
        raise SystemExit(f"{in_path}: not a .lic container")
    (hlen,) = struct.unpack("<I", data[4:8])
    try:
        header = json.loads(data[8 : 8 + hlen])
    except Exception:
        raise SystemExit(f"{in_path}: corrupt header")
    if header.get("fingerprint") != fingerprint:
        raise SystemExit(
            f"{in_path}: was written by a different model/checkpoint "
            f"({header.get('fingerprint')} != {fingerprint})"
        )
    blobs, off = [], 8 + hlen
    for n in header["blob_lens"]:
        blobs.append(data[off : off + n])
        off += n
    if off != len(data):
        raise SystemExit(f"{in_path}: trailing/missing bytes")
    info = dict(header.get("info", {}))
    info.setdefault("batch", 1)
    return (blobs, info), header["orig"]


def decompress_files(cfg, codec, params, fingerprint, in_paths, out_paths):
    """Pipelined: every container's decode is dispatched before the ONE
    sync that verifies all state invariants (decompress_many)."""
    from ..ops.reshape import patch_merge

    packed, origs = [], []
    for p in in_paths:
        pk, orig = _read_lic(cfg, fingerprint, p)
        packed.append(pk)
        origs.append(orig)
    recs = codec.decompress_many(params, packed)
    for in_path, out_path, rec, (H, W, C) in zip(
        in_paths, out_paths, recs, origs
    ):
        full = patch_merge(
            np.asarray(rec), H + (-H % cfg.H), W + (-W % cfg.W)
        )
        arr = np.round(full[0, :H, :W, :C] * 256.0).astype(np.uint8)
        _write_image(out_path, arr)
        print(f"{in_path} -> {out_path}: {H}x{W}x{C}")


def decompress_file(cfg, codec, params, fingerprint, in_path, out_path):
    decompress_files(cfg, codec, params, fingerprint, [in_path], [out_path])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["compress", "decompress"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--num-streams", type=int, default=4096)
    args = ap.parse_args(argv)

    cfg, codec, params, fp = _load_model(
        args.config, args.ckpt, args.num_streams
    )
    os.makedirs(args.outdir, exist_ok=True)

    def _out(path, ext):
        base = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(args.outdir, base + ext)

    if args.mode == "compress":
        compress_files(cfg, codec, params, fp, args.input,
                       [_out(p, ".lic") for p in args.input])
    else:
        decompress_files(cfg, codec, params, fp, args.input,
                         [_out(p, ".png") for p in args.input])


if __name__ == "__main__":
    main()
