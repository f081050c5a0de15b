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

Two pipelines, selected by the config shape:
- `train.model` (IDFlows): FlowCodec over model-size tiles;
- `train.flows` + `train.vqvae` (ResidualTrainer, the reference's flagship
  pipeline): ResidualCodec over `input_size` tiles -- the .lic carries the
  bit-packed VQ index stream (segment 0) plus the conditional residual
  containers, so it decodes with NO side information.  The VQ checkpoint
  comes from the config's `vqvae.checkpoint` or `--vq-ckpt`.

`.lic` layout: magic b"LIC1" | u32 header_len | JSON header | blobs.
The header records the original size, nbits, pipeline kind, per-segment
blob lengths, and a model fingerprint (config hash + checkpoint bytes) so
mismatched checkpoints or pipeline kinds fail loudly instead of decoding
garbage.

Every container carries a per-file `mode`: `flow` (model-coded) or a
stored escape (`stored-png`/`stored-zlib`) written when the classical
encoding is smaller -- e.g. sub-tile images whose ceil-to-tile replication
padding costs more than the whole PNG.  The mode choice bounds worst-case
expansion at the header size, the same discipline as PNG's per-row filter
choice or WebP's per-image mode choice; stored containers are
model-independent and skip the fingerprint check.  `--no-stored-fallback`
forces flow mode.
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


class _PlainPipeline:
    """IDFlow configs (train.model): FlowCodec over model-size tiles."""

    name = "plain"

    def __init__(self, cfg, codec, params, fingerprint):
        self.cfg = cfg
        self.codec = codec
        self.params = params
        self.fingerprint = fingerprint
        self.tile_h, self.tile_w, self.C = cfg.H, cfg.W, cfg.C
        self.nbits = cfg.nbits

    def compress_many(self, tiles_list):
        """[tile batches] -> [(segments, info)]; segments are the byte
        blobs written to the container in order."""
        return self.codec.compress_many(self.params, tiles_list)

    def decompress_many(self, packed):
        return self.codec.decompress_many(self.params, packed)


class _ResidualPipeline:
    """ResidualTrainer configs (train.flows + train.vqvae): ResidualCodec
    over input_size tiles; segment 0 is the VQ index stream."""

    name = "residual"

    def __init__(self, res_codec, params, fingerprint):
        self.res = res_codec
        self.params = params
        self.fingerprint = fingerprint
        self.tile_h, self.tile_w = res_codec.input_size
        self.C = res_codec.codec.model.cfg.C
        self.nbits = res_codec.codec.model.cfg.nbits

    def compress_many(self, tiles_list):
        out = []
        for x in tiles_list:
            idx_blob, blobs, info = self.res.compress(self.params, x)
            out.append(([idx_blob] + list(blobs), info))
        return out

    def decompress_many(self, packed):
        return [
            self.res.decompress(self.params, segs[0], segs[1:], info)
            for segs, info in packed
        ]


class _TwoLevelPipeline:
    """TwoLevelFlows configs (train.model.name == TwoLevelFlows):
    TwoLevelCodec over (H, W) tiles (rough + fine containers)."""

    name = "twolevel"

    def __init__(self, codec, params, fingerprint):
        self.codec = codec
        self.params = params
        self.fingerprint = fingerprint
        cfg = codec.cfg
        self.tile_h, self.tile_w, self.C = cfg.H, cfg.W, cfg.C
        self.nbits = cfg.nbits

    def compress_many(self, tiles_list):
        out = []
        for x in tiles_list:
            blobs, info = self.codec.compress(self.params, x)
            out.append((list(blobs), {"batch": info["batch"]}))
        return out

    def decompress_many(self, packed):
        cfg = self.codec.cfg
        ntiles = (cfg.Hp // cfg.fine.H) * (cfg.Wp // cfg.fine.W)
        recs = []
        for segs, info in packed:
            b = int(info["batch"])
            full = {"batch": b, "rough": {"batch": b},
                    "fine": {"batch": b * ntiles}}
            recs.append(self.codec.decompress(self.params, segs, full))
        return recs


def _fingerprint(model_cfg: dict, *ckpt_paths: str) -> str:
    """Ties .lic files to the (architecture, weights) pair."""
    h = hashlib.sha256()
    h.update(json.dumps(model_cfg, sort_keys=True).encode())
    for p in ckpt_paths:
        with open(p, "rb") as f:
            h.update(f.read(1 << 20))
    return h.hexdigest()[:16]


def _restore(params, ckpt_path):
    from flax import serialization

    from ..train.checkpoint import load_raw

    raw = load_raw(ckpt_path)
    if "params" not in raw:
        raise SystemExit(f"{ckpt_path}: not a trainer checkpoint")
    return serialization.from_state_dict(params, raw["params"])


def _init_abstract(model, *example_args):
    """Parameter STRUCTURE without any compute: jax.eval_shape of
    model.init.  A real (eager) flax init dispatches hundreds of ops; on
    remote-tunnel runtimes each costs a host round trip, which made model
    loading take minutes (measured ~335s for the synthetic64 model, r3).
    The checkpoint overwrites every value anyway -- only the tree matters."""
    import jax

    return jax.eval_shape(
        model.init, jax.random.PRNGKey(0), *example_args
    )


def _load_model(config_path: str, ckpt_path: str, num_streams: int,
                vq_ckpt: str = None):
    import jax
    import jax.numpy as jnp

    from ..models import FlowCodec, IDFlow
    from ..models.config import FlowCfg

    with open(config_path) as f:
        config = yaml.safe_load(f)
    train = config["train"]

    if "flows" in train:  # ResidualTrainer config -> full pipeline
        from ..models import ResidualCodec, build_vqvae_from_ref

        flows = dict(train["flows"])
        flows.pop("load_path", None)
        cfg = FlowCfg.from_ref(flows)
        if not cfg.conditional:
            raise SystemExit(
                f"{config_path}: file coding of residual configs needs "
                "ConditionalFlows (the VQ reconstruction is the decoder's "
                "only conditioning source)"
            )
        model = IDFlow(cfg)
        px = jnp.zeros((1, cfg.H, cfg.W, cfg.C), jnp.float32)
        params = _restore(_init_abstract(model, px, px), ckpt_path)
        vq_cfg = dict(train["vqvae"])
        vq_ckpt = vq_ckpt or vq_cfg.get("checkpoint")
        if not vq_ckpt:
            raise SystemExit("no VQ-VAE checkpoint (config or --vq-ckpt)")
        vqvae = build_vqvae_from_ref(vq_cfg)
        from ..train.checkpoint import load_raw

        vq_params = load_raw(vq_ckpt)["params"]
        res = ResidualCodec(
            vqvae, vq_params,
            FlowCodec(model, num_streams=num_streams),
            tuple(train["input_size"]),
        )
        fp = _fingerprint(flows, ckpt_path, vq_ckpt)
        return _ResidualPipeline(res, params, fp)

    model_cfg = dict(train["model"])
    model_cfg.pop("load_path", None)

    if model_cfg.get("name") == "TwoLevelFlows":
        from ..models.twolevel import TwoLevelCfg, TwoLevelFlow
        from ..models.twolevel_codec import TwoLevelCodec

        tcfg = TwoLevelCfg.from_ref(model_cfg)
        model = TwoLevelFlow(tcfg)
        init_x = jnp.zeros((1, tcfg.H, tcfg.W, tcfg.C), jnp.float32)
        params = _restore(_init_abstract(model, init_x), ckpt_path)
        fp = _fingerprint(model_cfg, ckpt_path)
        return _TwoLevelPipeline(
            TwoLevelCodec(model, num_streams=num_streams), params, fp
        )

    cfg = FlowCfg.from_ref(model_cfg)
    model = IDFlow(cfg)
    init_x = jnp.zeros((1, cfg.H, cfg.W, cfg.C), jnp.float32)
    params = _restore(_init_abstract(model, init_x), ckpt_path)
    fp = _fingerprint(model_cfg, ckpt_path)
    return _PlainPipeline(
        cfg, FlowCodec(model, num_streams=num_streams), params, fp
    )


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


def _to_tiles(pipe, in_path):
    """image file -> (tile batch [N,th,tw,C] float grid, orig shape, uint8)."""
    import jax.numpy as jnp

    from ..data.loader import _pad_replicate
    from ..ops.reshape import patch_split

    arr = _read_image(in_path)
    H, W, C = arr.shape
    if C != pipe.C:
        raise SystemExit(
            f"{in_path}: {C} channels, model expects {pipe.C}"
        )
    # pad up to tile multiples, then tile into a model-size batch
    x = arr.astype(np.float32) / 256.0
    x = _pad_replicate(x[None], -H % pipe.tile_h, -W % pipe.tile_w)
    tiles = jnp.asarray(patch_split(x, pipe.tile_h, pipe.tile_w))
    return tiles, (H, W, C), arr


def _stored_blob(arr: np.ndarray):
    """Smallest self-contained classical encoding of a uint8 HWC array:
    PNG (predictive filters) when PIL supports the channel count, raw
    zlib otherwise.  This is the container's worst-case escape: images the
    flow codes badly (sub-tile sizes paying ceil-to-tile padding, content
    far outside the training distribution) are never more than the header
    larger than a classical codec -- the mode flag per file is the same
    discipline PNG (per-row filter choice) and WebP (per-image mode
    choice) use."""
    import io
    import zlib

    if arr.shape[-1] in (1, 3):
        from PIL import Image

        b = io.BytesIO()
        Image.fromarray(
            arr.squeeze(-1) if arr.shape[-1] == 1 else arr
        ).save(b, format="PNG", optimize=True)
        return "stored-png", b.getvalue()
    return "stored-zlib", zlib.compress(arr.tobytes(), 9)


def _decode_stored(mode: str, blob: bytes, orig) -> np.ndarray:
    H, W, C = orig
    if mode == "stored-png":
        import io

        from PIL import Image

        a = np.asarray(Image.open(io.BytesIO(blob)), np.uint8)
        if a.ndim == 2:
            a = a[..., None]
        return a.reshape(H, W, C)
    import zlib

    return np.frombuffer(zlib.decompress(blob), np.uint8).reshape(H, W, C)


def _container_bytes(header: dict, segments) -> bytes:
    h = json.dumps(header).encode()
    return b"".join(
        [_MAGIC, struct.pack("<I", len(h)), h, *segments]
    )


def _write_lic(pipe, out_path, segments, info, orig, in_path, arr=None):
    """Write the smaller of {flow container, stored escape} (arr=None
    disables the escape and always writes the flow container)."""
    flow = _container_bytes({
        "orig": list(orig),
        "nbits": pipe.nbits,
        "pipeline": pipe.name,
        "mode": "flow",
        "blob_lens": [len(b) for b in segments],
        "fingerprint": pipe.fingerprint,
        "info": {k: v for k, v in info.items()
                 if isinstance(v, (int, float, str, bool))},
    }, segments)
    data, mode = flow, "flow"
    if arr is not None:
        smode, blob = _stored_blob(arr)
        stored = _container_bytes({
            "orig": list(orig),
            "pipeline": pipe.name,
            "mode": smode,
            "blob_lens": [len(blob)],
        }, [blob])
        if len(stored) < len(flow):
            data, mode = stored, smode
    with open(out_path, "wb") as f:
        f.write(data)
    H, W, C = orig
    print(f"{in_path} -> {out_path}: {len(data)} bytes, "
          f"{8.0 * len(data) / (H * W * C):.4f} bpd [{mode}]")


def compress_files(pipe, in_paths, out_paths, stored_fallback=True):
    """Pipelined: ALL files are dispatched sync-free and packed with one
    host transfer (FlowCodec.compress_many serving discipline)."""
    tiles, origs, arrs = [], [], []
    for p in in_paths:
        x, orig, arr = _to_tiles(pipe, p)
        tiles.append(x)
        origs.append(orig)
        arrs.append(arr if stored_fallback else None)
    packed = pipe.compress_many(tiles)
    for in_path, out_path, (segments, info), orig, arr in zip(
        in_paths, out_paths, packed, origs, arrs
    ):
        _write_lic(pipe, out_path, segments, info, orig, in_path, arr)


def compress_file(pipe, in_path, out_path, stored_fallback=True):
    compress_files(pipe, [in_path], [out_path], stored_fallback)


def _read_lic(pipe, in_path):
    """-> (mode, (segments, info), orig shape), with loud validation.
    Stored-mode containers are model-independent, so the fingerprint /
    pipeline checks apply to flow mode only."""
    with open(in_path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC or len(data) < 8:
        raise SystemExit(f"{in_path}: not a .lic container")
    (hlen,) = struct.unpack("<I", data[4:8])
    try:
        header = json.loads(data[8 : 8 + hlen])
    except Exception:
        raise SystemExit(f"{in_path}: corrupt header")
    mode = header.get("mode", "flow")
    if mode == "flow":
        if header.get("fingerprint") != pipe.fingerprint:
            raise SystemExit(
                f"{in_path}: was written by a different model/checkpoint "
                f"({header.get('fingerprint')} != {pipe.fingerprint})"
            )
        if header.get("pipeline", "plain") != pipe.name:
            raise SystemExit(
                f"{in_path}: {header.get('pipeline')!r} container, loaded "
                f"config is {pipe.name!r}"
            )
    elif mode not in ("stored-png", "stored-zlib"):
        raise SystemExit(f"{in_path}: unknown container mode {mode!r}")
    segments, off = [], 8 + hlen
    for n in header["blob_lens"]:
        segments.append(data[off : off + n])
        off += n
    if off != len(data):
        raise SystemExit(f"{in_path}: trailing/missing bytes")
    info = dict(header.get("info", {}))
    info.setdefault("batch", 1)
    return mode, (segments, info), header["orig"]


def decompress_files(pipe, in_paths, out_paths):
    """Pipelined: every container's decode is dispatched before the ONE
    sync that verifies all state invariants (decompress_many).  Stored-mode
    containers decode host-side and never touch the model."""
    from ..ops.reshape import patch_merge

    parsed = [_read_lic(pipe, p) for p in in_paths]
    flow_idx = [i for i, (m, _, _) in enumerate(parsed) if m == "flow"]
    recs = (pipe.decompress_many([parsed[i][1] for i in flow_idx])
            if flow_idx else [])
    flow_rec = dict(zip(flow_idx, recs))
    for i, (in_path, out_path, (mode, (segments, _), orig)) in enumerate(
        zip(in_paths, out_paths, parsed)
    ):
        H, W, C = orig
        if mode == "flow":
            full = patch_merge(
                np.asarray(flow_rec[i]),
                H + (-H % pipe.tile_h), W + (-W % pipe.tile_w),
            )
            arr = np.round(full[0, :H, :W, :C] * 256.0).astype(np.uint8)
        else:
            arr = _decode_stored(mode, segments[0], orig)
        _write_image(out_path, arr)
        print(f"{in_path} -> {out_path}: {H}x{W}x{C} [{mode}]")


def decompress_file(pipe, in_path, out_path):
    decompress_files(pipe, [in_path], [out_path])


def main(argv=None):
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()  # the fused codec programs compile once, ever
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["compress", "decompress"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--num-streams", type=int, default=4096)
    ap.add_argument("--vq-ckpt", default=None,
                    help="VQ-VAE checkpoint for residual configs "
                    "(default: the config's vqvae.checkpoint)")
    ap.add_argument("--no-stored-fallback", action="store_true",
                    help="always write flow containers, even when the "
                    "stored escape (PNG/zlib) would be smaller")
    args = ap.parse_args(argv)

    pipe = _load_model(
        args.config, args.ckpt, args.num_streams, vq_ckpt=args.vq_ckpt
    )
    os.makedirs(args.outdir, exist_ok=True)

    def _out(path, ext):
        base = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(args.outdir, base + ext)

    if args.mode == "compress":
        compress_files(pipe, args.input,
                       [_out(p, ".lic") for p in args.input],
                       stored_fallback=not args.no_stored_fallback)
    else:
        decompress_files(pipe, args.input,
                         [_out(p, ".png") for p in args.input])


if __name__ == "__main__":
    main()
