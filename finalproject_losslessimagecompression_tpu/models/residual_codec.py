"""ResidualCodec: self-contained coding for the VQ-VAE residual pipeline.

The reference's flagship pipeline (ResidualTrainer, reference:
trainer.py:550-731) never produced a decodable artifact: its coding test
hands the DECODER the encode side's VQ reconstruction (and this repo's
trainer coding test mirrors that, train/residual_trainer.py:251-259).  A
real receiver has neither the image nor its reconstruction -- the VQ
bitstream must travel with the residual containers.

This codec closes the loop:

  compress:   x -> VQ indices (bit-packed) + conditional-flow containers
              of the residual patches (cond = reconstruction patches)
  decompress: indices -> reconstruction (ONE shared jitted executable, the
              same one the encoder used, so both sides see bit-identical
              cond) -> conditional decode of the residual -> x, exactly.

Exactness: the reconstruction is a deterministic function of the indices
evaluated by a single shared compiled program (`_rec_from_idx`), so
encode/decode cond agreement follows the same shared-executable contract
as FlowCodec's priors (models/exact.py).  Grid arithmetic (x = res + rec)
is exact in float32 on the 1/256 grid.

Index stream cost: ceil(log2(K)) bits per index, bit-packed.  For the
reference's 16x downsampling VQ configs this is ~0.05 bpd of overhead,
accounted in coded_bits/real_bpd.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.reshape import patch_merge, patch_split
from ..ops.rounding import round_to_grid
from .exact import FlowCodec
from .vqvae import VQVAE

_IDX_MAGIC = b"VQIX"


def _pack_indices(idx: np.ndarray, K: int) -> bytes:
    """[B, h, w] int32 -> bit-packed stream with a shape header."""
    b, h, w = idx.shape
    bits = max(1, int(np.ceil(np.log2(max(K, 2)))))
    flat = idx.astype(np.uint32).ravel()
    if np.any(flat >= K):
        raise ValueError("index out of range")
    # little-endian bit packing into a uint8 buffer
    nbits = flat.size * bits
    out = np.zeros((nbits + 7) // 8, np.uint8)
    pos = np.arange(flat.size, dtype=np.int64) * bits
    for j in range(bits):
        bit = ((flat >> j) & 1).astype(np.uint8)
        p = pos + j
        np.bitwise_or.at(out, p >> 3, bit << (p & 7).astype(np.uint8))
    return _IDX_MAGIC + struct.pack("<IIII", b, h, w, K) + out.tobytes()


def _unpack_indices(blob: bytes) -> Tuple[np.ndarray, int]:
    """-> ([B, h, w] int32, K); raises ValueError on malformed input."""
    if blob[:4] != _IDX_MAGIC or len(blob) < 20:
        raise ValueError("bad index stream magic")
    b, h, w, K = struct.unpack("<IIII", blob[4:20])
    bits = max(1, int(np.ceil(np.log2(max(K, 2)))))
    n = b * h * w
    need = (n * bits + 7) // 8
    if len(blob) != 20 + need:
        raise ValueError("index stream length mismatch")
    buf = np.frombuffer(blob, np.uint8, offset=20)
    pos = np.arange(n, dtype=np.int64) * bits
    flat = np.zeros(n, np.uint32)
    for j in range(bits):
        p = pos + j
        flat |= ((buf[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(
            np.uint32
        ) << j
    if np.any(flat >= K):
        raise ValueError("index out of range")
    return flat.reshape(b, h, w).astype(np.int32), K


class ResidualCodec:
    """Couples a frozen VQ-VAE with a conditional FlowCodec.

    `flow_codec.model.cfg` gives the patch dims; `input_size` is the
    (H, W) of the full images being coded (reference input_size,
    trainer.py:591)."""

    def __init__(self, vqvae: VQVAE, vq_params, flow_codec: FlowCodec,
                 input_size: Tuple[int, int]):
        if not flow_codec.model.cfg.conditional:
            raise ValueError("ResidualCodec needs a conditional flow")
        self.vqvae = vqvae
        self.vq_params = vq_params
        self.codec = flow_codec
        self.input_size = tuple(input_size)
        nbits = flow_codec.model.cfg.nbits

        @jax.jit
        def _encode_idx(vp, x):
            vq_x, _, idx, _, _ = vqvae.apply(
                vp, (x - 0.5) / 0.5, method=VQVAE.encode
            )
            b, hh, ww, _ = vq_x.shape
            return idx.reshape(b, hh, ww)

        @jax.jit
        def _rec_from_idx(vp, idx):
            # the ONE executable both sides use to turn indices into the
            # conditioning reconstruction (shared-executable contract)
            cb = vp["params"]["vq"]["codebook"]
            vq_x = jnp.take(cb, idx, axis=0)
            rec = vqvae.apply(vp, vq_x, method=VQVAE.decode)
            return round_to_grid(rec * 0.5 + 0.5, nbits)

        self._encode_idx = _encode_idx
        self._rec_from_idx = _rec_from_idx

    # -- API ------------------------------------------------------------

    def _compress_deferred(self, params, x):
        """Dispatch one batch's full pipeline (VQ encode, reconstruction,
        residual flow encode) with NO host sync; returns
        (device idx, deferred encs, info) for a caller that packs many
        batches' containers in one transfer."""
        cfg = self.codec.model.cfg
        H, W = self.input_size
        assert x.shape[1:3] == (H, W), (x.shape, self.input_size)
        idx = self._encode_idx(self.vq_params, x)
        rec = self._rec_from_idx(self.vq_params, idx)
        res = x - rec
        patches = patch_split(res, cfg.H, cfg.W)
        rec_patches = patch_split(rec, cfg.H, cfg.W)
        encs, info = self.codec._compress_deferred(
            params, patches, rec_patches
        )
        info = dict(info)
        info["images"] = int(x.shape[0])
        return idx, encs, info

    def compress(self, params, x) -> Tuple[bytes, List[bytes], dict]:
        """x [B, H, W, C] on the 1/256 grid ->
        (index stream, residual containers, info)."""
        from ..codec.container import pack_streams_many

        idx, encs, info = self._compress_deferred(params, x)
        blobs = pack_streams_many(encs)
        K = int(self.vqvae.embed_num)
        idx_blob = _pack_indices(np.asarray(idx), K)
        return idx_blob, blobs, info

    def compress_many(self, params, xs):
        """Pipelined serving encode: dispatch EVERY batch's VQ + flow
        pipeline, then one pack sync for all containers plus one batched
        index fetch.  Byte-identical to per-batch compress (containers
        pack per-encode; indices are deterministic).  Returns a list of
        (idx_blob, blobs, info)."""
        from ..codec.container import pack_streams_many

        per = [self._compress_deferred(params, x) for x in xs]
        flat = [e for _, encs, _ in per for e in encs]
        blobs = pack_streams_many(flat)  # ONE sync for every container
        idxs = jax.device_get([idx for idx, _, _ in per])  # one transfer
        K = int(self.vqvae.embed_num)
        out, pos = [], 0
        for (_, encs, info), idx_np in zip(per, idxs):
            idx_blob = _pack_indices(np.asarray(idx_np), K)
            out.append((idx_blob, blobs[pos : pos + len(encs)], info))
            pos += len(encs)
        return out

    def _decompress_deferred(self, params, idx_blob, blobs, info):
        """Dispatch one batch's decode sync-free -> (device x, oks)."""
        H, W = self.input_size
        idx, _ = _unpack_indices(idx_blob)
        rec = self._rec_from_idx(self.vq_params, idx)
        cfg = self.codec.model.cfg
        rec_patches = patch_split(rec, cfg.H, cfg.W)
        patches, oks = self.codec._decompress_deferred(
            params, blobs, info, rec_patches
        )
        res = patch_merge(patches, H, W)
        return res + rec, list(oks)

    def decompress(self, params, idx_blob: bytes, blobs: Sequence[bytes],
                   info: dict, fetch: bool = False):
        """-> x [B, H, W, C], exactly the compressed batch.  fetch=True
        returns host numpy and folds the result transfer into the SAME
        device_get as the rANS state-invariant check (one round trip)."""
        x, oks = self._decompress_deferred(params, idx_blob, blobs, info)
        if fetch:
            x_np, got = jax.device_get((x, oks))
            FlowCodec._check_got(got)
            return x_np
        FlowCodec._check_oks(oks)
        return x

    def decompress_many(self, params, packed, fetch: bool = False):
        """Pipelined decode of [(idx_blob, blobs, info), ...]: dispatch
        every batch, then ONE sync verifying all state invariants
        (fetch=True also returns all decoded batches in that sync)."""
        xs, oks = [], []
        for idx_blob, blobs, info in packed:
            x, ok = self._decompress_deferred(params, idx_blob, blobs, info)
            xs.append(x)
            oks.extend(ok)
        if fetch:
            xs_np, got = jax.device_get((xs, oks))
            FlowCodec._check_got(got)
            return xs_np
        FlowCodec._check_oks(oks)
        return xs

    def coded_bits(self, idx_blob: bytes, blobs: Sequence[bytes]) -> int:
        return 8 * len(idx_blob) + self.codec.coded_bits(blobs)

    def real_bpd(self, idx_blob: bytes, blobs: Sequence[bytes],
                 info: dict) -> float:
        H, W = self.input_size
        numel = info["images"] * H * W * self.codec.model.cfg.C
        return self.coded_bits(idx_blob, blobs) / float(numel)
