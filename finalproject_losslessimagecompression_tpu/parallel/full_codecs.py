"""Sharded serving for the FULL pipelines: ResidualCodec and TwoLevelCodec
over a device mesh.

parallel/flow_codec.py scales the plain FlowCodec; this module extends the
same chip-local pattern to the two composite codecs -- the reference's
flagship residual pipeline (reference: trainer.py:550-731) and the
two-level pyramid (reference: flows.py:185-274) -- so their serving paths
scale exactly like the plain one:

- images shard over the mesh (image-major patch order keeps every image's
  patches on its own device);
- the VQ encode / reconstruction (or pyramid split/unpool) run as sharded
  jits with replicated params -- data never crosses devices;
- the rANS coding runs through ShardedFlowCodec's shard_map kernel, i.e.
  literally the single-chip fused programs per device, so each device's
  containers (and its bit-packed VQ index stream) are BYTE-IDENTICAL to a
  single-device ResidualCodec/TwoLevelCodec.compress of its image shard
  (asserted by tests/test_parallel.py).  Any shard is decodable alone.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..models.exact import FlowCodec
from ..models.residual_codec import (
    ResidualCodec,
    _pack_indices,
    _unpack_indices,
)
from ..models.twolevel_codec import TwoLevelCodec
from ..ops.reshape import patch_merge, patch_split
from .flow_codec import ShardedFlowCodec, _mesh_size
from .sharding import replicate, shard_batch


class ShardedResidualCodec:
    """Chip-local residual-pipeline codec over a mesh.

    compress returns (idx_blobs, blobs, info): idx_blobs[d] is device d's
    bit-packed VQ index stream and blobs[d*nsplit + l] its level-l flow
    container -- together exactly what a plain ResidualCodec.compress of
    device d's image shard would emit."""

    def __init__(self, res_codec: ResidualCodec, mesh: Mesh):
        self.res = res_codec
        self.mesh = mesh
        self.D = _mesh_size(mesh)
        self.sharded = ShardedFlowCodec(res_codec.codec, mesh)
        repl, dsh = replicate(mesh), shard_batch(mesh)
        # the same executables ResidualCodec built, re-jitted with explicit
        # shardings (params replicated, images/indices sharded) so the VQ
        # stages are data-parallel with zero collectives
        self._encode_idx = jax.jit(
            res_codec._encode_idx.__wrapped__,
            in_shardings=(repl, dsh), out_shardings=dsh,
        )
        self._rec_from_idx = jax.jit(
            res_codec._rec_from_idx.__wrapped__,
            in_shardings=(repl, dsh), out_shardings=dsh,
        )

    def compress(self, params, x) -> Tuple[List[bytes], List[bytes], dict]:
        res = self.res
        cfg = res.codec.model.cfg
        H, W = res.input_size
        B = int(x.shape[0])
        assert B % self.D == 0, (B, self.D)
        local_images = B // self.D
        idx = self._encode_idx(res.vq_params, x)
        rec = self._rec_from_idx(res.vq_params, idx)
        resid = x - rec
        patches = patch_split(resid, cfg.H, cfg.W)  # image-major order
        rec_patches = patch_split(rec, cfg.H, cfg.W)
        blobs, info = self.sharded.compress(params, patches, rec_patches)
        K = int(res.vqvae.embed_num)
        idx_np = np.asarray(idx)
        idx_blobs = [
            _pack_indices(
                idx_np[d * local_images : (d + 1) * local_images], K
            )
            for d in range(self.D)
        ]
        info = dict(info)
        info["images"] = B
        return idx_blobs, blobs, info

    def decompress(self, params, idx_blobs: Sequence[bytes],
                   blobs: Sequence[bytes], info: dict):
        res = self.res
        cfg = res.codec.model.cfg
        H, W = res.input_size
        assert len(idx_blobs) == self.D, (len(idx_blobs), self.D)
        parts = [_unpack_indices(b)[0] for b in idx_blobs]
        idx = np.concatenate(parts, axis=0)
        rec = self._rec_from_idx(res.vq_params, jax.numpy.asarray(idx))
        rec_patches = patch_split(rec, cfg.H, cfg.W)
        patches = self.sharded.decompress(params, blobs, info, rec_patches)
        resid = patch_merge(patches, H, W)
        return resid + rec

    def coded_bits(self, idx_blobs, blobs) -> int:
        return 8 * sum(len(b) for b in idx_blobs) + sum(
            8 * len(b) for b in blobs
        )

    def real_bpd(self, idx_blobs, blobs, info: dict) -> float:
        H, W = self.res.input_size
        numel = info["images"] * H * W * self.res.codec.model.cfg.C
        return self.coded_bits(idx_blobs, blobs) / float(numel)


class ShardedTwoLevelCodec:
    """Chip-local two-level pyramid codec over a mesh.

    Blob layout: D * rough.nsplit rough containers (device-major), then
    D * fine.nsplit fine containers (device-major) -- device d's slice is
    exactly TwoLevelCodec.compress of its image shard."""

    def __init__(self, codec: TwoLevelCodec, mesh: Mesh):
        self.tl = codec
        self.mesh = mesh
        self.D = _mesh_size(mesh)
        self.rough = ShardedFlowCodec(codec.rough_codec, mesh)
        self.fine = ShardedFlowCodec(codec.fine_codec, mesh)
        repl, dsh = replicate(mesh), shard_batch(mesh)
        self._split = jax.jit(
            codec._split.__wrapped__,
            in_shardings=(repl, dsh), out_shardings=(dsh, dsh),
        )
        self._unpool = jax.jit(
            codec._unpool.__wrapped__,
            in_shardings=(repl, dsh), out_shardings=dsh,
        )

    def compress(self, params, x) -> Tuple[List[bytes], dict]:
        B = int(x.shape[0])
        assert B % self.D == 0, (B, self.D)
        rx, px = self._split(params, x)
        r_blobs, r_info = self.rough.compress(
            self.tl._sub(params, "rough"), rx
        )
        f_blobs, f_info = self.fine.compress(
            self.tl._sub(params, "fine"), px
        )
        info = {"batch": B, "devices": self.D,
                "rough": r_info, "fine": f_info}
        return r_blobs + f_blobs, info

    def decompress(self, params, blobs: Sequence[bytes], info: dict):
        cfg = self.tl.cfg
        nr = self.D * cfg.rough.nsplit
        rx = self.rough.decompress(
            self.tl._sub(params, "rough"), blobs[:nr], info["rough"]
        )
        px = self.fine.decompress(
            self.tl._sub(params, "fine"), blobs[nr:], info["fine"]
        )
        fx = patch_merge(px, cfg.Hp, cfg.Wp)
        x = self._unpool(params, rx) + fx
        return x[:, : cfg.H, : cfg.W, :]

    def device_slice(self, blobs: Sequence[bytes], d: int) -> List[bytes]:
        """Device d's containers in plain TwoLevelCodec.compress order."""
        cfg = self.tl.cfg
        nr, nf = cfg.rough.nsplit, cfg.fine.nsplit
        rough_all = blobs[: self.D * nr]
        fine_all = blobs[self.D * nr :]
        return (
            list(rough_all[d * nr : (d + 1) * nr])
            + list(fine_all[d * nf : (d + 1) * nf])
        )

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        cfg = self.tl.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return sum(8 * len(b) for b in blobs) / float(numel)
