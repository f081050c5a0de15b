"""Sharded full-model compression: FlowCodec over a device mesh.

Extends parallel/codec.py (raw latent tensors) to the ENTIRE pipeline --
flows + priors + rANS run chip-local on each device's batch shard via
shard_map, so stream state never crosses a device boundary and every
device's containers are BYTE-IDENTICAL to a single-device
FlowCodec.compress of its shard (tests/test_parallel.py asserts this).
Any shard's containers can therefore be decoded alone on one chip, and a
mesh decode reconstructs the full batch with one collective-free program.

The per-device kernel is literally FlowCodec.compress_pipeline /
decompress_pipeline (models/exact.py) -- the single-chip fused programs --
wrapped in shard_map with replicated params; no coder semantics fork.
Reference analogue: none (the reference is single-GPU, SURVEY.md section 2;
its Encode/Decode drivers are coder.py:18-38).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..codec.container import pack_streams_many, unpack_streams
from ..codec.interleaved import EncodedStreams
from ..models.exact import FlowCodec


def _mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


class ShardedFlowCodec:
    """Chip-local FlowCodec over a mesh.

    compress returns (blobs, info) where blobs is a flat list of
    D * nsplit containers (device-major: device d's level-l container at
    index d * nsplit + l) -- each decodable independently by a plain
    FlowCodec given that device's shard."""

    def __init__(self, codec: FlowCodec, mesh: Mesh):
        self.codec = codec
        self.mesh = mesh
        self.axes = tuple(mesh.axis_names)
        self.D = _mesh_size(mesh)
        self.cfg = codec.cfg

    # -- compress -----------------------------------------------------

    def _local_fold(self, batch: int) -> int:
        local_b = batch // self.D
        return 1 if self.cfg.batch_squeeze else local_b

    def compress(self, params, x, cond=None) -> Tuple[List[bytes], dict]:
        cfg = self.cfg
        D = self.D
        batch = int(x.shape[0])
        assert batch % D == 0, (batch, D)
        local_b = batch // D
        spec = P(self.axes)

        def kernel(params, x_l, cond_l):
            outs = self.codec.compress_pipeline(params, x_l, cond_l, local_b)
            # flatten nsplit x 7 arrays, each with a leading device axis
            return tuple(o[i][None] for o in outs for i in range(7))

        in_specs = (P(), spec, spec if cond is not None else P())
        nsplit = cfg.nsplit
        out_specs = tuple([spec] * (7 * nsplit))
        flat = shard_map(
            kernel, mesh=self.mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        )(params, x, cond)

        fold = self._local_fold(batch)
        encs = []
        for d in range(D):
            for level in range(nsplit):
                o = flat[7 * level : 7 * level + 7]
                p = self.codec.plans[level]
                encs.append(
                    EncodedStreams(
                        words=o[0][d], num_words=o[1][d], state_hi=o[2][d],
                        state_lo=o[3][d],
                        n=fold * p.z_ch * p.h * p.w,
                        num_streams=self.codec._level_S(level, fold),
                        oow_count=o[4][d], oow_mask=o[5][d],
                        orig_values=o[6][d],
                        donated=(
                            self.codec._level_S(level + 1, fold)
                            if level + 1 < nsplit
                            else 0
                        ),
                    )
                )
        blobs = pack_streams_many(encs)  # one sync packs every device
        return blobs, {"batch": batch, "devices": D}

    # -- decompress ---------------------------------------------------

    def decompress(self, params, blobs: Sequence[bytes], info: dict,
                   cond=None):
        cfg = self.cfg
        D = info["devices"]
        assert D == self.D, (D, self.D)
        batch = info["batch"]
        local_b = batch // D
        nsplit = cfg.nsplit
        assert len(blobs) == D * nsplit, (len(blobs), D, nsplit)
        MAXO = self.codec.MAX_OUTLIERS
        encs = [unpack_streams(b) for b in blobs]
        if any(e.oow_count > MAXO for e in encs):
            raise ValueError(
                f"shard container has more than {MAXO} out-of-window "
                "escapes; decode it with a single-device FlowCodec"
            )

        # stack per-level arrays with a leading device axis, DECODE order
        # (level nsplit-1 first) to match decompress_pipeline's contract
        bufs, nws, his, los, dons, oidx, ovals = (
            [], [], [], [], [], [], []
        )
        for level in range(nsplit - 1, -1, -1):
            es = [encs[d * nsplit + level] for d in range(D)]
            bufs.append(np.stack([np.asarray(e.words) for e in es]))
            nws.append(np.asarray([e.num_words for e in es], np.int32))
            his.append(np.stack([np.asarray(e.state_hi) for e in es]))
            los.append(np.stack([np.asarray(e.state_lo) for e in es]))
            dons.append(np.asarray([e.donated for e in es], np.int32))
            idx = np.full((D, MAXO), 1 << 30, np.int32)
            vals = np.zeros((D, MAXO), np.int32)
            for d, e in enumerate(es):
                if e.oow_count:
                    m = int(e.oow_count)
                    idx[d, :m] = np.asarray(e.oow_idx, np.int32)
                    vals[d, :m] = np.asarray(e.oow_vals, np.int32)
            oidx.append(idx)
            ovals.append(vals)

        spec = P(self.axes)

        def kernel(params, bufs, nws, his, los, dons, oidx, ovals, cond_l):
            x, oks = self.codec.decompress_pipeline(
                params,
                tuple(b[0] for b in bufs),
                tuple(n[0] for n in nws),
                tuple(h[0] for h in his),
                tuple(l[0] for l in los),
                tuple(d[0] for d in dons),
                tuple(i[0] for i in oidx),
                tuple(v[0] for v in ovals),
                cond_l,
                local_b,
            )
            return x, oks[None]

        lvl_specs = tuple([spec] * nsplit)
        x, oks = shard_map(
            kernel, mesh=self.mesh,
            in_specs=(P(),) + (lvl_specs,) * 7
            + (spec if cond is not None else P(),),
            out_specs=(spec, spec), check_vma=False,
        )(
            params, tuple(bufs), tuple(nws), tuple(his), tuple(los),
            tuple(dons), tuple(oidx), tuple(ovals), cond,
        )
        FlowCodec._check_oks([oks])
        return x

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        cfg = self.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return sum(8 * len(b) for b in blobs) / float(numel)
