"""Sharded, chip-local rANS coding over a device mesh.

The reference has no distributed code at all (SURVEY.md section 2); this is
the TPU-native design for coding sharded eval batches: the image batch is
sharded over the mesh's data axes, and EVERY DEVICE RUNS ITS OWN
INTERLEAVED rANS STREAMS over its local shard -- stream state never
crosses a device boundary, so each device's bitstream is bit-identical to
what a single-device encode of that shard would produce, regardless of
topology.  The containers are packed per device (one sync for all of
them), and any single device -- or a single-chip deployment -- can decode
any shard's container alone.

Built on shard_map: the per-device kernel is exactly the single-chip
encode/decode core (codec/interleaved.py), so all coder semantics,
golden tests, and the container format are shared.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..codec.container import pack_streams_many, unpack_streams
from ..codec.interleaved import (
    EncodedStreams,
    _decode_core,
    _encode_core,
    _plan_steps,
    pick_num_streams,
)


def _data_axes(mesh: Mesh) -> Tuple[str, ...]:
    return tuple(mesh.axis_names)


def sharded_encode(latents, means, logscales, mesh: Mesh,
                   num_streams: int = 8192) -> List[bytes]:
    """Encode a batch-sharded latent tensor to ONE container per device.

    latents/means/logscales: [B, ...] with B divisible by the mesh size;
    shard i covers rows [i*b, (i+1)*b).  Returns mesh-size containers;
    decode each with sharded_decode (or any single device via
    codec.coder.decode_tensor semantics -- same container format).
    """
    axes = _data_axes(mesh)
    D = int(np.prod([mesh.shape[a] for a in axes]))
    B = latents.shape[0]
    assert B % D == 0, (B, D)
    n_local = int(np.prod(latents.shape)) // D
    S = pick_num_streams(n_local, num_streams)
    k = _plan_steps(n_local, S)
    cap = k * S

    def kernel(z, m, ls):
        v = jnp.round(z.astype(jnp.float32) * 256.0).astype(jnp.int32)
        buf, total, hi, lo, oowc, oow, v_orig = _encode_core(
            v.reshape(-1), m.reshape(-1),
            jnp.exp(ls.astype(jnp.float32)).reshape(-1), S, k, False, None,
        )
        return (
            buf[None], total[None], hi[None], lo[None], oowc[None],
            oow[None], v_orig[None],
        )

    spec = P(axes)
    out_spec = tuple([P(axes)] * 7)
    bufs, totals, his, los, oowcs, oows, vorigs = shard_map(
        kernel, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=out_spec, check_vma=False,
    )(latents, means, logscales)

    encs = [
        EncodedStreams(
            words=bufs[d], num_words=totals[d], state_hi=his[d],
            state_lo=los[d], n=n_local, num_streams=S,
            oow_count=oowcs[d], oow_mask=oows[d], orig_values=vorigs[d],
        )
        for d in range(D)
    ]
    return pack_streams_many(encs)  # one host sync packs every device


def sharded_decode(blobs: Sequence[bytes], means, logscales, mesh: Mesh):
    """Decode per-device containers back to the sharded latent tensor.

    means/logscales must be the same (regenerated) parameter tensors used
    at encode time.  Returns float32 grid values in means' shape; raises
    ValueError if any device's streams fail the state invariant."""
    axes = _data_axes(mesh)
    D = int(np.prod([mesh.shape[a] for a in axes]))
    encs = [unpack_streams(b) for b in blobs]
    assert len(encs) == D, (len(encs), D)
    S = encs[0].num_streams
    n_local = encs[0].n
    k = _plan_steps(n_local, S)
    bufs = np.stack([np.asarray(e.words) for e in encs])
    nws = np.asarray([e.num_words for e in encs], np.int32)
    his = np.stack([np.asarray(e.state_hi) for e in encs])
    los = np.stack([np.asarray(e.state_lo) for e in encs])

    def kernel(buf, nw, hi, lo, m, ls):
        vals, hi2, lo2, _ = _decode_core(
            buf[0], nw[0], hi[0], lo[0], m.reshape(-1),
            jnp.exp(ls.astype(jnp.float32)).reshape(-1), S, k,
        )
        ok = jnp.logical_and(
            jnp.all(hi2 == jnp.uint32(1)), jnp.all(lo2 == jnp.uint32(0))
        )
        return vals[None], ok[None]

    spec = P(axes)
    vals, oks = shard_map(
        kernel, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec), check_vma=False,
    )(bufs, nws, his, los, means, logscales)
    vals_np, oks_np = jax.device_get((vals, oks))  # one sync for everything
    fixed = np.array(vals_np).reshape(-1)
    # out-of-window escapes ride per-container side channels
    for d, e in enumerate(encs):
        if e.oow_count:
            idx = np.asarray(e.oow_idx, np.int64) + d * n_local
            fixed[idx] = np.asarray(e.oow_vals, np.int32)
    if not bool(np.all(oks_np)):
        raise ValueError("rANS decode failed: state did not return to 2^32")
    return (fixed.astype(np.float32) / 256.0).reshape(np.shape(means))
