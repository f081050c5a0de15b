"""Real two-level compression (BEYOND the reference: TwoLevelFlows is only
ever trained/evaluated analytically there -- its coding path does not
exist; reference: flows.py:185-274, trainer.py:361-457 have no coder).

Pipeline: replication-pad -> pool to rough size (rounded to the grid) ->
rough IDFlow + rANS; fine residual = padded - upsample(rough) -> patch
tiles -> fine IDFlow + rANS.  Decode: rough first, then fine, then
x = upsample(rough) + merge(fine patches), crop the padding.

Exactness requires the upsample to preserve the 1/256 grid, which holds
exactly when the coded dims are divisible by the rough dims (the adaptive
"pool" transpose is then nearest-replication -- true for the reference's
own config: 216/27 = 184/23... = 8).  For any OTHER geometry the trainer
accepts (the reference pools any ratio, flows.py:209-213), the codec pads
FURTHER internally -- replication pad up to the smallest dims divisible by
both the rough dims (grid-exact unpool) and the fine tile dims (exact
tiling), coded, cropped on decode.  No side information: the internal
geometry is a pure function of the model config.  The rough image then
pools from a slightly larger padded field than the trainer's (extra
replicated edge rows averaged in) -- a rate detail, never a correctness
one, since the decoder reads the coded rough image from the stream.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.reshape import patch_merge, patch_split
from ..ops.rounding import round_to_grid
from .exact import FlowCodec
from .idflow import IDFlow
from .twolevel import TwoLevelFlow, adaptive_pool_matrix


class TwoLevelCodec:
    def __init__(self, model: TwoLevelFlow, num_streams: int = 4096,
                 granularity: str = "level"):
        cfg = model.cfg
        self.cfg = cfg
        self.model = model
        self.rough = IDFlow(cfg.rough)
        self.fine = IDFlow(cfg.fine)
        self.rough_codec = FlowCodec(self.rough, num_streams, granularity)
        self.fine_codec = FlowCodec(self.fine, num_streams, granularity)

        if cfg.Hp % cfg.rough.H or cfg.Wp % cfg.rough.W:
            # non-divisible trainer geometry: code over internally padded
            # dims (Hc, Wc) -- smallest multiples of lcm(rough, fine tile)
            # covering the trainer's padded size, so pooling averages an
            # integer window (grid-exact after round) and unpool is pure
            # replication (exactly invertible residual arithmetic)
            self.Hc = -(-cfg.Hp // math.lcm(cfg.rough.H, cfg.fine.H)) * \
                math.lcm(cfg.rough.H, cfg.fine.H)
            self.Wc = -(-cfg.Wp // math.lcm(cfg.rough.W, cfg.fine.W)) * \
                math.lcm(cfg.rough.W, cfg.fine.W)
        else:
            self.Hc, self.Wc = cfg.Hp, cfg.Wp

        if (self.Hc, self.Wc) == (cfg.Hp, cfg.Wp):
            def _split(params, x):
                return model.apply(
                    params, x, method=TwoLevelFlow.split_levels
                )

            def _unpool(params, rx):
                return model.apply(params, rx, method=TwoLevelFlow.unpool)
        else:
            ph = jnp.asarray(adaptive_pool_matrix(self.Hc, cfg.rough.H))
            pw = jnp.asarray(adaptive_pool_matrix(self.Wc, cfg.rough.W))
            uh = jnp.asarray(adaptive_pool_matrix(cfg.rough.H, self.Hc))
            uw = jnp.asarray(adaptive_pool_matrix(cfg.rough.W, self.Wc))
            eh, ew = self.Hc - cfg.H, self.Wc - cfg.W

            def _up(rx):
                # divisible ratio -> every matrix row is a one-hot:
                # replication upsampling, exact on the 1/256 grid
                return jnp.einsum("bhwc,Hh,Ww->bHWc", rx, uh, uw)

            def _split(params, x):
                x = jnp.pad(
                    x, ((0, 0), (0, eh), (0, ew), (0, 0)), mode="edge"
                )
                rx = round_to_grid(
                    jnp.einsum("bhwc,Hh,Ww->bHWc", x, ph, pw), cfg.nbits
                )
                fx = x - _up(rx)
                return rx, patch_split(fx, cfg.fine.H, cfg.fine.W)

            def _unpool(params, rx):
                return _up(rx)

        self._split = jax.jit(_split)
        self._unpool = jax.jit(_unpool)

    @staticmethod
    def _sub(params, name):
        return {"params": params["params"][name]}

    def _compress_deferred(self, params, x):
        """Dispatch both levels' encodes sync-free; returns
        (deferred encs, info) for a caller that packs many batches'
        containers in one transfer.  Containers pack per-encode, so the
        combined pack is byte-identical to two separate ones."""
        rx, px = self._split(params, x)
        r_encs, r_info = self.rough_codec._compress_deferred(
            self._sub(params, "rough"), rx
        )
        f_encs, f_info = self.fine_codec._compress_deferred(
            self._sub(params, "fine"), px
        )
        info = {"batch": int(x.shape[0]), "rough": r_info, "fine": f_info}
        return list(r_encs) + list(f_encs), info

    def compress(self, params, x) -> Tuple[List[bytes], dict]:
        from ..codec.container import pack_streams_many

        encs, info = self._compress_deferred(params, x)
        return pack_streams_many(encs), info  # ONE sync, both levels

    def compress_many(self, params, xs):
        """Pipelined serving encode: dispatch every batch's rough+fine
        pipelines, then one pack sync for all containers.  Returns a
        list of (blobs, info)."""
        from ..codec.container import pack_streams_many

        per = [self._compress_deferred(params, x) for x in xs]
        flat = [e for encs, _ in per for e in encs]
        blobs = pack_streams_many(flat)
        out, pos = [], 0
        for encs, info in per:
            out.append((blobs[pos : pos + len(encs)], info))
            pos += len(encs)
        return out

    def _decompress_deferred(self, params, blobs, info):
        """Dispatch one batch's two-level decode sync-free ->
        (device x, oks).  Rough and fine streams are independent, so both
        decodes overlap on device."""
        cfg = self.cfg
        nr = cfg.rough.nsplit
        rx, oks_r = self.rough_codec._decompress_deferred(
            self._sub(params, "rough"), blobs[:nr], info["rough"]
        )
        px, oks_f = self.fine_codec._decompress_deferred(
            self._sub(params, "fine"), blobs[nr:], info["fine"]
        )
        fx = patch_merge(px, self.Hc, self.Wc)
        x = self._unpool(params, rx) + fx
        return x[:, : cfg.H, : cfg.W, :], list(oks_r) + list(oks_f)

    def decompress(self, params, blobs: Sequence[bytes], info: dict,
                   fetch: bool = False):
        """fetch=True returns host numpy and folds the result transfer
        into the SAME device_get as the state-invariant check."""
        x, oks = self._decompress_deferred(params, blobs, info)
        if fetch:
            x_np, got = jax.device_get((x, oks))
            FlowCodec._check_got(got)
            return x_np
        FlowCodec._check_oks(oks)
        return x

    def decompress_many(self, params, packed, fetch: bool = False):
        """Pipelined decode of [(blobs, info), ...]: dispatch every
        batch, then ONE sync verifying all state invariants (fetch=True
        also returns all decoded batches in that sync)."""
        xs, oks = [], []
        for blobs, info in packed:
            x, ok = self._decompress_deferred(params, blobs, info)
            xs.append(x)
            oks.extend(ok)
        if fetch:
            xs_np, got = jax.device_get((xs, oks))
            FlowCodec._check_got(got)
            return xs_np
        FlowCodec._check_oks(oks)
        return xs

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        cfg = self.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return sum(8 * len(b) for b in blobs) / float(numel)
