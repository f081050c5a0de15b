"""Real two-level compression (BEYOND the reference: TwoLevelFlows is only
ever trained/evaluated analytically there -- its coding path does not
exist; reference: flows.py:185-274, trainer.py:361-457 have no coder).

Pipeline: replication-pad -> pool to rough size (rounded to the grid) ->
rough IDFlow + rANS; fine residual = padded - upsample(rough) -> patch
tiles -> fine IDFlow + rANS.  Decode: rough first, then fine, then
x = upsample(rough) + merge(fine patches), crop the padding.

Exactness requires the upsample to preserve the 1/256 grid, which holds
exactly when padded dims are divisible by the rough dims (the adaptive
"pool" transpose is then nearest-replication -- true for the reference's
own config: 216/27 = 184/23... = 8).  Non-divisible ratios would average
grid values off-grid and are rejected.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax

from ..ops.reshape import patch_merge
from .exact import FlowCodec
from .idflow import IDFlow
from .twolevel import TwoLevelFlow


class TwoLevelCodec:
    def __init__(self, model: TwoLevelFlow, num_streams: int = 4096,
                 granularity: str = "level"):
        cfg = model.cfg
        if cfg.Hp % cfg.rough.H or cfg.Wp % cfg.rough.W:
            raise NotImplementedError(
                "two-level coding needs padded dims divisible by the rough "
                "dims (grid-exact nearest upsampling); got "
                f"{(cfg.Hp, cfg.Wp)} vs {(cfg.rough.H, cfg.rough.W)}"
            )
        self.cfg = cfg
        self.model = model
        self.rough = IDFlow(cfg.rough)
        self.fine = IDFlow(cfg.fine)
        self.rough_codec = FlowCodec(self.rough, num_streams, granularity)
        self.fine_codec = FlowCodec(self.fine, num_streams, granularity)

        def _split(params, x):
            return model.apply(params, x, method=TwoLevelFlow.split_levels)

        def _unpool(params, rx):
            return model.apply(params, rx, method=TwoLevelFlow.unpool)

        self._split = jax.jit(_split)
        self._unpool = jax.jit(_unpool)

    @staticmethod
    def _sub(params, name):
        return {"params": params["params"][name]}

    def compress(self, params, x) -> Tuple[List[bytes], dict]:
        rx, px = self._split(params, x)
        r_blobs, r_info = self.rough_codec.compress(
            self._sub(params, "rough"), rx
        )
        f_blobs, f_info = self.fine_codec.compress(
            self._sub(params, "fine"), px
        )
        info = {"batch": int(x.shape[0]), "rough": r_info, "fine": f_info}
        return r_blobs + f_blobs, info

    def decompress(self, params, blobs: Sequence[bytes], info: dict):
        cfg = self.cfg
        nr = cfg.rough.nsplit
        rx = self.rough_codec.decompress(
            self._sub(params, "rough"), blobs[:nr], info["rough"]
        )
        px = self.fine_codec.decompress(
            self._sub(params, "fine"), blobs[nr:], info["fine"]
        )
        fx = patch_merge(px, cfg.Hp, cfg.Wp)
        x = self._unpool(params, rx) + fx
        return x[:, : cfg.H, : cfg.W, :]

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        cfg = self.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return sum(8 * len(b) for b in blobs) / float(numel)
