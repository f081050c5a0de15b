"""FlowCodec: bit-exact image compression/decompression with IDFlow + rANS.

This is the REAL compression algorithm the reference never finished
(its IDFlows.encode/decode are empty stubs, reference flows.py:177-181, and
its in-training coding test reuses forward-pass means at decode,
trainer.py:304-327).  Decoding here regenerates every prior from
already-decoded conditioning, level by level, interleaved with rANS decode.

Bit-exactness strategy: the only float computations whose encode/decode
parity is not IEEE-guaranteed are the NN evaluations (conv reductions,
transcendentals).  Each coupling shift t(xa) and each prior head therefore
runs through ONE shared jitted callable used by BOTH compress and
decompress, so both sides execute the identical XLA executable.  Everything
else on the path -- channel gathers, space-to-depth, grid adds/subs -- is
exact in float32 (grid values are dyadic with 8 fractional bits; sums stay
below 2^16 so no rounding ever occurs).

Within one process this is airtight (the jit cache returns the same
executable).  Across processes it relies on deterministic XLA compilation
for the same jaxlib/hardware, which holds in practice and is covered by
tests/bench.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..codec.coder import decode_tensor, encode_tensor
from ..ops.reshape import depth_to_space, space_to_depth
from .config import level_plans
from .idflow import IDFlow, flow_permutations, fold_batch, unfold_batch
from .invertible import coupling_split, inverse_permutation


class FlowCodec:
    def __init__(self, model: IDFlow, num_streams: int = 1024):
        self.model = model
        self.cfg = model.cfg
        self.num_streams = num_streams
        self.plans = level_plans(self.cfg)
        self.perms = flow_permutations(self.cfg)
        self.inv_perms = [
            [inverse_permutation(p) for p in lvl] for lvl in self.perms
        ]
        self.a_chs = [
            coupling_split(p.channel, self.cfg.couple.split)[0]
            for p in self.plans
        ]

        def _t(params, xa, level, step):
            return model.apply(params, xa, level, step, method=IDFlow.couple_t)

        def _prior(params, ref, level, cond_l):
            return model.apply(
                params, ref, level, cond_l, method=IDFlow.prior_params
            )

        def _cond(params, cond):
            return model.apply(params, cond, method=IDFlow.cond_features)

        # shared executables: compress and decompress MUST go through these
        self._t = jax.jit(_t, static_argnums=(2, 3))
        self._prior = jax.jit(_prior, static_argnums=(2,))
        self._cond = jax.jit(_cond)

    # ------------------------------------------------------------------

    def _couple_forward(self, params, x, level, step):
        x = jnp.take(x, self.perms[level][step], axis=-1)
        a = self.a_chs[level]
        xa, xb = x[..., :a], x[..., a:]
        t = self._t(params, xa, level, step)
        return jnp.concatenate([xa, xb + t], axis=-1)

    def _couple_inverse(self, params, x, level, step):
        a = self.a_chs[level]
        za, zb = x[..., :a], x[..., a:]
        t = self._t(params, za, level, step)
        x = jnp.concatenate([za, zb - t], axis=-1)
        return jnp.take(x, self.inv_perms[level][step], axis=-1)

    def compress(
        self, params, x, cond=None
    ) -> Tuple[List[bytes], dict]:
        """Encode an image batch (values on the 1/256 grid) to per-level
        rANS containers.  Returns (blobs, info) where info carries the
        decoder-side shape metadata."""
        cfg = self.cfg
        batch = int(x.shape[0])
        if cfg.batch_squeeze:
            x = fold_batch(x, cfg.batch_squeeze)
        conds = self._cond(params, cond) if cfg.conditional else None
        blobs: List[bytes] = []
        for level, p in enumerate(self.plans):
            x = space_to_depth(x, cfg.extend_scale)
            for step in range(cfg.nflows):
                x = self._couple_forward(params, x, level, step)
            x = jnp.take(x, self.perms[level][cfg.nflows], axis=-1)
            last = level == cfg.nsplit - 1
            if last:
                z, keep = x, None
            else:
                z, keep = x[..., : p.z_ch], x[..., p.z_ch :]
            mean, logscale = self._prior(
                params, z if last else keep, level,
                conds[level] if conds else None,
            )
            blobs.append(
                encode_tensor(z, mean, logscale, self.num_streams)
            )
            x = keep
        return blobs, {"batch": batch}

    def decompress(self, params, blobs: Sequence[bytes], info: dict, cond=None):
        """Decode containers back to the exact input batch."""
        cfg = self.cfg
        batch = info["batch"]
        fold = 1 if cfg.batch_squeeze else batch
        conds = self._cond(params, cond) if cfg.conditional else None
        x = None
        for level in range(cfg.nsplit - 1, -1, -1):
            p = self.plans[level]
            last = level == cfg.nsplit - 1
            if last:
                ref = jnp.zeros((fold, p.h, p.w, p.z_ch), jnp.float32)
            else:
                ref = x  # the kept half, already decoded
            mean, logscale = self._prior(
                params, ref, level, conds[level] if conds else None
            )
            z = decode_tensor(blobs[level], mean, logscale)
            x = z if last else jnp.concatenate([z, x], axis=-1)
            x = jnp.take(x, self.inv_perms[level][cfg.nflows], axis=-1)
            for step in range(cfg.nflows - 1, -1, -1):
                x = self._couple_inverse(params, x, level, step)
            x = depth_to_space(x, cfg.extend_scale)
        if cfg.batch_squeeze:
            x = unfold_batch(x, cfg.C)[:batch]
        return x

    def coded_bits(self, blobs: Sequence[bytes]) -> int:
        return sum(8 * len(b) for b in blobs)

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        """Coded bits per input dim incl. all overhead (reference analogue:
        (64*nsplit + 32*words)/numel, trainer.py:326-327)."""
        cfg = self.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return self.coded_bits(blobs) / float(numel)
