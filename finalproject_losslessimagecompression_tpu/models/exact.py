"""FlowCodec: bit-exact image compression/decompression with IDFlow + rANS.

This is the REAL compression algorithm the reference never finished
(its IDFlows.encode/decode are empty stubs, reference flows.py:177-181, and
its in-training coding test reuses forward-pass means at decode,
trainer.py:304-327).  Decoding here regenerates every prior from
already-decoded conditioning, level by level, interleaved with rANS decode.

Bit-exactness strategy.  Grid arithmetic (gathers, space-to-depth, adds of
1/256-grid values below 2^16) is exact in float32 in any program.  The NN
evaluations are the only cross-program risk:

- The PRIOR heads must produce identical (mean, logscale) at encode and
  decode time -- these parameterize the rANS CDF, so they always run
  through ONE shared jitted `_prior` executable on both sides.
- The COUPLING shifts t(xa) must match between the forward pass (compress)
  and the inverse pass (decompress).  Two granularities:
    * granularity="level" (default): whole-level fused programs (one jit
      dispatch per level).  The coupling convs appear in two different XLA
      programs; determinism holds because identical conv HLOs with
      identical shapes/layouts compile to identical kernels, and XLA's
      elementwise fusion never changes f32 values.  Verified on hardware by
      the bench/round-trip tests every run.
    * granularity="nn": every coupling NN runs through its own shared jit
      (compress and decompress literally execute the same binary) --
      airtight, at the cost of many small dispatches.

Dispatch discipline: under remote-tunnel runtimes each eager op is a host
round trip; the level path costs ~4 dispatches per level per direction.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.interleaved import make_seeds
from ..ops.reshape import depth_to_space, space_to_depth
from .config import level_plans
from .idflow import IDFlow, flow_permutations, fold_batch, unfold_batch
from .invertible import coupling_split, inverse_permutation


class FlowCodec:
    MAX_OUTLIERS = 256  # per level, for the fused decompress path

    def __init__(
        self,
        model: IDFlow,
        num_streams: int = 8192,
        granularity: str | None = None,
    ):
        # "fused" (default on TPU): the entire compress / decompress
        #   pipeline as ONE program each -- fewest dispatches, which is
        #   what single-image latency is made of on remote-tunnel
        #   runtimes.  The big XLA program compiles slowly the FIRST time;
        #   the persistent compilation cache (.jax_cache/, see bench.py /
        #   cli) makes subsequent runs pay only dispatch.
        # "level" (default off-TPU): one program per level per direction
        #   -- good dispatch economy at moderate compile cost (tests
        #   compile dozens of model variants on CPU; fused would dominate
        #   suite runtime there).
        # "nn": every coupling NN through its own shared executable --
        #   airtight encode/decode bit-parity, many small dispatches.
        if granularity is None:
            try:
                on_tpu = jax.devices()[0].platform == "tpu"
            except Exception:
                on_tpu = False
            granularity = "fused" if on_tpu else "level"
        assert granularity in ("fused", "level", "nn")
        self.model = model
        self.cfg = model.cfg
        self.num_streams = num_streams
        self.granularity = granularity
        self.plans = level_plans(self.cfg)
        self.perms = flow_permutations(self.cfg)
        self.inv_perms = [
            [inverse_permutation(p) for p in lvl] for lvl in self.perms
        ]
        self.a_chs = [
            coupling_split(p.channel, self.cfg.couple.split)[0]
            for p in self.plans
        ]
        cfg = self.cfg

        # ---- shared prior executable (both directions MUST use this) ----
        def _prior(params, ref, level, cond_l):
            return model.apply(
                params, ref, level, cond_l, method=IDFlow.prior_params
            )

        self._prior = jax.jit(_prior, static_argnums=(2,))

        def _cond(params, cond):
            return model.apply(params, cond, method=IDFlow.cond_features)

        self._cond = jax.jit(_cond)

        # ---- level-fused programs (fast path) ----
        def _level_fwd(params, x, level):
            """squeeze -> flows -> split; returns (z, keep)."""
            x = space_to_depth(x, cfg.extend_scale)
            x = model.apply(params, x, level, method=IDFlow._flow_level)
            p = self.plans[level]
            if level == cfg.nsplit - 1:
                return x, x[..., :0]
            return x[..., : p.z_ch], x[..., p.z_ch :]

        def _level_inv(params, z, keep, level):
            """concat -> inverse flows -> unsqueeze; keep is None at the
            last level."""
            x = z if keep is None else jnp.concatenate([z, keep], axis=-1)
            x = model.apply(
                params, x, level, method=IDFlow._flow_level_inverse
            )
            return depth_to_space(x, cfg.extend_scale)

        self._level_fwd = jax.jit(_level_fwd, static_argnums=(2,))
        self._level_inv = jax.jit(_level_inv, static_argnums=(3,))

        # ---- per-NN shared executable (conservative path) ----
        def _t(params, xa, level, step):
            return model.apply(params, xa, level, step, method=IDFlow.couple_t)

        self._t = jax.jit(_t, static_argnums=(2, 3))

        self._fold = jax.jit(fold_batch, static_argnums=(1,))
        self._unfold = jax.jit(unfold_batch, static_argnums=(1,))

        # ---- fully-fused single-program paths (default) ----
        from ..codec.interleaved import (
            _decode_core,
            _encode_core,
            _pallas_ok,
            _plan_steps,
            pick_num_streams,
        )

        def _level_symbol_counts():
            out = []
            for p in self.plans:
                out.append(p.z_ch * p.h * p.w)
            return out

        self._plan_steps = _plan_steps
        self._pick = pick_num_streams

        def _compress_all(params, x, cond, batch):
            """Whole compress pipeline (flows + priors + rANS) as one
            program; returns per-level raw stream tuples.

            Bits-back chain: level l + 1's streams are seeded from level
            l's word buffer, and level l's container then OMITS those
            donated words (set via EncodedStreams.donated outside this
            program) -- the decoder, which walks levels nsplit-1 .. 0,
            recovers them as level l + 1's final lo limbs and fills the
            hole before decoding level l.  Only level 0 (decoded last) is
            unseeded; it uses longer streams to amortize its ~37-bit
            per-stream flush waste."""
            if cfg.batch_squeeze:
                x = fold_batch(x, cfg.batch_squeeze)
            conds = (
                model.apply(params, cond, method=IDFlow.cond_features)
                if cfg.conditional
                else None
            )
            fold = 1 if cfg.batch_squeeze else batch
            outs = []
            seeds = None
            for level in range(cfg.nsplit):
                z, keep = _level_fwd(params, x, level)
                last = level == cfg.nsplit - 1
                ref = z if last else keep
                mean, logscale = model.apply(
                    params, ref, level,
                    conds[level] if conds else None,
                    method=IDFlow.prior_params,
                )
                v = jnp.round(z * 256.0).astype(jnp.int32).reshape(-1)
                S = self._level_S(level, fold)
                k = self._plan_steps(v.shape[0], S)
                o = _encode_core(
                    v, mean.reshape(-1), jnp.exp(logscale).reshape(-1),
                    S, k, _pallas_ok(S, k), seeds
                )
                outs.append(o)
                if not last:
                    S_next = self._level_S(level + 1, fold)
                    take = min(S_next, o[0].shape[0])
                    w = jnp.zeros((S_next,), jnp.uint32).at[:take].set(
                        o[0][:take]
                    )
                    idx = jnp.arange(S_next, dtype=jnp.int32)
                    seeds = jnp.where(idx < o[1], w, jnp.uint32(0))
                x = keep
            return outs

        def _decompress_all(params, bufs, num_words, his, los, donated,
                            oow_idx, oow_vals, cond, batch):
            """Whole decompress pipeline as one program.  Outlier patches
            (idx/vals padded to MAX_OUTLIERS, sentinel idx = n dropped)
            apply to each level's decoded symbols before inversion.

            bufs/num_words/his/los/donated are per-container, in DECODE
            order (level nsplit-1 first).  donated[i] is container i's
            bits-back hole size: its first donated[i] words are zeros in
            bufs[i] and are restored from the final lo limbs of the
            previously-decoded level (the streams they seeded)."""
            fold = 1 if cfg.batch_squeeze else batch
            conds = (
                model.apply(params, cond, method=IDFlow.cond_features)
                if cfg.conditional
                else None
            )
            x = None
            prev_lo = None
            oks = []
            for i, level in enumerate(range(cfg.nsplit - 1, -1, -1)):
                p = self.plans[level]
                last = level == cfg.nsplit - 1
                if last:
                    ref = jnp.zeros((fold, p.h, p.w, p.z_ch), jnp.float32)
                else:
                    ref = x
                mean, logscale = model.apply(
                    params, ref, level,
                    conds[level] if conds else None,
                    method=IDFlow.prior_params,
                )
                n = fold * p.z_ch * p.h * p.w
                S = self._level_S(level, fold)
                k = self._plan_steps(n, S)
                buf_l = bufs[i]
                if prev_lo is not None:
                    # fill this container's donated hole from the seeds
                    # recovered by the previous level's decode
                    take = min(int(prev_lo.shape[0]), int(buf_l.shape[0]))
                    filled = jnp.zeros_like(buf_l).at[:take].set(
                        prev_lo[:take]
                    )
                    sel = jax.lax.iota(jnp.int32, buf_l.shape[0]) < donated[i]
                    buf_l = jnp.where(sel, filled, buf_l)
                vals, hi2, lo2, _ = _decode_core(
                    buf_l, num_words[i], his[i], los[i],
                    mean.reshape(-1), jnp.exp(logscale).reshape(-1),
                    S, k, use_pallas=_pallas_ok(S, k),
                )
                # a seeded level (level > 0) verifies hi == 1 plus lo == 0
                # past the donor's donated count; its seeded-lo prefix is
                # the donor's data, verified transitively by level 0's
                # full check (the chain must end exactly at 2^32).  The
                # donor of level l is level l - 1 = container i + 1.
                tail_start = (
                    jnp.int32(0) if level == 0 else donated[i + 1]
                )
                idx = jnp.arange(S, dtype=jnp.int32)
                oks.append(
                    jnp.logical_and(
                        jnp.all(hi2 == jnp.uint32(1)),
                        jnp.all(
                            jnp.logical_or(
                                idx < tail_start, lo2 == jnp.uint32(0)
                            )
                        ),
                    )
                )
                prev_lo = lo2
                vals = vals.at[oow_idx[i]].set(oow_vals[i], mode="drop")
                z = (vals.astype(jnp.float32) / 256.0).reshape(mean.shape)
                x = _level_inv(params, z, None if last else x, level)
            if cfg.batch_squeeze:
                x = unfold_batch(x, cfg.C)
            return x, jnp.stack(oks)

        # raw (unjitted) pipelines, reused by parallel.flow_codec's
        # shard_map kernels so the per-device program is EXACTLY the
        # single-chip one (containers come out byte-identical per shard)
        self.compress_pipeline = _compress_all
        self.decompress_pipeline = _decompress_all
        self._compress_all = jax.jit(_compress_all, static_argnums=(3,))
        self._decompress_all = jax.jit(_decompress_all, static_argnums=(9,))

    # ------------------------------------------------------------------
    # conservative per-NN path (shared t executables, eager plumbing)
    # ------------------------------------------------------------------

    def _nn_level_fwd(self, params, x, level):
        cfg = self.cfg
        x = space_to_depth(x, cfg.extend_scale)
        a = self.a_chs[level]
        for step in range(cfg.nflows):
            x = jnp.take(x, self.perms[level][step], axis=-1)
            xa, xb = x[..., :a], x[..., a:]
            x = jnp.concatenate(
                [xa, xb + self._t(params, xa, level, step)], axis=-1
            )
        x = jnp.take(x, self.perms[level][cfg.nflows], axis=-1)
        p = self.plans[level]
        if level == cfg.nsplit - 1:
            return x, None
        return x[..., : p.z_ch], x[..., p.z_ch :]

    def _nn_level_inv(self, params, z, keep, level):
        cfg = self.cfg
        a = self.a_chs[level]
        x = z if keep is None else jnp.concatenate([z, keep], axis=-1)
        x = jnp.take(x, self.inv_perms[level][cfg.nflows], axis=-1)
        for step in range(cfg.nflows - 1, -1, -1):
            za, zb = x[..., :a], x[..., a:]
            x = jnp.concatenate(
                [za, zb - self._t(params, za, level, step)], axis=-1
            )
            x = jnp.take(x, self.inv_perms[level][step], axis=-1)
        return depth_to_space(x, cfg.extend_scale)

    # ------------------------------------------------------------------

    def _run_level_fwd(self, params, x, level):
        if self.granularity == "level":
            z, keep = self._level_fwd(params, x, level)
            if level == self.cfg.nsplit - 1:
                keep = None
            return z, keep
        return self._nn_level_fwd(params, x, level)

    def _run_level_inv(self, params, z, keep, level):
        if self.granularity == "level":
            return self._level_inv(params, z, keep, level)
        return self._nn_level_inv(params, z, keep, level)

    def _compress_deferred(self, params, x, cond=None):
        """Dispatch the full encode pipeline without any host sync; returns
        (per-level EncodedStreams, info).  Pack with
        container.pack_streams_many to materialize bytes (one sync)."""
        from ..codec.coder import encode_tensor_deferred
        from ..codec.interleaved import EncodedStreams

        cfg = self.cfg
        batch = int(x.shape[0])
        fold = 1 if cfg.batch_squeeze else batch
        if self.granularity == "fused":
            outs = self._compress_all(params, x, cond, batch)
            encs = []
            for level, o in enumerate(outs):
                p = self.plans[level]
                n = fold * p.z_ch * p.h * p.w
                encs.append(
                    EncodedStreams(
                        words=o[0], num_words=o[1], state_hi=o[2],
                        state_lo=o[3], n=n,
                        num_streams=self._level_S(level, fold),
                        oow_count=o[4], oow_mask=o[5], orig_values=o[6],
                        donated=(
                            self._level_S(level + 1, fold)
                            if level + 1 < cfg.nsplit
                            else 0
                        ),
                    )
                )
            return encs, {"batch": batch}

        if cfg.batch_squeeze:
            x = self._fold(x, cfg.batch_squeeze)
        conds = self._cond(params, cond) if cfg.conditional else None
        # Bits-back chain: level l + 1's streams are seeded from level l's
        # word buffer, and level l's container omits those donated words
        # (its `donated` field; container.py drops them from the payload).
        # The decoder walks levels nsplit-1 .. 0, so by the time it needs
        # level l's full buffer it has already decoded level l + 1 and
        # recovered the donated words as that decode's final lo limbs.
        # Only level 0 (decoded last, seeds nothing to recover) is
        # unseeded; it uses longer streams (_level_S) to amortize its
        # ~37-bit per-stream flush waste.
        encs: List = []
        seeds = None
        for level in range(cfg.nsplit):
            z, keep = self._run_level_fwd(params, x, level)
            ref = z if keep is None else keep
            mean, logscale = self._prior(
                params, ref, level, conds[level] if conds else None
            )
            enc = encode_tensor_deferred(
                z, mean, logscale, self.num_streams, seeds,
                sym_per_stream=self._level_sps(level),
            )
            encs.append(enc)
            if level + 1 < cfg.nsplit:
                S_next = self._level_S(level + 1, fold)
                seeds = make_seeds(enc.words, enc.num_words, S_next)
                # the donated count is clamped to the actual word count at
                # pack time (container._pack_fetched)
                enc.donated = S_next
            x = keep
        return encs, {"batch": batch}

    def compress(
        self, params, x, cond=None
    ) -> Tuple[List[bytes], dict]:
        """Encode an image batch (values on the 1/256 grid) to per-level
        rANS containers.  Returns (blobs, info) with decoder metadata.

        All levels are dispatched sync-free, then packed with ONE host
        transfer -- the device pipeline never stalls between levels."""
        from ..codec.container import pack_streams_many

        encs, info = self._compress_deferred(params, x, cond)
        return pack_streams_many(encs), info

    def compress_many(self, params, xs, conds=None):
        """Pipelined serving encode: dispatch ALL batches' pipelines before
        the single host sync that packs every container.  Amortizes the
        per-sync host round-trip (dominant on remote-tunnel runtimes)
        across the whole request queue.  Returns a list of (blobs, info)."""
        from ..codec.container import pack_streams_many

        per_batch = []
        for i, x in enumerate(xs):
            cond = conds[i] if conds is not None else None
            per_batch.append(self._compress_deferred(params, x, cond))
        flat = [e for encs, _ in per_batch for e in encs]
        blobs = pack_streams_many(flat)  # ONE device sync for all batches
        out = []
        pos = 0
        for encs, info in per_batch:
            out.append((blobs[pos : pos + len(encs)], info))
            pos += len(encs)
        return out

    # symbols per stream: level 0 is the only UNSEEDED level (nothing is
    # decoded after it, so nothing can recover donated words from it) and
    # pays ~37 bits of flush waste per stream -- longer streams amortize
    # that at some cost in decode parallelism.  Seeded levels waste only
    # the ~4-bit chain header per stream, so they stay wide.
    UNSEEDED_SYM_PER_STREAM = 256
    SEEDED_SYM_PER_STREAM = 64

    def _level_sps(self, level: int) -> int:
        if level == 0 and self.cfg.nsplit > 1:
            return self.UNSEEDED_SYM_PER_STREAM
        return self.SEEDED_SYM_PER_STREAM

    def _level_S(self, level: int, fold: int) -> int:
        from ..codec.interleaved import pick_num_streams

        p = self.plans[level]
        return pick_num_streams(
            fold * p.z_ch * p.h * p.w, self.num_streams,
            self._level_sps(level),
        )

    def _decompress_deferred(self, params, blobs: Sequence[bytes],
                             info: dict, cond=None):
        """Dispatch the full decode pipeline without the final ok-flag sync;
        returns (x, oks) device values.  Callers aggregate oks and check
        once (see decompress / decompress_many)."""
        cfg = self.cfg
        batch = info["batch"]
        fold = 1 if cfg.batch_squeeze else batch
        if self.granularity == "fused":
            from ..codec.container import unpack_streams

            encs = [unpack_streams(b) for b in blobs]
            # validate container metadata against the model's level plans
            # (the level-granular path gets this from
            # codec.coder.decode_streams_deferred; the fused program derives
            # shapes from the plans, so a mismatched container must be
            # rejected here, not silently tolerated)
            for level, e in enumerate(encs):
                p = self.plans[level]
                want_n = fold * p.z_ch * p.h * p.w
                want_S = self._level_S(level, fold)
                if e.n != want_n or e.num_streams != want_S:
                    raise ValueError(
                        f"container level {level}: symbol count/streams "
                        f"({e.n}, {e.num_streams}) do not match the model "
                        f"plan ({want_n}, {want_S})"
                    )
            if all(e.oow_count <= self.MAX_OUTLIERS for e in encs):
                bufs, nws, his, los, dons = [], [], [], [], []
                oidx, ovals = [], []
                for level in range(cfg.nsplit - 1, -1, -1):
                    e = encs[level]
                    bufs.append(e.words)
                    nws.append(np.int32(e.num_words))
                    his.append(e.state_hi)
                    los.append(e.state_lo)
                    dons.append(np.int32(e.donated))
                    idx = np.full(self.MAX_OUTLIERS, 1 << 30, np.int32)
                    vals = np.zeros(self.MAX_OUTLIERS, np.int32)
                    if e.oow_count:
                        m = int(e.oow_count)
                        idx[:m] = np.asarray(e.oow_idx, np.int32)
                        vals[:m] = np.asarray(e.oow_vals, np.int32)
                    oidx.append(idx)
                    ovals.append(vals)
                x, oks = self._decompress_all(
                    params, tuple(bufs), tuple(nws), tuple(his),
                    tuple(los), tuple(dons), tuple(oidx), tuple(ovals),
                    cond, batch
                )
                if cfg.batch_squeeze:
                    x = x[:batch]
                return x, [oks]
            # too many outliers for the fused path: fall through to the
            # level-granular path below (rare)
        from ..codec.coder import decode_streams_deferred
        from ..codec.container import unpack_streams as _unpack

        conds = self._cond(params, cond) if cfg.conditional else None
        unpacked = [_unpack(b) for b in blobs]
        x = None
        prev_lo = None
        oks = []
        for level in range(cfg.nsplit - 1, -1, -1):
            p = self.plans[level]
            last = level == cfg.nsplit - 1
            if last:
                ref = np.zeros((fold, p.h, p.w, p.z_ch), np.float32)
            else:
                ref = x  # the kept half, already decoded
            mean, logscale = self._prior(
                params, ref, level, conds[level] if conds else None
            )
            # bits-back: this container's donated hole is restored from the
            # previously-decoded level's final lo limbs (the seeds it
            # recovered); verification skips this level's own seeded prefix
            # (its donor's donated count) -- level 0's full check closes
            # the chain.
            tail = 0 if level == 0 else unpacked[level - 1].donated
            z, ok, lo = decode_streams_deferred(
                unpacked[level], mean, logscale,
                fill=None if last else prev_lo, tail_start=tail,
            )
            prev_lo = lo
            oks.append(ok)
            x = self._run_level_inv(params, z, None if last else x, level)
        if cfg.batch_squeeze:
            x = self._unfold(x, cfg.C)[:batch]
        return x, oks

    @staticmethod
    def _check_got(got):
        if not all(bool(np.all(g)) for g in got):
            raise ValueError(
                "rANS decode failed: state did not return to 2^32"
            )

    @staticmethod
    def _check_oks(oks):
        FlowCodec._check_got(jax.device_get(list(oks)))

    def decompress(self, params, blobs: Sequence[bytes], info: dict,
                   cond=None, fetch: bool = False):
        """Decode containers back to the exact input batch.

        fetch=True returns a host numpy array and folds the result transfer
        into the SAME device_get as the state-invariant check -- one host
        round trip total, the single-image latency fast path.  The default
        returns a device array (check sync only; the data stays put for
        downstream device work, e.g. ResidualCodec's res + rec)."""
        x, oks = self._decompress_deferred(params, blobs, info, cond)
        if fetch:
            x_np, got = jax.device_get((x, list(oks)))
            self._check_got(got)
            return x_np
        self._check_oks(oks)  # one sync for all levels
        return x

    def decompress_many(self, params, packed, conds=None,
                        fetch: bool = False):
        """Pipelined serving decode of [(blobs, info), ...]: dispatch every
        batch's decode, then verify ALL state invariants with one sync
        (fetch=True also returns the decoded batches in that same sync).
        Returns the list of decoded batches."""
        xs, oks = [], []
        for i, (blobs, info) in enumerate(packed):
            cond = conds[i] if conds is not None else None
            x, ok = self._decompress_deferred(params, blobs, info, cond)
            xs.append(x)
            oks.extend(ok)
        if fetch:
            xs_np, got = jax.device_get((xs, oks))
            self._check_got(got)
            return xs_np
        self._check_oks(oks)  # ONE sync for the whole queue
        return xs

    def coded_bits(self, blobs: Sequence[bytes]) -> int:
        return sum(8 * len(b) for b in blobs)

    def real_bpd(self, blobs: Sequence[bytes], info: dict) -> float:
        """Coded bits per input dim incl. all overhead (reference analogue:
        (64*nsplit + 32*words)/numel, trainer.py:326-327)."""
        cfg = self.cfg
        numel = info["batch"] * cfg.H * cfg.W * cfg.C
        return self.coded_bits(blobs) / float(numel)
