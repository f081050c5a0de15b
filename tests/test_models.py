"""Flow model contracts: exact invertibility on the integer grid, real
compress->decompress bit-exactness, conditional flows, likelihoods."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finalproject_losslessimagecompression_tpu.models import (
    FlowCfg,
    FlowCodec,
    IDFlow,
    latent_shapes,
    log_likelihood,
)
from finalproject_losslessimagecompression_tpu.ops import round_to_grid


def small_cfg(**kw):
    defaults = dict(
        H=8,
        W=8,
        C=3,
        nflows=2,
        nsplit=2,
        extend_scale=2,
        couple=__import__(
            "finalproject_losslessimagecompression_tpu.models.config",
            fromlist=["CouplingCfg"],
        ).CouplingCfg(
            split=0.75,
            nn=__import__(
                "finalproject_losslessimagecompression_tpu.models.config",
                fromlist=["DenseBlockCfg"],
            ).DenseBlockCfg(growth_channel=8, depth=2, act="LeakyReLU"),
        ),
        prior_nn=__import__(
            "finalproject_losslessimagecompression_tpu.models.config",
            fromlist=["DenseBlockCfg"],
        ).DenseBlockCfg(growth_channel=8, depth=2, act="LeakyReLU"),
    )
    defaults.update(kw)
    return FlowCfg(**defaults)


def randomize_projections(params, key, scale=0.05):
    """Zero-init final convs make couplings identity at init; perturb them so
    invertibility tests actually exercise the coupling NNs."""

    def visit(path, leaf):
        if any(getattr(p, "key", None) == "proj" for p in path):
            k = jax.random.fold_in(key, abs(hash(str(path))) % (2**31))
            return scale * jax.random.normal(k, leaf.shape, leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def grid_batch(rng, shape):
    return round_to_grid(
        jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)), 8
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = IDFlow(cfg)
    rng = np.random.default_rng(1)
    x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
    params = model.init(jax.random.PRNGKey(0), x)
    params = randomize_projections(params, jax.random.PRNGKey(7))
    return cfg, model, params


class TestIDFlow:
    def test_latent_shapes(self, model_and_params, rng):
        cfg, model, params = model_and_params
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        latents, means, logscales = model.apply(params, x)
        shapes = latent_shapes(cfg)
        assert len(latents) == cfg.nsplit
        for z, m, ls, s in zip(latents, means, logscales, shapes):
            assert z.shape == (2,) + s
            assert m.shape == z.shape and ls.shape == z.shape

    def test_latents_on_grid(self, model_and_params, rng):
        cfg, model, params = model_and_params
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        latents, _, _ = model.apply(params, x)
        for z in latents:
            arr = np.asarray(z) * 256
            assert np.array_equal(arr, np.round(arr))

    def test_exact_invertibility(self, model_and_params, rng):
        cfg, model, params = model_and_params
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        latents, _, _ = model.apply(params, x)
        rec = model.apply(params, latents, method=IDFlow.inverse_from_latents)
        assert np.array_equal(np.asarray(rec), np.asarray(x))

    def test_log_likelihood_finite(self, model_and_params, rng):
        cfg, model, params = model_and_params
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        latents, means, logscales = model.apply(params, x)
        lp, per_split = log_likelihood(cfg, latents, means, logscales)
        assert lp.shape == (2,)
        assert np.all(np.isfinite(np.asarray(lp)))
        assert len(per_split) == cfg.nsplit

    def test_sample_shapes(self, model_and_params, rng):
        cfg, model, params = model_and_params
        noises = [
            jnp.zeros((3,) + s, jnp.float32) for s in latent_shapes(cfg)
        ]
        img = model.apply(params, noises, method=IDFlow.sample_from_noise)
        assert img.shape == (3, cfg.H, cfg.W, cfg.C)


class TestFlowCodec:
    def test_compress_decompress_bit_exact(self, model_and_params, rng):
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        blobs, info = codec.compress(params, x)
        assert len(blobs) == cfg.nsplit
        rec = codec.decompress(params, blobs, info)
        assert np.array_equal(np.asarray(rec), np.asarray(x))
        bpd = codec.real_bpd(blobs, info)
        assert 0 < bpd < 16

    def test_compress_many_pipelined(self, model_and_params, rng):
        """The pipelined serving APIs (one sync per queue) must produce
        byte-identical containers to the per-batch API and decode
        bit-exactly."""
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64)
        xs = [grid_batch(rng, (2, cfg.H, cfg.W, cfg.C)) for _ in range(3)]
        packed = codec.compress_many(params, xs)
        assert len(packed) == 3
        for x, (blobs, info) in zip(xs, packed):
            ref_blobs, _ = codec.compress(params, x)
            assert all(a == b for a, b in zip(blobs, ref_blobs))
        recs = codec.decompress_many(params, packed)
        for x, r in zip(xs, recs):
            assert np.array_equal(np.asarray(r), np.asarray(x))
        # a corrupted container in the queue must fail the aggregated check
        blobs0, info0 = packed[0]
        bad = bytearray(blobs0[0])
        bad[-1] ^= 0xFF
        packed_bad = [([bytes(bad)] + list(blobs0[1:]), info0)] + packed[1:]
        with pytest.raises(ValueError):
            codec.decompress_many(params, packed_bad)

    def test_nn_granularity_matches_level(self, model_and_params, rng):
        """The conservative per-NN path and the fused level path must
        produce identical containers and round-trips."""
        cfg, model, params = model_and_params
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        c_level = FlowCodec(model, num_streams=64, granularity="level")
        c_nn = FlowCodec(model, num_streams=64, granularity="nn")
        c_fused = FlowCodec(model, num_streams=64, granularity="fused")
        b1, i1 = c_level.compress(params, x)
        b2, i2 = c_nn.compress(params, x)
        b3, _ = c_fused.compress(params, x)
        assert b1 == b2
        assert b1 == b3
        rec = c_nn.decompress(params, b1, i1)
        assert np.array_equal(np.asarray(rec), np.asarray(x))
        rec2 = c_level.decompress(params, b2, i2)
        assert np.array_equal(np.asarray(rec2), np.asarray(x))

    def test_compress_matches_model_forward(self, model_and_params, rng):
        """The codec's internal forward must produce the same latents as the
        model's fused forward (same params, same math)."""
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        latents, means, logscales = model.apply(params, x)
        blobs, info = codec.compress(params, x)
        from finalproject_losslessimagecompression_tpu.codec.coder import (
            decode_streams_deferred,
        )
        from finalproject_losslessimagecompression_tpu.codec.container import (
            unpack_streams,
        )

        unpacked = [unpack_streams(b) for b in blobs]
        # bits-back chain: every level but the last donates its leading
        # words as the next level's stream seeds; its container has a hole
        # that the decoder fills from the next level's final lo limbs
        assert all(
            unpacked[level].donated > 0 for level in range(cfg.nsplit - 1)
        )
        assert unpacked[cfg.nsplit - 1].donated == 0
        prev_lo = None
        for level in range(cfg.nsplit - 1, -1, -1):
            z, m, ls = latents[level], means[level], logscales[level]
            last = level == cfg.nsplit - 1
            tail = 0 if level == 0 else unpacked[level - 1].donated
            dec, ok, lo = decode_streams_deferred(
                unpacked[level], m, ls,
                fill=None if last else prev_lo, tail_start=tail,
            )
            prev_lo = lo
            assert bool(jax.device_get(ok))
            assert np.array_equal(np.asarray(dec), np.asarray(z))


class TestConditionalFlow:
    def test_conditional_compress_decompress(self, rng):
        cfg = small_cfg(conditional=True, nsplit=2)
        model = IDFlow(cfg)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        cond = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x, cond)
        params = randomize_projections(params, jax.random.PRNGKey(3))
        codec = FlowCodec(model, num_streams=32)
        blobs, info = codec.compress(params, x, cond)
        rec = codec.decompress(params, blobs, info, cond)
        assert np.array_equal(np.asarray(rec), np.asarray(x))

    def test_conv_for_cond(self, rng):
        cfg = small_cfg(conditional=True, conv_for_cond=True, nsplit=2)
        model = IDFlow(cfg)
        x = grid_batch(rng, (1, cfg.H, cfg.W, cfg.C))
        cond = grid_batch(rng, (1, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x, cond)
        latents, means, logscales = model.apply(params, x, cond)
        assert len(latents) == cfg.nsplit


class TestBatchSqueeze:
    def test_fold_roundtrip(self, rng):
        cfg = small_cfg(batch_squeeze=4, nsplit=1)
        model = IDFlow(cfg)
        x = grid_batch(rng, (4, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x)
        params = randomize_projections(params, jax.random.PRNGKey(5))
        codec = FlowCodec(model, num_streams=32)
        blobs, info = codec.compress(params, x)
        rec = codec.decompress(params, blobs, info)
        assert np.array_equal(np.asarray(rec), np.asarray(x))


class TestBFloat16:
    """Mixed-precision coupling/prior NNs (DenseBlockCfg.dtype="bfloat16"):
    params stay float32, the conv stack computes in bfloat16 (MXU-native),
    and the block output returns to float32 -- so grid arithmetic stays
    exact and coding stays bit-exact (the contract is shared-executable
    determinism, models/exact.py, not float32)."""

    def _bf16_cfg(self, **kw):
        from dataclasses import replace

        cfg = small_cfg(**kw)
        return replace(
            cfg,
            couple=replace(cfg.couple, nn=replace(cfg.couple.nn,
                                                  dtype="bfloat16")),
            prior_nn=replace(cfg.prior_nn, dtype="bfloat16"),
        )

    def test_invertible_and_float32_out(self, rng):
        cfg = self._bf16_cfg()
        model = IDFlow(cfg)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x)
        params = randomize_projections(params, jax.random.PRNGKey(7))
        latents, means, logscales = model.apply(params, x)
        for t in (*latents, *means, *logscales):
            assert t.dtype == jnp.float32
        # params untouched by the compute dtype
        assert all(
            leaf.dtype == jnp.float32
            for leaf in jax.tree_util.tree_leaves(params)
        )
        rec = model.apply(params, latents, method=IDFlow.inverse_from_latents)
        assert np.array_equal(np.asarray(rec), np.asarray(x))

    def test_coding_bit_exact_all_granularities(self, rng):
        cfg = self._bf16_cfg()
        model = IDFlow(cfg)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x)
        params = randomize_projections(params, jax.random.PRNGKey(7))
        blobs = {}
        for gran in ("nn", "level", "fused"):
            c = FlowCodec(model, num_streams=64, granularity=gran)
            b, info = c.compress(params, x)
            rec = c.decompress(params, b, info)
            assert np.array_equal(np.asarray(rec), np.asarray(x)), gran
            blobs[gran] = b
        assert blobs["nn"] == blobs["level"] == blobs["fused"]

    def test_gradients_finite(self, rng):
        cfg = self._bf16_cfg()
        model = IDFlow(cfg)
        x = grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            latents, means, logscales = model.apply(p, x)
            lp, _ = log_likelihood(cfg, latents, means, logscales)
            return -jnp.mean(lp)

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(t)).all() for t in flat)
        assert any(float(jnp.abs(t).max()) > 0 for t in flat)


class TestEscapeMatrix:
    """Out-of-window escapes on the FUSED and SHARDED paths (VERDICT r2
    weak #9).  The fused decompress only handles up to MAX_OUTLIERS escapes
    per level in-program; beyond that it must fall back to the
    level-granular path and still round-trip exactly.  The sharded decode
    refuses (decode on a single device instead)."""

    def _outlier_batch(self, cfg, rng, batch=2):
        # a handful of extreme pixels drive |z - mean| past the 2048-bin
        # window at an untrained prior (mean ~ 0, floored logscale)
        x = np.asarray(grid_batch(rng, (batch, cfg.H, cfg.W, cfg.C))).copy()
        x[:, ::3, ::3, 0] += 40.0  # far outside mean +- 4
        return jnp.asarray(x)

    def test_fused_falls_back_beyond_max_outliers(self, model_and_params,
                                                  rng):
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64, granularity="fused")
        codec.MAX_OUTLIERS = 4  # instance override; class default is 256
        x = self._outlier_batch(cfg, rng)
        blobs, info = codec.compress(params, x)
        from finalproject_losslessimagecompression_tpu.codec.container import (
            unpack_streams,
        )

        counts = [unpack_streams(b).oow_count for b in blobs]
        assert max(counts) > 4, counts  # the matrix branch is actually hit

        fused_called = []
        real = codec._decompress_all
        codec._decompress_all = lambda *a, **k: (
            fused_called.append(True) or real(*a, **k)
        )
        rec = codec.decompress(params, blobs, info)
        assert not fused_called  # fell back to the level-granular path
        assert np.array_equal(np.asarray(rec), np.asarray(x))

    def test_fused_handles_outliers_within_budget(self, model_and_params,
                                                  rng):
        """A few escapes stay on the fused path (idx/vals padded into the
        program) and decode exactly."""
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64, granularity="fused")
        x = np.asarray(grid_batch(rng, (2, cfg.H, cfg.W, cfg.C))).copy()
        x[0, 0, 0, 0] += 40.0
        x[1, 3, 2, 1] -= 40.0
        x = jnp.asarray(x)
        blobs, info = codec.compress(params, x)
        from finalproject_losslessimagecompression_tpu.codec.container import (
            unpack_streams,
        )

        assert any(unpack_streams(b).oow_count > 0 for b in blobs)
        rec = codec.decompress(params, blobs, info)
        assert np.array_equal(np.asarray(rec), np.asarray(x))

    def test_sharded_decode_refuses_outlier_overflow(self, model_and_params,
                                                     rng):
        import jax as _jax

        from finalproject_losslessimagecompression_tpu.parallel.flow_codec import (
            ShardedFlowCodec,
        )
        from jax.sharding import Mesh

        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64, granularity="fused")
        codec.MAX_OUTLIERS = 2
        mesh = Mesh(np.array(_jax.devices()[:2]), ("data",))
        sc = ShardedFlowCodec(codec, mesh)
        x = self._outlier_batch(cfg, rng, batch=2)
        blobs, info = sc.compress(params, x)
        with pytest.raises(ValueError, match="out-of-window"):
            sc.decompress(params, blobs, info)
        # the documented remedy works: single-device FlowCodec decode of
        # each shard's containers
        ns = cfg.nsplit
        for d in range(2):
            shard = codec.decompress(
                params, blobs[d * ns : (d + 1) * ns], {"batch": 1}
            )
            assert np.array_equal(np.asarray(shard), np.asarray(x[d : d + 1]))


class TestDecompressFetch:
    def test_fetch_returns_host_arrays(self, model_and_params, rng):
        """fetch=True folds the result transfer into the invariant-check
        sync and returns numpy; values identical to the device path."""
        cfg, model, params = model_and_params
        codec = FlowCodec(model, num_streams=64)
        xs = [grid_batch(rng, (2, cfg.H, cfg.W, cfg.C)) for _ in range(2)]
        packed = codec.compress_many(params, xs)
        recs = codec.decompress_many(params, packed, fetch=True)
        for x, r in zip(xs, recs):
            assert isinstance(r, np.ndarray)
            assert np.array_equal(r, np.asarray(x))
        blobs, info = packed[0]
        one = codec.decompress(params, blobs, info, fetch=True)
        assert isinstance(one, np.ndarray)
        assert np.array_equal(one, np.asarray(xs[0]))


class TestDenseLayerFusion:
    """The fused 1x1->3x3 DenseLayer computes the SAME function as the
    literal two-conv composition (reference: nnlayer.py:44-50), including
    the zero-padding boundary where the 1x1's bias never reaches border
    taps uniformly."""

    def test_fused_matches_two_conv_composition(self, rng):
        from finalproject_losslessimagecompression_tpu.models.layers import (
            DenseLayer,
        )

        C, g, H, W = 5, 7, 6, 9  # odd sizes exercise every border class
        x = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
        key = jax.random.PRNGKey(3)
        fused = DenseLayer(g, "LeakyReLU", fuse=True)
        pf = fused.init(key, x)
        # nonzero biases so the boundary field is actually exercised
        pf = jax.tree_util.tree_map(
            lambda l: l + 0.1 * jnp.arange(l.size, dtype=l.dtype).reshape(
                l.shape
            ) % 1.0,
            pf,
        )
        lp = pf["params"]
        pu = {
            "params": {
                "conv1": {
                    "kernel": lp["conv1_kernel"], "bias": lp["conv1_bias"]
                },
                "conv3": {
                    "kernel": lp["conv3_kernel"], "bias": lp["conv3_bias"]
                },
            }
        }
        unfused = DenseLayer(g, "LeakyReLU", fuse=False)
        yf = fused.apply(pf, x)
        yu = unfused.apply(pu, x)
        np.testing.assert_allclose(
            np.asarray(yf), np.asarray(yu), rtol=1e-5, atol=1e-5
        )

    def test_block_flop_reduction(self):
        """The fused block's compiled cost drops vs the literal form."""
        from finalproject_losslessimagecompression_tpu.models.config import (
            DenseBlockCfg,
        )
        from finalproject_losslessimagecompression_tpu.models.layers import (
            DenseBlock,
        )
        from finalproject_losslessimagecompression_tpu.utils.profiling import (
            compiled_flops,
        )

        # flagship-shaped: wide channels, small per-layer growth -- the
        # regime where the 1x1's C^2 term dominates (fusion wins when
        # 9 * growth_per_layer << B*H*W and C >~ 9 * growth_per_layer)
        x = jnp.zeros((8, 16, 16, 256), jnp.float32)
        flops = {}
        for fuse in (True, False):
            cfg = DenseBlockCfg(growth_channel=64, depth=4, fuse_1x1=fuse)
            m = DenseBlock(32, cfg)
            p = m.init(jax.random.PRNGKey(0), x)
            flops[fuse] = compiled_flops(
                jax.jit(lambda p, x: m.apply(p, x)), p, x
            )
        if flops[True] and flops[False]:
            assert flops[True] < 0.8 * flops[False], flops

    def test_from_ref_default_matches_dataclass(self):
        """The dataclass and YAML defaults must AGREE (r3's bug was the
        silent divergence), and both select the measured-faster variant
        under value-fenced timing (results/mfu_roofline_r04.json: fused
        43.0 vs unfused 46.6 ms/step at flagship scale)."""
        from finalproject_losslessimagecompression_tpu.models.config import (
            DenseBlockCfg,
        )

        assert DenseBlockCfg().fuse_1x1 is DenseBlockCfg.from_ref(
            {}
        ).fuse_1x1
        assert DenseBlockCfg().fuse_1x1 is True
        assert DenseBlockCfg.from_ref({"fuse_1x1": False}).fuse_1x1 is False

    def test_growth_multiple_pads_layer_widths(self):
        """Opt-in non-parity knob: per-layer growth rounds up to the lane
        multiple; default 0 keeps reference growth splits exactly."""
        import jax

        from finalproject_losslessimagecompression_tpu.models.config import (
            DenseBlockCfg,
        )
        from finalproject_losslessimagecompression_tpu.models.layers import (
            DenseBlock,
        )

        x = jnp.zeros((1, 4, 4, 6), jnp.float32)
        cfg = DenseBlockCfg(growth_channel=10, depth=3, growth_multiple=8,
                            fuse_1x1=False)
        m = DenseBlock(4, cfg)
        p = m.init(jax.random.PRNGKey(0), x)
        widths = [
            p["params"][f"layer{i}"]["conv3"]["kernel"].shape[-1]
            for i in range(3)
        ]
        assert widths == [8, 8, 8], widths  # ceil([4,3,3] / 8) * 8
        assert m.apply(p, x).shape == (1, 4, 4, 4)
        assert DenseBlockCfg.from_ref({}).growth_multiple == 0


class TestGrowthPadding:
    """pad_growth_params: a parity-family checkpoint zero-padded into the
    growth_multiple (lane-padded) architecture computes the same function
    (up to conv-reduction reassociation) and codes bit-exactly -- the
    function-preserving MFU attack of VERDICT r4 item 3."""

    def _small(self, fuse=True):
        from finalproject_losslessimagecompression_tpu.models.config import (
            CouplingCfg,
            DenseBlockCfg,
            FlowCfg,
        )

        nn = DenseBlockCfg(growth_channel=10, depth=3, act="ReLU",
                           fuse_1x1=fuse)
        return FlowCfg(H=16, W=16, C=3, nflows=2, nsplit=2,
                       couple=CouplingCfg(0.75, nn), prior_nn=nn)

    @pytest.mark.parametrize("fuse", [True, False])
    def test_padded_function_matches(self, rng, fuse):
        from finalproject_losslessimagecompression_tpu.models.config import (
            with_growth_multiple,
        )
        from finalproject_losslessimagecompression_tpu.models.idflow import (
            IDFlow,
        )
        from finalproject_losslessimagecompression_tpu.models.layers import (
            pad_growth_params,
        )
        from finalproject_losslessimagecompression_tpu.ops.rounding import (
            round_to_grid,
        )

        cfg = self._small(fuse)
        model = IDFlow(cfg)
        x = round_to_grid(
            jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32), 8
        )
        params = model.init(jax.random.PRNGKey(0), x)
        # non-trivial weights (zero-init proj would hide mapping bugs)
        params = jax.tree_util.tree_map(
            lambda l: l + 0.05 * jnp.cos(
                jnp.arange(l.size, dtype=jnp.float32).reshape(l.shape)
            ),
            params,
        )
        m = 8  # pads per-layer growths 4,3,3 -> 8,8,8
        padded_cfg = with_growth_multiple(cfg, m)
        padded = IDFlow(padded_cfg)
        pparams = pad_growth_params(params, m)
        # shapes must match the padded architecture exactly
        ref_shapes = jax.tree_util.tree_map(
            lambda l: l.shape,
            padded.init(jax.random.PRNGKey(1), x),
        )
        got_shapes = jax.tree_util.tree_map(lambda l: l.shape, pparams)
        assert (jax.tree_util.tree_structure(ref_shapes)
                == jax.tree_util.tree_structure(got_shapes))
        assert (jax.tree_util.tree_leaves(ref_shapes)
                == jax.tree_util.tree_leaves(got_shapes))
        la, ma, sa = model.apply(params, x)
        lb, mb, sb = padded.apply(pparams, x)
        for a, b in zip(la + ma + sa, lb + mb + sb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            )
        # latents are grid values; reassociation noise must not move them
        for a, b in zip(la, lb):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_padded_codec_roundtrip(self, rng):
        from finalproject_losslessimagecompression_tpu.models.config import (
            with_growth_multiple,
        )
        from finalproject_losslessimagecompression_tpu.models.exact import (
            FlowCodec,
        )
        from finalproject_losslessimagecompression_tpu.models.idflow import (
            IDFlow,
        )
        from finalproject_losslessimagecompression_tpu.models.layers import (
            pad_growth_params,
        )
        from finalproject_losslessimagecompression_tpu.ops.rounding import (
            round_to_grid,
        )

        cfg = self._small()
        model = IDFlow(cfg)
        x = round_to_grid(
            jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32), 8
        )
        params = model.init(jax.random.PRNGKey(0), x)
        padded = IDFlow(with_growth_multiple(cfg, 8))
        pparams = pad_growth_params(params, 8)
        codec = FlowCodec(padded, num_streams=32)
        blobs, info = codec.compress(pparams, x)
        rec = codec.decompress(pparams, blobs, info, fetch=True)
        assert np.array_equal(np.asarray(rec), np.asarray(x))


class TestCheckpointLayoutAdaptation:
    """Checkpoints written by either DenseLayer compute variant load into
    either model: the two layouts store the same four leaves (the fused
    variant composes weights at apply time), so adaptation is an exact
    rename (train/checkpoint.py:adapt_state_dict)."""

    def _small_models(self):
        from finalproject_losslessimagecompression_tpu.models import IDFlow
        from finalproject_losslessimagecompression_tpu.models.config import (
            CouplingCfg,
            DenseBlockCfg,
            FlowCfg,
        )

        def cfg(fuse):
            nn = DenseBlockCfg(16, 2, "ReLU", fuse_1x1=fuse)
            return FlowCfg(
                H=8, W=8, C=3, nflows=2, nsplit=2,
                couple=CouplingCfg(0.75, nn), prior_nn=nn,
            )

        return IDFlow(cfg(True)), IDFlow(cfg(False))

    def test_cross_layout_roundtrip(self, tmp_path, rng):
        import jax

        from finalproject_losslessimagecompression_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        fused, unfused = self._small_models()
        x = jnp.asarray(
            np.round(rng.uniform(0, 1, (1, 8, 8, 3)) * 256, 0).astype(
                np.float32
            ) / 256.0
        )
        pf = fused.init(jax.random.PRNGKey(7), x)
        path = str(tmp_path / "fused.ckpt")
        save_checkpoint(path, {"params": pf, "step": 3})

        pu_tpl = unfused.init(jax.random.PRNGKey(0), x)
        st = load_checkpoint(path, {"params": pu_tpl, "step": 0})
        pu = st["params"]
        assert int(st["step"]) == 3
        # same function up to float rounding of the composed vs two-conv
        # form (the values are identical; only the compute path differs)
        yf = fused.apply(pf, x)
        yu = unfused.apply(pu, x)
        for a, b in zip(yf[0], yu[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
        # leaves are bit-identical after the rename
        leaves_f = sorted(
            np.asarray(l).tobytes()
            for l in jax.tree_util.tree_leaves(pf)
        )
        leaves_u = sorted(
            np.asarray(l).tobytes()
            for l in jax.tree_util.tree_leaves(pu)
        )
        assert leaves_f == leaves_u

        # and the reverse direction (unfused checkpoint -> fused model)
        path2 = str(tmp_path / "unfused.ckpt")
        save_checkpoint(path2, {"params": pu, "step": 4})
        pf_tpl = fused.init(jax.random.PRNGKey(1), x)
        st2 = load_checkpoint(path2, {"params": pf_tpl, "step": 0})
        leaves_f2 = sorted(
            np.asarray(l).tobytes()
            for l in jax.tree_util.tree_leaves(st2["params"])
        )
        assert leaves_f2 == leaves_f
