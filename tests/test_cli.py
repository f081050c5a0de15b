"""CLI entry points driven end-to-end: train via YAML config, sharded
trainer, visualization, classical baselines."""

import os

import numpy as np
import pytest
import yaml


class TestTrainCLI:
    def test_smoke_config_runs(self, tmp_path, monkeypatch):
        """The shipped hermetic config must train, eval with coding, and
        checkpoint through the real CLI main()."""
        from finalproject_losslessimagecompression_tpu.cli.train import (
            load_config,
            build_trainer,
        )

        cfg = load_config("configs/smoke_synthetic.yaml")
        t = cfg["train"]
        t["max_step"] = 4
        t["step_per_epoch"] = 2
        t["evaluate_interval"] = 4
        t["save_path"] = str(tmp_path / "smoke.ckpt")
        t["writer_path"] = str(tmp_path / "logs")
        t["max_eval_batches"] = 1
        trainer = build_trainer(cfg)
        trainer.train()
        assert os.path.exists(t["save_path"])
        ev = trainer.evaluate()
        assert ev["coding_errors"] == 0

    def test_set_overrides(self):
        """--set dotted.path=value overrides parse as YAML scalars, create
        intermediate mappings, and reject paths through non-mappings."""
        import pytest as _pytest

        from finalproject_losslessimagecompression_tpu.cli.train import (
            apply_overrides,
        )

        cfg = {"train": {"max_step": 30000, "optimizer": {"lr": 0.001}}}
        apply_overrides(cfg, [
            "train.max_step=5000",
            "train.optimizer.lr=1e-4",
            "train.save_path=./logs/x.ckpt",
            "train.new.nested=true",
        ])
        t = cfg["train"]
        assert t["max_step"] == 5000 and isinstance(t["max_step"], int)
        assert t["optimizer"]["lr"] == 1e-4
        assert t["save_path"] == "./logs/x.ckpt"
        assert t["new"]["nested"] is True
        with _pytest.raises(SystemExit):
            apply_overrides(cfg, ["train.max_step.sub=1"])
        with _pytest.raises(SystemExit):
            apply_overrides(cfg, ["no_equals_sign"])

    def test_generated_configs_parse(self):
        """Every generated config must at least build its model config."""
        import glob

        from finalproject_losslessimagecompression_tpu.models.config import (
            FlowCfg,
        )

        for path in glob.glob("configs/*.yaml"):
            with open(path) as f:
                cfg = yaml.safe_load(f)
            assert "train" in cfg, path
            tc = cfg["train"]
            model = tc.get("model") or tc.get("flows")
            assert model is not None, path
            name = model.get("name", "")
            if name in ("IDFlows", "ConditionalFlows"):
                FlowCfg.from_ref(dict(model))


class TestShardedTrainer:
    def test_use_mesh(self, tmp_path):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import sys

        sys.path.insert(0, "tests")
        from test_training import tiny_train_config

        cfg = tiny_train_config(tmp_path, max_step=4)
        cfg["train"]["use_mesh"] = True
        cfg["train"]["train_dataloader"]["batch_size"] = 8
        cfg["train"]["test_dataloader"]["batch_size"] = 8
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        t = build_trainer(cfg)
        assert t.mesh is not None
        t.train()

    def test_use_mesh_steps_per_dispatch(self, tmp_path):
        """K steps per dispatch under a mesh: the scanned program shards
        the super-batch's batch axis (dim 1) over the whole mesh with
        replicated params; every step's loss still reaches the log."""
        import json

        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import sys

        sys.path.insert(0, "tests")
        from test_training import tiny_train_config

        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=4)
        cfg["train"]["use_mesh"] = True
        cfg["train"]["steps_per_dispatch"] = 2
        cfg["train"]["log_every"] = 2
        cfg["train"]["train_dataloader"]["batch_size"] = 8
        cfg["train"]["test_dataloader"]["batch_size"] = 8
        t = build_trainer(cfg)
        assert t.mesh is not None and t.multi_step is not None
        t.train()
        assert t.step == 4
        steps = []
        with open(os.path.join(str(tmp_path / "logs"),
                               "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "train bpd":
                    steps.append(rec["step"])
        assert steps == [1, 2, 3, 4], steps


class TestVisualize:
    def test_sample_and_interpolate(self, tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.visualize import (
            interpolate,
            load_model,
            sample,
        )
        from finalproject_losslessimagecompression_tpu.train.metrics import (
            MetricsWriter,
        )

        model_cfg = dict(
            name="IDFlows", nflows=1, nsplit=1, H=8, W=8, C=3,
            couple=dict(name="AdditiveCouple", split=0.75,
                        nn=dict(name="DenseBlock", growth_channel=8,
                                depth=1,
                                layer=dict(name="DenseLayer", act="ReLU")),
                        round=dict(name="Round", nbits=8)),
            extenddim=dict(name="ExtendDim", scale=2),
            prior=dict(name="Prior", round=dict(name="Round", nbits=8),
                       nn=dict(name="DenseBlock", growth_channel=8, depth=1,
                               layer=dict(name="DenseLayer", act="ReLU"))),
            distribution=dict(name="DLogistic"),
            round=dict(name="Round", nbits=8),
        )
        cfg, model, params = load_model(model_cfg)
        writer = MetricsWriter(str(tmp_path), use_tensorboard=False)
        sample(cfg, model, params, writer, batch=4, temperatures=(0.5,))
        corners = np.random.default_rng(0).uniform(
            0, 1, (4, 8, 8, 3)
        ).astype(np.float32)
        interpolate(cfg, model, params, writer, corners, grid=2)
        imgs = os.listdir(os.path.join(str(tmp_path), "images"))
        assert any("sample" in f for f in imgs)
        assert any("interpolate" in f for f in imgs)


class TestBaselines:
    def test_synthetic_run(self):
        from finalproject_losslessimagecompression_tpu.cli.baselines import run
        from finalproject_losslessimagecompression_tpu.registry import (
            DATALOADERS,
            build,
        )

        loader = build(
            DATALOADERS,
            dict(
                name="CustomDataLoader",
                dataset=dict(name="SyntheticImages", size=[16, 16, 3],
                             length=4, seed=0),
                batch_size=2,
                shuffle=False,
            ),
        )
        res = run(loader, max_batches=1)
        for name in ("gzip", "bz2", "lzma", "png", "webp", "gzip_png"):
            assert name in res
            assert 0 < res[name]["bpd"] <= 64


class TestFileCodecCLI:
    def test_compress_decompress_file_round_trip(self, tmp_path):
        """cli/codec: image file -> .lic -> exact original pixels, and a
        mismatched checkpoint fingerprint is rejected loudly."""
        from PIL import Image

        from finalproject_losslessimagecompression_tpu.cli.codec import main
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
            load_config,
        )

        cfg = load_config("configs/smoke_synthetic.yaml")
        t = cfg["train"]
        t["max_step"] = 2
        t["step_per_epoch"] = 2
        t["evaluate_interval"] = 100
        t["save_path"] = str(tmp_path / "m.ckpt")
        t["writer_path"] = str(tmp_path / "logs")
        trainer = build_trainer(cfg)
        trainer.train()

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (12, 14, 3)).astype(np.uint8)
        src = str(tmp_path / "t.png")
        Image.fromarray(img).save(src)
        args = ["--config", "configs/smoke_synthetic.yaml",
                "--ckpt", t["save_path"], "--outdir", str(tmp_path),
                "--num-streams", "32", "--no-stored-fallback"]
        main(["compress", "--input", src] + args)
        lic = str(tmp_path / "t.lic")
        assert os.path.getsize(lic) > 0
        main(["decompress", "--input", lic] + args)
        out = np.asarray(Image.open(tmp_path / "t.png"))
        assert np.array_equal(out, img)

        # single-round-trip contract of the decode path: the plain
        # pipeline returns HOST numpy arrays (the decoded data rides the
        # SAME device_get as the state-invariant check), so
        # decompress_files pays no per-chunk fetch on top
        from finalproject_losslessimagecompression_tpu.cli import (
            codec as CC,
        )

        pipe = CC._load_model(
            "configs/smoke_synthetic.yaml", t["save_path"], 32
        )
        _, chunks, _ = CC._read_lic(pipe, lic)
        recs = pipe.decompress_many(chunks)
        assert all(isinstance(r, np.ndarray) for r in recs)

        # image larger than the model dims: tiled into a model-size batch
        # (reference Patching semantics), still bit-exact
        big = rng.integers(0, 256, (20, 35, 3)).astype(np.uint8)
        bsrc = str(tmp_path / "big.png")
        Image.fromarray(big).save(bsrc)
        main(["compress", "--input", bsrc] + args)
        main(["decompress", "--input", str(tmp_path / "big.lic")] + args)
        bout = np.asarray(Image.open(tmp_path / "big.png"))
        assert np.array_equal(bout, big)

        # different weights -> different fingerprint -> loud rejection
        trainer.save(str(tmp_path / "m2.ckpt"))
        import jax

        trainer.params = jax.tree_util.tree_map(
            lambda a: a + 1.0, trainer.params)
        trainer.save(str(tmp_path / "m2.ckpt"))
        bad = ["--config", "configs/smoke_synthetic.yaml",
               "--ckpt", str(tmp_path / "m2.ckpt"),
               "--outdir", str(tmp_path), "--num-streams", "32"]
        with pytest.raises(SystemExit):
            main(["decompress", "--input", lic] + bad)

    def test_chunk_sizes(self):
        """Power-of-two decomposition: program reuse across file sizes
        (VERDICT r3 item 5)."""
        from finalproject_losslessimagecompression_tpu.cli.codec import (
            _chunk_sizes,
        )

        assert _chunk_sizes(1) == [1]
        assert _chunk_sizes(6) == [4, 2]
        assert _chunk_sizes(21) == [16, 4, 1]
        assert _chunk_sizes(100, cap=64) == [64, 32, 4]
        assert sum(_chunk_sizes(777)) == 777
        # a whole corpus of distinct sizes shares a small program set
        progs = {b for n in (1, 2, 3, 5, 6, 12, 20, 100)
                 for b in _chunk_sizes(n)}
        assert progs <= {1, 2, 4, 8, 16, 32, 64}

    def test_dtype_override(self, tmp_path):
        """--dtype bfloat16: the serving-variant override round-trips
        bit-exactly under itself, and its containers are fingerprint-
        rejected by the float32 pipeline (variant isolation)."""
        from PIL import Image

        from finalproject_losslessimagecompression_tpu.cli.codec import main
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
            load_config,
        )

        cfg = load_config("configs/smoke_synthetic.yaml")
        t = cfg["train"]
        t["max_step"] = 2
        t["step_per_epoch"] = 2
        t["evaluate_interval"] = 100
        t["save_path"] = str(tmp_path / "m.ckpt")
        t["writer_path"] = str(tmp_path / "logs")
        build_trainer(cfg).train()

        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        src = str(tmp_path / "d.png")
        Image.fromarray(img).save(src)
        args = ["--config", "configs/smoke_synthetic.yaml",
                "--ckpt", t["save_path"], "--outdir", str(tmp_path),
                "--num-streams", "32", "--no-stored-fallback"]
        main(["compress", "--input", src, "--dtype", "bfloat16"] + args)
        lic = str(tmp_path / "d.lic")
        main(["decompress", "--input", lic, "--dtype", "bfloat16"] + args)
        out = np.asarray(Image.open(tmp_path / "d.png"))
        assert np.array_equal(out, img)
        with pytest.raises(SystemExit, match="different model"):
            main(["decompress", "--input", lic] + args)

    def test_serve_session(self, tmp_path):
        """Session mode: one loaded pipeline serves many commands; each
        command pays only marginal cost (no model reload), emits `ok
        <seconds>`, round-trips bit-exactly, and the timing report splits
        startup from per-command phases."""
        import io
        import json

        from PIL import Image

        from finalproject_losslessimagecompression_tpu.cli import codec as C
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
            load_config,
        )

        cfg = load_config("configs/smoke_synthetic.yaml")
        t = cfg["train"]
        t["max_step"] = 2
        t["step_per_epoch"] = 2
        t["evaluate_interval"] = 100
        t["save_path"] = str(tmp_path / "m.ckpt")
        t["writer_path"] = str(tmp_path / "logs")
        build_trainer(cfg).train()

        rng = np.random.default_rng(9)
        srcs = []
        for i, shape in enumerate([(12, 14, 3), (20, 35, 3)]):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            p = str(tmp_path / f"s{i}.png")
            Image.fromarray(img).save(p)
            srcs.append((p, img))

        C.TIMER.totals.clear()
        C.TIMER.counts.clear()
        pipe = C._load_model(
            "configs/smoke_synthetic.yaml", t["save_path"], 32
        )
        outdir = str(tmp_path / "serve_out")
        lines = [
            f"compress {outdir} {srcs[0][0]} {srcs[1][0]}",
            f"compress {outdir} {srcs[0][0]} {srcs[1][0]}",  # warm repeat
            "decompress %s %s %s" % (
                outdir,
                os.path.join(outdir, "s0.lic"),
                os.path.join(outdir, "s1.lic"),
            ),
            "timing",
            "bogus command",
            "quit",
        ]
        out = io.StringIO()
        C.serve(pipe, lines=lines, out=out, stored_fallback=False)
        emitted = out.getvalue().splitlines()
        oks = [ln for ln in emitted if ln.startswith("ok ")]
        assert len(oks) == 3  # 2 compress + 1 decompress
        assert all(float(ln.split()[1]) >= 0 for ln in oks)
        assert any(ln.startswith("err ") for ln in emitted)
        timing = json.loads(
            [ln for ln in emitted if ln.startswith("{")][0]
        )["phases"]
        assert timing["startup:load_model"]["count"] == 1  # loaded ONCE
        assert timing["compress:dispatch_pack"]["count"] == 2
        assert timing["decompress:dispatch_verify"]["count"] == 1
        for p, img in srcs:
            rec = np.asarray(Image.open(
                os.path.join(outdir, os.path.basename(p))
            ))
            assert np.array_equal(rec, img)

    def test_stored_fallback_mode(self, tmp_path):
        """Images the flow codes badly (random noise paying ceil-to-tile
        padding) fall back to the stored escape: the .lic is never more
        than the header larger than PNG, the round trip stays exact, and
        a MIXED stored+flow batch decompresses correctly.  Stored
        containers are model-independent (no fingerprint check)."""
        import json
        import struct

        from PIL import Image

        from finalproject_losslessimagecompression_tpu.cli.codec import (
            _MAGIC,
            main,
        )
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
            load_config,
        )

        cfg = load_config("configs/smoke_synthetic.yaml")
        t = cfg["train"]
        t["max_step"] = 2
        t["step_per_epoch"] = 2
        t["evaluate_interval"] = 100
        t["save_path"] = str(tmp_path / "m.ckpt")
        t["writer_path"] = str(tmp_path / "logs")
        build_trainer(cfg).train()

        rng = np.random.default_rng(11)
        # sub-tile noise: padding + model coding cannot beat PNG
        noise = rng.integers(0, 256, (5, 6, 3)).astype(np.uint8)
        nsrc = str(tmp_path / "noise.png")
        Image.fromarray(noise).save(nsrc)
        # constant image: the trained-2-steps flow still codes SOMETHING,
        # but mode choice is per-file; we only assert exactness for it
        flat = np.full((8, 8, 3), 37, np.uint8)
        fsrc = str(tmp_path / "flat.png")
        Image.fromarray(flat).save(fsrc)
        args = ["--config", "configs/smoke_synthetic.yaml",
                "--ckpt", t["save_path"], "--outdir", str(tmp_path),
                "--num-streams", "32"]
        main(["compress", "--input", nsrc, fsrc] + args)

        nlic = str(tmp_path / "noise.lic")
        with open(nlic, "rb") as f:
            data = f.read()
        assert data[:4] == _MAGIC
        (hlen,) = struct.unpack("<I", data[4:8])
        header = json.loads(data[8:8 + hlen])
        assert header["mode"] == "stored-png"
        # worst-case bound, exact by construction: the escape stores the
        # smaller of {PIL optimize=True re-encode, the original .png file
        # bytes} (cli/codec.py:_stored_blob), so the .lic is bounded by
        # header + each candidate
        import io

        b = io.BytesIO()
        Image.fromarray(noise).save(b, format="PNG", optimize=True)
        assert os.path.getsize(nlic) <= 8 + hlen + b.tell()
        assert os.path.getsize(nlic) <= 8 + hlen + os.path.getsize(nsrc)

        main(["decompress", "--input", nlic,
              str(tmp_path / "flat.lic")] + args)
        assert np.array_equal(
            np.asarray(Image.open(tmp_path / "noise.png")), noise)
        assert np.array_equal(
            np.asarray(Image.open(tmp_path / "flat.png")), flat)

        # model-independent: a DIFFERENT checkpoint decodes stored mode
        tr = build_trainer(cfg)
        import jax

        tr.params = jax.tree_util.tree_map(lambda a: a + 1.0, tr.params)
        tr.save(str(tmp_path / "other.ckpt"))
        main(["decompress", "--input", nlic, "--config",
              "configs/smoke_synthetic.yaml",
              "--ckpt", str(tmp_path / "other.ckpt"),
              "--outdir", str(tmp_path), "--num-streams", "32"])
        assert np.array_equal(
            np.asarray(Image.open(tmp_path / "noise.png")), noise)


class TestFileCodecResidualCLI:
    def test_residual_config_round_trip(self, tmp_path):
        """cli/codec on a ResidualTrainer config: the .lic carries the VQ
        index stream + conditional residual containers and decodes with no
        side information; plain/residual containers are not confusable."""
        import sys

        from PIL import Image

        sys.path.insert(0, "tests")
        from test_pipelines import small_flow_dict, small_vqvae_dict, \
            synth_loader_cfg

        from finalproject_losslessimagecompression_tpu.cli.codec import main
        from finalproject_losslessimagecompression_tpu.train import (
            ResidualTrainer,
            VQVAETrainer,
        )

        vq_ckpt = str(tmp_path / "vq.ckpt")
        data = synth_loader_cfg((16, 16, 3))
        VQVAETrainer(
            model=small_vqvae_dict(),
            train_dataloader={**data, "train": True},
            test_dataloader=data,
            optimizer=dict(name="Adam", lr=1e-3),
            scheduler=dict(name="Constant"),
            max_step=2, step_per_epoch=10,
            evaluate_interval=1000, save_interval=1000,
            save_path=vq_ckpt, writer_path=str(tmp_path / "vlogs"),
            train_args=dict(alpha=1.0),
        ).train()
        res_ckpt = str(tmp_path / "res.ckpt")
        ResidualTrainer(
            flows=small_flow_dict(8, 8, name="ConditionalFlows"),
            vqvae={**small_vqvae_dict(), "checkpoint": vq_ckpt},
            input_size=[16, 16],
            train_dataloader=synth_loader_cfg((16, 16, 3), train=True),
            test_dataloader=synth_loader_cfg((16, 16, 3)),
            patch_batch_size=0,
            optimizer=dict(name="Adamax", lr=1e-3),
            scheduler=dict(name="Constant"),
            max_step=2, step_per_epoch=10,
            evaluate_interval=1000, save_interval=1000,
            save_path=res_ckpt, writer_path=str(tmp_path / "rlogs"),
        ).train()

        cfg_path = str(tmp_path / "res.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(
                dict(train=dict(
                    trainer="ResidualTrainer",
                    flows=small_flow_dict(8, 8, name="ConditionalFlows"),
                    vqvae={**small_vqvae_dict(), "checkpoint": vq_ckpt},
                    input_size=[16, 16],
                )), f)

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (30, 18, 3)).astype(np.uint8)
        src = str(tmp_path / "r.png")
        Image.fromarray(img).save(src)
        # noise inputs would take the stored escape; force flow mode --
        # this test exercises the residual PIPELINE, not the mode choice
        args = ["--config", cfg_path, "--ckpt", res_ckpt,
                "--outdir", str(tmp_path), "--num-streams", "32",
                "--no-stored-fallback"]
        main(["compress", "--input", src] + args)
        main(["decompress", "--input", str(tmp_path / "r.lic")] + args)
        out = np.asarray(Image.open(tmp_path / "r.png"))
        assert np.array_equal(out, img)

        # a plain-pipeline .lic must be rejected by the residual config
        plain_cfg = "configs/smoke_synthetic.yaml"
        simg = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        Image.fromarray(simg).save(str(tmp_path / "s.png"))
        # (reuse the trained smoke ckpt if present, else train 2 steps)
        smoke_ckpt = "logs/smoke.ckpt"
        if not os.path.exists(smoke_ckpt):
            from finalproject_losslessimagecompression_tpu.cli.train import (
                build_trainer,
                load_config,
            )

            c = load_config(plain_cfg)
            c["train"].update(max_step=2, step_per_epoch=2,
                              evaluate_interval=100,
                              save_path=str(tmp_path / "smoke.ckpt"),
                              writer_path=str(tmp_path / "slogs"))
            build_trainer(c).train()
            smoke_ckpt = str(tmp_path / "smoke.ckpt")
        main(["compress", "--input", str(tmp_path / "s.png"),
              "--config", plain_cfg, "--ckpt", smoke_ckpt,
              "--outdir", str(tmp_path), "--num-streams", "32",
              "--no-stored-fallback"])
        with pytest.raises(SystemExit):
            main(["decompress", "--input", str(tmp_path / "s.lic")] + args)


class TestFileCodecTwoLevelCLI:
    def test_twolevel_config_round_trip(self, tmp_path):
        """cli/codec on a TwoLevelFlows config: rough + fine containers in
        one .lic, decoded bit-exact; info reconstruction (nested rough/fine
        batches) is derived from the config, not stored."""
        import sys

        from PIL import Image

        sys.path.insert(0, "tests")
        from test_pipelines import small_flow_dict, synth_loader_cfg

        from finalproject_losslessimagecompression_tpu.cli.codec import main
        from finalproject_losslessimagecompression_tpu.train import (
            TwoLevelTrainer,
        )

        model_cfg = dict(
            name="TwoLevelFlows", H=16, W=16, C=3, pad=[0, 0],
            rough_flows=small_flow_dict(8, 8, scale=2),
            fine_flows=small_flow_dict(8, 8, scale=2),
            batchsize=256,
        )
        ckpt = str(tmp_path / "tl.ckpt")
        TwoLevelTrainer(
            model=dict(model_cfg),
            train_dataloader=synth_loader_cfg((16, 16, 3), train=True),
            test_dataloader=synth_loader_cfg((16, 16, 3)),
            optimizer=dict(name="Adamax", lr=1e-3),
            scheduler=dict(name="Constant"),
            max_step=2, step_per_epoch=10,
            evaluate_interval=1000, save_interval=1000,
            save_path=ckpt, writer_path=str(tmp_path / "logs"),
            max_eval_batches=1,
        ).train()
        cfg_path = str(tmp_path / "tl.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(dict(train=dict(trainer="TwoLevelTrainer",
                                           model=model_cfg)), f)

        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (25, 16, 3)).astype(np.uint8)
        src = str(tmp_path / "t.png")
        Image.fromarray(img).save(src)
        args = ["--config", cfg_path, "--ckpt", ckpt,
                "--outdir", str(tmp_path), "--num-streams", "32",
                "--no-stored-fallback"]
        main(["compress", "--input", src] + args)
        main(["decompress", "--input", str(tmp_path / "t.lic")] + args)
        out = np.asarray(Image.open(tmp_path / "t.png"))
        assert np.array_equal(out, img)
