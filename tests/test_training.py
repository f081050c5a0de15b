"""Training runtime: schedule semantics, loader contracts, a real training
smoke run on synthetic data (bpd must drop), and checkpoint resume."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def tiny_train_config(tmp_path, max_step=6, test_coding=False):
    data = dict(
        name="CustomDataLoader",
        dataset=dict(
            name="SyntheticImages", size=[8, 8, 3], length=8, seed=1
        ),
        batch_size=4,
        nbits=8,
    )
    model = dict(
        name="IDFlows",
        nflows=2,
        nbits=8,
        nsplit=2,
        H=8,
        W=8,
        C=3,
        couple=dict(
            name="AdditiveCouple",
            split=0.75,
            nn=dict(
                name="DenseBlock",
                growth_channel=8,
                depth=2,
                layer=dict(name="DenseLayer", act="LeakyReLU"),
            ),
            round=dict(name="Round", nbits=8),
        ),
        extenddim=dict(name="ExtendDim", scale=2),
        prior=dict(
            name="Prior",
            round=dict(name="Round", nbits=8),
            nn=dict(
                name="DenseBlock",
                growth_channel=8,
                depth=2,
                layer=dict(name="DenseLayer", act="LeakyReLU"),
            ),
        ),
        distribution=dict(name="DLogistic"),
        round=dict(name="Round", nbits=8),
    )
    return dict(
        train=dict(
            model=model,
            test_coding=test_coding,
            train_dataloader={**data, "train": True},
            test_dataloader={**data, "train": False, "shuffle": False},
            optimizer=dict(name="Adamax", lr=0.01),
            scheduler=dict(name="WarmUpScheduler", warmup=2, beta=0.99),
            max_step=max_step,
            step_per_epoch=2,
            evaluate_interval=1000000,
            save_interval=1000000,
            save_path=str(tmp_path / "model.ckpt"),
            writer_path=str(tmp_path / "logs"),
        )
    )


class TestSchedule:
    def test_warmup_exp(self):
        from finalproject_losslessimagecompression_tpu.train.optim import (
            warmup_exp_schedule,
        )

        s = warmup_exp_schedule(1.0, warmup=10, beta=0.99, step_per_epoch=5)
        # epoch 0 -> min(1, 1/10) * 0.99^(1-10)
        expected = 0.1 * 0.99 ** (1 - 10)
        assert abs(float(s(0)) - expected) < 1e-6
        # epoch 20 -> 0.99^(21-10)
        expected = 0.99 ** (21 - 10)
        assert abs(float(s(100)) - expected) < 1e-6


class TestLoader:
    def test_synthetic_loader_grid_and_pad(self):
        from finalproject_losslessimagecompression_tpu.data import (
            DataLoader,
            SyntheticImages,
        )

        ds = SyntheticImages(size=(6, 6, 3), length=5, seed=0)
        dl = DataLoader(ds, batch_size=2, pad=(2, 1), train=False,
                        shuffle=False)
        batches = list(iter(dl))
        assert batches[0].shape == (2, 8, 7, 3)
        arr = batches[0] * 256
        assert np.allclose(arr, np.round(arr))
        # replication padding repeats the last row/col
        assert np.array_equal(batches[0][:, 5, :, :], batches[0][:, 6, :, :])
        assert sum(b.shape[0] for b in batches) == 5

    def test_natural_synthetic_family(self):
        """NaturalSynthetic: deterministic per (seed, idx), [0,1] float32,
        disjoint across seeds, and carrying compressible 1/f structure
        (std well below uniform noise's 0.289)."""
        from finalproject_losslessimagecompression_tpu.data.datasets import (
            NaturalSynthetic,
        )
        from finalproject_losslessimagecompression_tpu.registry import (
            DATASETS,
        )

        assert DATASETS.get("NaturalSynthetic") is NaturalSynthetic
        ds = NaturalSynthetic(size=(32, 32, 3), length=8, seed=1)
        a, b = ds[3], ds[3]
        assert np.array_equal(a, b)
        assert a.shape == (32, 32, 3) and a.dtype == np.float32
        assert 0.0 <= a.min() and a.max() <= 1.0
        other = NaturalSynthetic(size=(32, 32, 3), length=8, seed=0)
        assert not np.array_equal(ds[0], other[0])
        # spatial structure: neighboring pixels correlate strongly in a
        # 1/f field (uniform noise would be ~0)
        img = ds[0][:, :, 0]
        d = img[:, 1:] - img[:, :-1]
        assert float(np.var(d)) < 0.5 * float(np.var(img))

    def test_train_loader_cycles(self):
        from finalproject_losslessimagecompression_tpu.data import (
            DataLoader,
            SyntheticImages,
        )

        ds = SyntheticImages(size=(4, 4, 3), length=3, seed=0)
        dl = DataLoader(ds, batch_size=2, train=True)
        for _ in range(5):
            b = next(dl)
            assert b.shape[0] in (1, 2)


class TestTrainer:
    def test_smoke_train_and_bpd_drops(self, tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=30)
        t = build_trainer(cfg)
        batch = jnp.asarray(next(t.trainloader))
        loss0, _ = t.eval_step(t.params, batch)
        t.train()
        loss1, _ = t.eval_step(t.params, batch)
        assert float(loss1) < float(loss0)
        assert os.path.exists(cfg["train"]["save_path"])

    def test_checkpoint_resume(self, tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=4)
        t = build_trainer(cfg)
        t.train()
        leaves0 = jax.tree_util.tree_leaves(t.params)

        cfg2 = tiny_train_config(tmp_path, max_step=4)
        cfg2["train"]["model"]["load_path"] = cfg["train"]["save_path"]
        t2 = build_trainer(cfg2)
        assert t2.step == 4
        leaves1 = jax.tree_util.tree_leaves(t2.params)
        for a, b in zip(leaves0, leaves1):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_eval_with_coding(self, tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=2, test_coding=True)
        t = build_trainer(cfg)
        ev = t.evaluate()
        assert ev["coding_errors"] == 0
        assert np.isfinite(ev["real_bpd"])
        assert ev["real_bpd"] >= ev["test_bpd"]  # includes overhead

    def test_steps_per_dispatch_scan(self, tmp_path):
        """steps_per_dispatch > 1 trains K steps per host dispatch via the
        lax.scan'd program; every step's loss still reaches the metrics
        log and training still converges."""
        import json

        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=8)
        cfg["train"]["steps_per_dispatch"] = 2
        t = build_trainer(cfg)
        batch = jnp.asarray(next(t.trainloader))
        loss0, _ = t.eval_step(t.params, batch)
        t.train()
        loss1, _ = t.eval_step(t.params, batch)
        assert t.step == 8
        assert float(loss1) < float(loss0)
        steps = []
        with open(os.path.join(str(tmp_path / "logs"),
                               "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "train bpd":
                    steps.append(rec["step"])
        assert steps == list(range(1, 9)), steps  # every step logged

    def test_steps_per_dispatch_misaligned_interval_rejected(self,
                                                             tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=8)
        cfg["train"]["steps_per_dispatch"] = 3  # step_per_epoch=2 not /3
        with pytest.raises(ValueError, match="steps_per_dispatch"):
            build_trainer(cfg)

    def test_sample_images(self, tmp_path):
        from finalproject_losslessimagecompression_tpu.cli.train import (
            build_trainer,
        )

        cfg = tiny_train_config(tmp_path, max_step=2)
        t = build_trainer(cfg)
        out = t.sample_images(batch=4, temperatures=(0.5,))
        assert out[0.5].shape == (4, 8, 8, 3)


class TestShardedLoader:
    def test_shards_partition_epoch(self):
        """Multi-host data sharding: shard views of the same loader config
        partition every epoch disjointly, deterministically, and
        exhaustively (each host passes shard_index=process_index)."""
        import finalproject_losslessimagecompression_tpu.data.loader  # noqa
        from finalproject_losslessimagecompression_tpu.registry import (
            DATALOADERS,
            build,
        )

        def mk(si=None, sc=None):
            return build(DATALOADERS, dict(
                name="CustomDataLoader",
                dataset=dict(name="SyntheticImages", size=[8, 8, 3],
                             length=23, seed=5),
                batch_size=4, shuffle=True, train=False,
                shard_index=si, shard_count=sc,
            ))

        full = np.concatenate([b for b in iter(mk())])
        s0a = np.concatenate([b for b in iter(mk(0, 2))])
        s0b = np.concatenate([b for b in iter(mk(0, 2))])
        s1 = np.concatenate([b for b in iter(mk(1, 2))])
        # deterministic: the same shard view twice is identical
        assert np.array_equal(s0a, s0b)
        # disjoint + exhaustive: the two shards are a permutation of the
        # full epoch with no overlap (odd length: sizes differ by one)
        assert len(s0a) + len(s1) == len(full) == 23
        assert abs(len(s0a) - len(s1)) == 1
        both = np.concatenate([s0a, s1]).reshape(23, -1)
        fullr = full.reshape(23, -1)
        order = np.lexsort(both.T)
        order_f = np.lexsort(fullr.T)
        assert np.array_equal(both[order], fullr[order_f])

    def test_shard_true_single_process(self):
        """`shard: true` resolves process coordinates from the jax runtime
        (a single-process run sees the whole dataset)."""
        import finalproject_losslessimagecompression_tpu.data.loader  # noqa
        from finalproject_losslessimagecompression_tpu.registry import (
            DATALOADERS,
            build,
        )

        loader = build(DATALOADERS, dict(
            name="CustomDataLoader",
            dataset=dict(name="SyntheticImages", size=[8, 8, 3], length=8,
                         seed=5),
            batch_size=4, shuffle=False, shard=True,
        ))
        assert sum(len(b) for b in iter(loader)) == 8
