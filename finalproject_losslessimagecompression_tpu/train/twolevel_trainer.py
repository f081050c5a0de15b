"""Two-level trainer (reference: trainer.py:361-457).

One fused jitted step computes rough + fine losses together (the reference's
backward-inside-forward memory hack, flows.py:220-235, is replaced by
rematerialization inside TwoLevelFlow).  Logs bpd / bpd1 (rough) / bpd2
(fine) and samples at four temperatures.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.idflow import log_likelihood
from ..models.twolevel import TwoLevelCfg, TwoLevelFlow, twolevel_bpd
from ..ops.dlogistic import dlogistic_sample
from ..registry import DATALOADERS, TRAINERS, build
from .checkpoint import load_checkpoint, save_checkpoint
from .metrics import MetricsWriter
from .optim import build_optimizer

LOG2 = math.log(2.0)


def make_twolevel_step(model: TwoLevelFlow, optimizer, mesh=None):
    """Fused rough+fine step; with `mesh`, the image batch shards over the
    whole mesh and params/opt state replicate (matching make_train_step;
    reference TwoLevelTrainer scope: trainer.py:361-457)."""
    cfg = model.cfg

    def loss_fn(params, batch):
        (rl, rm, rs), (fl, fm, fs) = model.apply(params, batch)
        lp_r, _ = log_likelihood(cfg.rough, rl, rm, rs)
        lp_f, _ = log_likelihood(cfg.fine, fl, fm, fs)
        loss_r = -jnp.mean(lp_r)
        loss_f = -jnp.mean(lp_f)
        return loss_r + loss_f, (loss_r, loss_f)

    def _step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(_step, donate_argnums=(0, 1)), jax.jit(loss_fn)

    from ..parallel.sharding import replicate, shard_batch

    repl = replicate(mesh)
    dsh = shard_batch(mesh)
    step = jax.jit(
        _step,
        in_shardings=(repl, repl, dsh),
        out_shardings=(repl, repl, repl, (repl, repl)),
        donate_argnums=(0, 1),
    )
    eval_step = jax.jit(
        loss_fn, in_shardings=(repl, dsh), out_shardings=(repl, (repl, repl))
    )
    return step, eval_step


@TRAINERS.register(name="TwoLevelTrainer")
class TwoLevelTrainer:
    def __init__(
        self,
        model: dict,
        train_dataloader: dict,
        test_dataloader: dict,
        optimizer: dict,
        scheduler: dict,
        max_step: int,
        step_per_epoch: int,
        evaluate_interval: int,
        save_interval: int,
        save_path: str,
        writer_path: str,
        seed: int = 0,
        max_eval_batches: int = 0,
        test_coding: bool = False,
        num_streams: int = 4096,
        use_mesh: bool = False,
        log_every: int = 1,
    ):
        model = dict(model)
        self.load_path = model.pop("load_path", None)
        self.cfg = TwoLevelCfg.from_ref(model)
        self.model = TwoLevelFlow(self.cfg)
        self.trainloader = build(DATALOADERS, train_dataloader)
        self.testloader = build(DATALOADERS, test_dataloader)
        self.optimizer = build_optimizer(optimizer, scheduler, step_per_epoch)
        self.max_step = max_step
        self.step_per_epoch = step_per_epoch
        self.evaluate_interval = evaluate_interval
        self.save_interval = save_interval
        self.save_path = save_path
        self.writer = MetricsWriter(writer_path)
        self.max_eval_batches = max_eval_batches
        self.log_every = max(1, log_every)
        self.step = 0

        init_x = jnp.zeros((1, self.cfg.H, self.cfg.W, self.cfg.C),
                           jnp.float32)
        # jitted init: eager flax init pays one tunnel RT per op
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), init_x
        )
        self.opt_state = self.optimizer.init(self.params)
        if self.load_path:
            self.restore(self.load_path)
        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh()
        self.train_step, self.eval_step = make_twolevel_step(
            self.model, self.optimizer, mesh=self.mesh
        )
        self.sample_key = jax.random.PRNGKey(seed + 1)
        self.test_coding = test_coding
        self.codec = None
        self.sharded_codec = None
        if test_coding:
            from ..models.twolevel_codec import TwoLevelCodec

            self.codec = TwoLevelCodec(self.model, num_streams=num_streams)
            if self.mesh is not None:
                # mesh serving: each device codes its image shard
                # chip-locally (parallel/full_codecs.py)
                from ..parallel.full_codecs import ShardedTwoLevelCodec

                self.sharded_codec = ShardedTwoLevelCodec(
                    self.codec, self.mesh
                )

    def _state(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "step": self.step}

    def save(self, path=None):
        save_checkpoint(path or self.save_path, self._state())

    def restore(self, path):
        st = load_checkpoint(path, self._state())
        self.params, self.opt_state = st["params"], st["opt_state"]
        self.step = int(st["step"])

    def _bpds(self, aux):
        bpd1 = float(aux[0]) / LOG2
        bpd2 = float(aux[1]) / LOG2
        return twolevel_bpd(self.cfg, bpd1, bpd2), bpd1, bpd2

    def evaluate(self):
        out = []
        real_bpds, errors = [], 0
        n = 0
        for batch in iter(self.testloader):
            batch = jnp.asarray(batch)
            _, aux = self.eval_step(self.params, batch)
            out.append(self._bpds(aux))
            if self.codec is not None:
                sharded = self.sharded_codec
                use_sharded = (
                    sharded is not None
                    and batch.shape[0] % sharded.D == 0
                )
                codec = sharded if use_sharded else self.codec
                try:
                    blobs, info = codec.compress(self.params, batch)
                    rec = codec.decompress(self.params, blobs, info)
                    errors += int(
                        np.sum(np.asarray(rec) != np.asarray(batch))
                    )
                    real_bpds.append(codec.real_bpd(blobs, info))
                except ValueError:
                    errors += int(np.asarray(batch).size)
            n += 1
            if self.max_eval_batches and n >= self.max_eval_batches:
                break
        bpds = tuple(
            float(np.mean([o[i] for o in out])) for i in range(3)
        )
        if self.codec is not None:
            self.writer.add_scalar(
                "real bpd",
                float(np.mean(real_bpds)) if real_bpds else float("nan"),
                self.step,
            )
            self.writer.add_scalar("coding errors", errors, self.step)
        return bpds

    def sample_images(self, batch=4, temperatures=(0.25, 0.5, 0.75, 1.0)):
        from ..models.config import latent_shapes as ls_fn

        r = ls_fn(self.cfg.rough)[0]
        f = ls_fn(self.cfg.fine)[0]
        tiles = (self.cfg.Hp // self.cfg.fine.H) * (
            self.cfg.Wp // self.cfg.fine.W
        )
        shapes = [r, (f[0], f[1], f[2] * tiles)]
        noises = []
        for s in shapes:
            self.sample_key, k = jax.random.split(self.sample_key)
            noises.append(
                dlogistic_sample(
                    k, jnp.zeros((batch,) + s), jnp.zeros((batch,) + s)
                )
            )
        # jitted sample path (eager apply = one tunnel RT per op)
        if not hasattr(self, "_sample_jit"):
            self._sample_jit = jax.jit(
                lambda p, ns: self.model.apply(
                    p, ns, method=TwoLevelFlow.sample_from_noise
                )
            )
        out = {}
        for t in temperatures:
            img = self._sample_jit(self.params, [n * t for n in noises])
            out[t] = np.asarray(img)
        return out

    def train(self):
        while self.step < self.max_step:
            self.step += 1
            batch = jnp.asarray(next(self.trainloader))
            self.params, self.opt_state, loss, aux = self.train_step(
                self.params, self.opt_state, batch
            )
            if self.step % self.log_every == 0:
                # _bpds fetches the losses (host sync); log_every > 1
                # keeps the device pipeline hot (Trainer's discipline)
                bpd, bpd1, bpd2 = self._bpds(aux)
                self.writer.add_scalar("train bpd", bpd, self.step)
                self.writer.add_scalar("train bpd 1", bpd1, self.step)
                self.writer.add_scalar("train bpd 2", bpd2, self.step)

            if self._at_interval(self.evaluate_interval):
                tb, tb1, tb2 = self.evaluate()
                self.writer.add_scalar("test bpd", tb, self.step)
                self.writer.add_scalar("test bpd 1", tb1, self.step)
                self.writer.add_scalar("test bpd 2", tb2, self.step)
                for t, img in self.sample_images().items():
                    self.writer.add_image_grid(f"t={t}", img, self.step)
            if self._at_interval(self.save_interval):
                self.save()
        self.save()

    def _at_interval(self, interval: int) -> bool:
        return (
            self.step % self.step_per_epoch == 0 and self.step < interval
        ) or self.step % interval == 0
