"""Per-image fine-tuning / bpd measurement (reference: trainer.py:735-801).

Loads a trained flow checkpoint (the reference's only trainer that actually
loads weights, trainer.py:756-757) and measures bpd over a data stream; with
`fine_tune=True`, a per-run additive "tuner" tensor (zeros-initialized,
image-shaped) is optimized by Adam to adapt the frozen model to the stream
(trainer.py:772-793).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import FlowCfg
from ..models.idflow import IDFlow, log_likelihood
from ..registry import DATALOADERS, TRAINERS, build
from .checkpoint import (
    load_checkpoint,
    load_raw,
    restore_into,
    save_checkpoint,
)
from .metrics import MetricsWriter
from .optim import build_optimizer

LOG2 = math.log(2.0)


@TRAINERS.register(name="Finetuner")
class Finetuner:
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
        fine_tune: bool = False,
        fine_tune_lr: float = None,
        seed: int = 0,
        resume: bool = False,
    ):
        model = dict(model)
        load_path = model.pop("load_path", None)
        self.cfg = FlowCfg.from_ref(model)
        self.model = IDFlow(self.cfg)
        self.trainloader = build(DATALOADERS, train_dataloader)
        self.testloader = build(DATALOADERS, test_dataloader)
        self.max_step = max_step
        self.evaluate_interval = evaluate_interval
        self.save_interval = save_interval
        self.save_path = save_path
        self.writer = MetricsWriter(writer_path)
        self.step = 0
        self.fine_tune = fine_tune

        init_x = jnp.zeros(
            (1, self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        # jitted init: eager flax init pays one tunnel RT per op
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), init_x
        )
        if load_path:
            # cross-variant (fuse_1x1) checkpoints adapt on load
            self.params = restore_into(
                self.params, load_raw(load_path)["params"]
            )

        self.tuner = jnp.zeros(
            (self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        # the tuner's optimizer honors the config's optimizer/scheduler;
        # fine_tune_lr overrides with the reference's plain Adam(lr)
        # semantics (reference: trainer.py:772-775)
        if fine_tune_lr is not None:
            self.tuner_opt = optax.adam(fine_tune_lr)
        else:
            self.tuner_opt = build_optimizer(
                optimizer, scheduler, step_per_epoch
            )
        self.tuner_state = self.tuner_opt.init(self.tuner)
        if resume:
            self.restore(self.save_path)

        cfg = self.cfg

        def loss_fn(tuner, params, batch):
            x = batch + tuner[None]
            l, m, s = self.model.apply(params, x)
            lp, _ = log_likelihood(cfg, l, m, s)
            return -jnp.mean(lp)

        @jax.jit
        def tune_step(tuner, tstate, params, batch):
            loss, g = jax.value_and_grad(loss_fn)(tuner, params, batch)
            updates, tstate = self.tuner_opt.update(g, tstate, tuner)
            tuner = optax.apply_updates(tuner, updates)
            return tuner, tstate, loss

        self.eval_loss = jax.jit(loss_fn)
        self.tune_step = tune_step

    # -- checkpointing: the tuner tensor IS the trained artifact of a
    # fine-tuning run, so it (plus its optimizer state) is saved/restored;
    # the reference never persisted it (trainer.py:784-793) --------------

    def _state(self):
        return {
            "tuner": self.tuner,
            "tuner_state": self.tuner_state,
            "step": self.step,
        }

    def save(self, path=None):
        save_checkpoint(path or self.save_path, self._state())

    def restore(self, path):
        st = load_checkpoint(path, self._state())
        self.tuner = st["tuner"]
        self.tuner_state = st["tuner_state"]
        self.step = int(st["step"])

    def train(self):
        bpds = []
        while self.step < self.max_step:
            self.step += 1
            batch = jnp.asarray(next(self.trainloader))
            if self.fine_tune:
                self.tuner, self.tuner_state, loss = self.tune_step(
                    self.tuner, self.tuner_state, self.params, batch
                )
            else:
                loss = self.eval_loss(self.tuner, self.params, batch)
            bpd = float(loss) / LOG2
            bpds.append(bpd)
            self.writer.add_scalar("bpd", bpd, self.step)
            if self.step % self.evaluate_interval == 0:
                self.writer.add_scalar(
                    "bpd mean", float(np.mean(bpds)), self.step
                )
                bpds = []
            if self.fine_tune and self.step % self.save_interval == 0:
                self.save()
        if self.fine_tune:
            self.save()
