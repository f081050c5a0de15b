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
from .checkpoint import load_raw
from .metrics import MetricsWriter

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
        fine_tune_lr: float = 1e-3,
        seed: int = 0,
    ):
        model = dict(model)
        load_path = model.pop("load_path", None)
        self.cfg = FlowCfg.from_ref(model)
        self.model = IDFlow(self.cfg)
        self.trainloader = build(DATALOADERS, train_dataloader)
        self.testloader = build(DATALOADERS, test_dataloader)
        self.max_step = max_step
        self.evaluate_interval = evaluate_interval
        self.writer = MetricsWriter(writer_path)
        self.step = 0
        self.fine_tune = fine_tune

        init_x = jnp.zeros(
            (1, self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        self.params = self.model.init(jax.random.PRNGKey(seed), init_x)
        if load_path:
            self.params = load_raw(load_path)["params"]

        self.tuner = jnp.zeros(
            (self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        self.tuner_opt = optax.adam(fine_tune_lr)
        self.tuner_state = self.tuner_opt.init(self.tuner)

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
