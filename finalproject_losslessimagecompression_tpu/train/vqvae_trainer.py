"""VQ-VAE trainer (reference: trainer.py:461-546).

Loss = alpha * reconstruction NLL + VQ loss on inputs scaled to [-1, 1]
(trainer.py:505-509); logs recloss/vqloss/bpd and reconstruction grids.
Dead-code reinit runs as a pure params map between jitted steps
(see models/vqvae.py); reinit statistics are plain trainer state, so resume
restores them too.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vqvae import VQVAE, build_vqvae_from_ref, vq_reinit, vqvae_reinit_params
from ..registry import DATALOADERS, TRAINERS, build
from .checkpoint import load_checkpoint, save_checkpoint
from .metrics import MetricsWriter
from .optim import build_optimizer


def make_vqvae_step(model: VQVAE, optimizer, alpha: float, beta: float,
                    gamma: float, mesh=None):
    from ..registry import DISTRIBUTIONS

    dist = DISTRIBUTIONS.get(model.distribution)()

    has_bn = model.batch_norm

    def loss_fn(params, batch):
        if has_bn:
            # reference semantics: BatchNorm trains its running stats
            # during VQ-VAE training (model.train() at trainer.py:505-509
            # over nnblock.py:60-84) -- normalize with BATCH stats and
            # thread the updated running stats out of the step
            (out, vqloss, counts, flat), mut = model.apply(
                params, (batch - 0.5) / 0.5, beta, gamma, True,
                mutable=["batch_stats"],
            )
        else:
            out, vqloss, counts, flat = model.apply(
                params, (batch - 0.5) / 0.5, beta, gamma
            )
            mut = {}
        out = out * 0.5 + 0.5
        recloss = -jnp.mean(dist.log_prob(batch, out))
        return alpha * recloss + vqloss, (recloss, vqloss, counts, flat, mut)

    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        recloss, vqloss, counts, flat, mut = aux
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if has_bn:
            # running stats carry no gradient (train mode normalizes with
            # batch stats); they update by the BatchNorm momentum rule
            params = {**dict(params), "batch_stats": mut["batch_stats"]}
        return params, opt_state, loss, (recloss, vqloss, counts, flat)

    def eval_recon(params, batch):
        out = model.apply(params, (batch - 0.5) / 0.5,
                          method=VQVAE.reconstruct)
        out = out * 0.5 + 0.5
        recloss = -jnp.mean(dist.log_prob(batch, out))
        return recloss, out

    if mesh is not None:
        # SPMD data parallelism: batch sharded over the mesh, params and
        # optimizer state replicated; the usage counts / quantized vectors
        # in aux come back replicated so the host-side dead-code reinit is
        # identical on every host
        from ..parallel.sharding import replicate, shard_batch

        repl, dsh = replicate(mesh), shard_batch(mesh)
        step = jax.jit(step, in_shardings=(repl, repl, dsh),
                       out_shardings=(repl, repl, repl, repl))
        eval_recon = jax.jit(eval_recon, in_shardings=(repl, dsh))
    else:
        step = jax.jit(step)
        eval_recon = jax.jit(eval_recon)

    @jax.jit
    def reinit_step(params, counts, flat, interval, threshold):
        cb = params["params"]["vq"]["codebook"]
        new_cb, new_counts, did, nrep = vq_reinit(
            cb, counts, flat, interval, threshold
        )
        p = dict(params["params"])
        p["vq"] = {**dict(p["vq"]), "codebook": new_cb}
        params = {**dict(params), "params": p}
        return params, new_counts, did, nrep

    return step, eval_recon, reinit_step


@TRAINERS.register(name="VQVAETrainer")
class VQVAETrainer:
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
        train_args: Optional[dict] = None,
        seed: int = 0,
        max_eval_batches: int = 0,
        use_mesh: bool = False,
        log_every: int = 1,
    ):
        model = dict(model)
        self.load_path = model.pop("load_path", None)
        self.reinit_interval, self.threshold = vqvae_reinit_params(model)
        self.model = build_vqvae_from_ref(model)
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

        train_args = dict(train_args or {})
        self.alpha = train_args.pop("alpha", 1.0)
        self.beta = train_args.pop("beta", 0.25)
        self.gamma = train_args.pop("gamma", 1.0)

        init_x = jnp.zeros(
            (1, 32, 32, self.model.channel), jnp.float32
        )
        # jitted init: eager flax init pays one tunnel RT per op
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), init_x
        )
        self.opt_state = self.optimizer.init(self.params)
        self.counts = jnp.zeros(self.model.embed_num, jnp.float32)
        if self.load_path:
            self.restore(self.load_path)

        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh()
        self.train_step, self.eval_recon, self.reinit_step = make_vqvae_step(
            self.model, self.optimizer, self.alpha, self.beta, self.gamma,
            mesh=self.mesh,
        )

    def _state(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
            "counts": self.counts,
        }

    def save(self, path=None):
        save_checkpoint(path or self.save_path, self._state())

    def restore(self, path):
        st = load_checkpoint(path, self._state())
        self.params = st["params"]
        self.opt_state = st["opt_state"]
        self.step = int(st["step"])
        self.counts = st["counts"]

    def evaluate(self):
        bpds = []
        last = None
        n = 0
        for batch in iter(self.testloader):
            recloss, out = self.eval_recon(self.params, jnp.asarray(batch))
            bpds.append(float(recloss) / math.log(2.0))
            last = np.asarray(out)
            n += 1
            if self.max_eval_batches and n >= self.max_eval_batches:
                break
        return float(np.mean(bpds)) if bpds else float("nan"), last

    def train(self):
        log = math.log(2.0)
        while self.step < self.max_step:
            self.step += 1
            batch = jnp.asarray(next(self.trainloader))
            self.params, self.opt_state, loss, aux = self.train_step(
                self.params, self.opt_state, batch
            )
            recloss, vqloss, counts, flat = aux
            self.counts = self.counts + counts
            if self.reinit_interval:
                self.params, self.counts, did, nrep = self.reinit_step(
                    self.params,
                    self.counts,
                    flat,
                    float(self.reinit_interval),
                    float(self.threshold),
                )
            at_log = self.step % self.log_every == 0
            if self.reinit_interval and at_log and bool(did):
                # bool(did) forces a host sync, so the reinit report rides
                # the log cadence (the reinit itself runs every step,
                # device-side)
                print(f"vq re-init: replaced {int(nrep)} codewords")
            if at_log:
                # scalar reads sync the host; log_every > 1 keeps the
                # device pipeline hot (Trainer's discipline)
                self.writer.add_scalar("train loss", float(loss), self.step)
                self.writer.add_scalar(
                    "train recloss", float(recloss), self.step
                )
                self.writer.add_scalar(
                    "train vqloss", float(vqloss), self.step
                )
                self.writer.add_scalar(
                    "train bpd", float(recloss) / log, self.step
                )

            if self._at_interval(self.evaluate_interval):
                bpd, recon = self.evaluate()
                self.writer.add_scalar("test bpd", bpd, self.step)
                if recon is not None:
                    self.writer.add_image_grid("reconstruct", recon, self.step)
            if self._at_interval(self.save_interval):
                self.save()
        self.save()

    def _at_interval(self, interval: int) -> bool:
        return (
            self.step % self.step_per_epoch == 0 and self.step < interval
        ) or self.step % interval == 0
