"""Residual pipeline trainer -- the flagship (reference: trainer.py:550-731).

A frozen pretrained VQ-VAE produces a lossy reconstruction; its grid-rounded
residual (data - rec) is tiled into patches and modelled by an (optionally
reconstruction-conditioned) IDFlow.  Eval decodes residual latents back and
verifies reconstruction.

TPU-native notes: the whole step (VQ-VAE inference + patching + flow
forward/backward) is ONE jitted graph; patches are the natural `tile`
sharding unit on a device mesh (see parallel/).  `nouse_vqvae` trains the
flow directly on image patches (reference: trainer.py:612-614).
`patch_batch_size` > 0 selects a random patch subset per step instead of the
reference's sequential minibatch sweep (trainer.py:635-663) -- same
stochastic-gradient semantics, one fused device step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import FlowCfg
from ..models.exact import FlowCodec
from ..models.idflow import IDFlow, log_likelihood
from ..models.vqvae import VQVAE, build_vqvae_from_ref
from ..ops.reshape import patch_merge, patch_split
from ..ops.rounding import round_to_grid
from ..registry import DATALOADERS, TRAINERS, build
from .checkpoint import load_checkpoint, load_raw, save_checkpoint
from .metrics import MetricsWriter
from .optim import build_optimizer

LOG2 = math.log(2.0)


@TRAINERS.register(name="ResidualTrainer")
class ResidualTrainer:
    def __init__(
        self,
        flows: dict,
        vqvae: dict,
        input_size,
        train_dataloader: dict,
        test_dataloader: dict,
        patch_batch_size: int,
        optimizer: dict,
        scheduler: dict,
        max_step: int,
        step_per_epoch: int,
        evaluate_interval: int,
        save_interval: int,
        save_path: str,
        writer_path: str,
        nouse_vqvae: bool = False,
        seed: int = 0,
        num_streams: int = 1024,
        max_eval_batches: int = 0,
        test_coding: bool = False,
        use_mesh: bool = False,
        log_every: int = 1,
    ):
        flows = dict(flows)
        self.load_path = flows.pop("load_path", None)
        self.cfg = FlowCfg.from_ref(flows)
        if self.cfg.conditional and nouse_vqvae:
            raise ValueError(
                "conditional flows require the VQ-VAE (reference guard: "
                "trainer.py:595)"
            )
        self.model = IDFlow(self.cfg)
        self.nouse_vqvae = nouse_vqvae

        self.vqvae = None
        self.vq_params = None
        if not nouse_vqvae:
            vqvae = dict(vqvae)
            ckpt = vqvae.pop("checkpoint")
            self.vqvae = build_vqvae_from_ref(vqvae)
            # checkpoint state = {"params": <model variables>, ...}
            self.vq_params = load_raw(ckpt)["params"]

        self.input_size = tuple(input_size)
        self.trainloader = build(DATALOADERS, train_dataloader)
        self.testloader = build(DATALOADERS, test_dataloader)
        self.optimizer = build_optimizer(optimizer, scheduler, step_per_epoch)
        self.max_step = max_step
        self.step_per_epoch = step_per_epoch
        self.evaluate_interval = evaluate_interval
        self.save_interval = save_interval
        self.save_path = save_path
        self.writer = MetricsWriter(writer_path)
        self.patch_batch_size = patch_batch_size
        self.max_eval_batches = max_eval_batches
        self.test_coding = test_coding
        self.log_every = max(1, log_every)
        self.step = 0

        init_x = jnp.zeros(
            (1, self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        if self.cfg.conditional:
            # jitted init: eager flax init pays one tunnel RT per op
            self.params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), init_x, init_x
            )
        else:
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
        self._build_steps()
        self.codec = FlowCodec(self.model, num_streams=num_streams)
        # conditional + VQ-VAE: the coding test can close the whole loop --
        # code the VQ index stream too, decode with NO side information
        # (the reference's test hands the decoder the encode-side
        # reconstruction, trainer.py:304-327)
        self.res_codec = None
        self.sharded_res_codec = None
        if self.cfg.conditional and not nouse_vqvae:
            from ..models.residual_codec import ResidualCodec

            self.res_codec = ResidualCodec(
                self.vqvae, self.vq_params, self.codec, self.input_size
            )
            if self.mesh is not None:
                # mesh serving: chip-local residual coding (each device's
                # containers byte-identical to a single-chip compress of
                # its image shard; parallel/full_codecs.py)
                from ..parallel.full_codecs import ShardedResidualCodec

                self.sharded_res_codec = ShardedResidualCodec(
                    self.res_codec, self.mesh
                )
        self.rng_key = jax.random.PRNGKey(seed + 2)

    # ------------------------------------------------------------------

    def _prepare(self, data):
        """data [B,H,W,C] -> (patches, rec_patches or None, rec or None)."""
        H, W = self.input_size
        if self.nouse_vqvae:
            patches = patch_split(data, self.cfg.H, self.cfg.W)
            return patches, None, None
        rec = self.vqvae.apply(
            self.vq_params, (data - 0.5) / 0.5, method=VQVAE.reconstruct
        )
        rec = rec * 0.5 + 0.5
        rec = round_to_grid(rec, self.cfg.nbits)  # trainer.py:607
        res = data - rec
        patches = patch_split(res, self.cfg.H, self.cfg.W)
        rec_patches = patch_split(rec, self.cfg.H, self.cfg.W)
        return patches, rec_patches, rec

    def _build_steps(self):
        conditional = self.cfg.conditional
        cfg = self.cfg

        def loss_fn(params, patches, rec_patches):
            if conditional:
                l, m, s = self.model.apply(params, patches, rec_patches)
            else:
                l, m, s = self.model.apply(params, patches)
            lp, per = log_likelihood(cfg, l, m, s)
            aux = {
                "per_split_bpd": jnp.stack(
                    [-jnp.mean(x) / LOG2 for x in per]
                ),
                "max_z": jnp.stack([jnp.max(z) * 256 for z in l]),
                "min_z": jnp.stack([jnp.min(z) * 256 for z in l]),
                "latents": l,
            }
            return -jnp.mean(lp), aux

        def train_step(params, opt_state, data, key):
            patches, rec_patches, _ = self._prepare(data)
            if self.patch_batch_size:
                n = patches.shape[0]
                k = min(self.patch_batch_size, n)
                sel = jax.random.choice(key, n, (k,), replace=False)
                patches = patches[sel]
                if rec_patches is not None:
                    rec_patches = rec_patches[sel]
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, patches, rec_patches)
            aux.pop("latents")
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        def eval_step(params, data):
            patches, rec_patches, rec = self._prepare(data)
            loss, aux = loss_fn(params, patches, rec_patches)
            return loss, aux, patches, rec_patches, rec

        if self.mesh is not None:
            # SPMD: params/opt state replicated, the image batch sharded
            # over the whole mesh (patches inherit the sharding through
            # patch_split); XLA inserts the gradient psum
            from ..parallel.sharding import replicate, shard_batch

            repl, dsh = replicate(self.mesh), shard_batch(self.mesh)
            train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, dsh, repl),
                out_shardings=(repl, repl, repl, repl),
            )
            eval_step = jax.jit(
                eval_step, in_shardings=(repl, dsh),
            )
        else:
            train_step = jax.jit(train_step)
            eval_step = jax.jit(eval_step)

        self.train_step = train_step
        self.eval_step = eval_step

        @jax.jit
        def reconstruct_from_latents(params, latents):
            return self.model.apply(
                params, latents, method=IDFlow.inverse_from_latents
            )

        self.reconstruct_from_latents = reconstruct_from_latents

    # ------------------------------------------------------------------

    def _state(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "step": self.step}

    def save(self, path=None):
        save_checkpoint(path or self.save_path, self._state())

    def restore(self, path):
        st = load_checkpoint(path, self._state())
        self.params, self.opt_state = st["params"], st["opt_state"]
        self.step = int(st["step"])

    def evaluate(self):
        H, W = self.input_size
        bpds, real_bpds, errors = [], [], 0
        last = {}
        rec_err = float("nan")
        n = 0
        for data in iter(self.testloader):
            data = jnp.asarray(data)
            loss, aux, patches, rec_patches, rec = self.eval_step(
                self.params, data
            )
            bpds.append(float(loss) / LOG2)
            latents = aux["latents"]
            gen = self.reconstruct_from_latents(self.params, latents)
            gen_img = patch_merge(gen, H, W)
            if rec is not None:
                rec_img = rec + gen_img
                rec_err = float(jnp.linalg.norm(data - rec_img))
                last = {"data": data, "rec": rec, "res_dec": gen_img,
                        "rec_img": rec_img}
            else:
                rec_err = float(jnp.linalg.norm(data - gen_img))
                last = {"data": data, "rec_img": gen_img}
            if self.test_coding:
                try:
                    sharded = self.sharded_res_codec
                    if (
                        sharded is not None
                        and data.shape[0] % sharded.D == 0
                    ):
                        # mesh serving path: every device codes its own
                        # image shard chip-locally
                        idx_blobs, blobs, info = sharded.compress(
                            self.params, data
                        )
                        dec = sharded.decompress(
                            self.params, idx_blobs, blobs, info
                        )
                        errors += int(
                            np.sum(np.asarray(dec) != np.asarray(data))
                        )
                        real_bpds.append(
                            sharded.real_bpd(idx_blobs, blobs, info)
                        )
                    elif self.res_codec is not None:
                        # full pipeline: VQ indices travel in the bitstream
                        idx_blob, blobs, info = self.res_codec.compress(
                            self.params, data
                        )
                        dec = self.res_codec.decompress(
                            self.params, idx_blob, blobs, info
                        )
                        errors += int(
                            np.sum(np.asarray(dec) != np.asarray(data))
                        )
                        real_bpds.append(
                            self.res_codec.real_bpd(idx_blob, blobs, info)
                        )
                    else:
                        blobs, info = self.codec.compress(
                            self.params, patches, rec_patches
                        )
                        dec = self.codec.decompress(
                            self.params, blobs, info, rec_patches
                        )
                        errors += int(
                            np.sum(np.asarray(dec) != np.asarray(patches))
                        )
                        real_bpds.append(
                            self.codec.coded_bits(blobs)
                            / float(np.asarray(data).size)
                        )
                except ValueError:
                    errors += int(np.asarray(patches).size)
            n += 1
            if self.max_eval_batches and n >= self.max_eval_batches:
                break
        out = {
            "test_bpd": float(np.mean(bpds)) if bpds else float("nan"),
            "rec_error": rec_err if bpds else float("nan"),
            "images": last,
        }
        if self.test_coding:
            out["real_bpd"] = (
                float(np.mean(real_bpds)) if real_bpds else float("nan")
            )
            out["coding_errors"] = errors
        return out

    def train(self):
        while self.step < self.max_step:
            self.step += 1
            data = jnp.asarray(next(self.trainloader))
            self.rng_key, k = jax.random.split(self.rng_key)
            self.params, self.opt_state, loss, aux = self.train_step(
                self.params, self.opt_state, data, k
            )
            if self.step % self.log_every == 0:
                # float(loss) forces a host sync (~one tunnel round trip
                # per call on remote runtimes); log_every > 1 keeps the
                # device pipeline hot between logs (same discipline as
                # Trainer, train/trainer.py)
                self.writer.add_scalar("train loss", float(loss), self.step)
                self.writer.add_scalar(
                    "train bpd", float(loss) / LOG2, self.step
                )

            if self._at_interval(self.evaluate_interval):
                ev = self.evaluate()
                self.writer.add_scalar("test bpd", ev["test_bpd"], self.step)
                self.writer.add_scalar(
                    "test rec error", ev["rec_error"], self.step
                )
                if self.test_coding:
                    self.writer.add_scalar(
                        "coding errors", ev["coding_errors"], self.step
                    )
                    if np.isfinite(ev.get("real_bpd", float("nan"))):
                        self.writer.add_scalar(
                            "real bpd", ev["real_bpd"], self.step
                        )
                imgs = ev["images"]
                if "data" in imgs:
                    self.writer.add_image_grid(
                        "original", np.asarray(imgs["data"]), self.step
                    )
                if "rec" in imgs:
                    self.writer.add_image_grid(
                        "rec by vqvae", np.asarray(imgs["rec"]), self.step
                    )
                    self.writer.add_image_grid(
                        "decoded residual",
                        np.asarray(imgs["res_dec"]) + 0.5,
                        self.step,
                    )
                self.writer.add_image_grid(
                    "rec image", np.asarray(imgs["rec_img"]), self.step
                )
            if self._at_interval(self.save_interval):
                self.save()
        self.save()

    def _at_interval(self, interval: int) -> bool:
        return (
            self.step % self.step_per_epoch == 0 and self.step < interval
        ) or self.step % interval == 0
