"""Flow trainer: the reference `Trainer` (trainer.py:185-357) re-built for
TPU -- one fused jitted train step (forward + NLL + grads + optax update),
periodic eval with an optional REAL rANS coding round-trip (bit-exactness
counted, real bpd vs analytic bpd), temperature-swept sample grids, and
checkpointing with working resume (the reference's resume is dead code,
trainer.py:216-217).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader  # noqa: F401  (registers loaders)
from ..models.config import FlowCfg, latent_shapes
from ..models.exact import FlowCodec
from ..models.idflow import IDFlow, log_likelihood
from ..ops.dlogistic import dlogistic_sample
from ..registry import DATALOADERS, TRAINERS, build
from .checkpoint import load_checkpoint, save_checkpoint
from .metrics import MetricsWriter
from .optim import build_optimizer


def make_train_step(model: IDFlow, optimizer, conditional: bool = False,
                    mesh=None):
    """Fused train step; with `mesh`, the batch shards over the whole mesh
    and params/opt state replicate (XLA inserts the gradient psum)."""
    cfg = model.cfg

    def loss_fn(params, batch, cond=None):
        if conditional:
            latents, means, logscales = model.apply(params, batch, cond)
        else:
            latents, means, logscales = model.apply(params, batch)
        lp, per_split = log_likelihood(cfg, latents, means, logscales)
        loss = -jnp.mean(lp)
        aux = {
            "per_split_bpd": jnp.stack(
                [-jnp.mean(s) / math.log(2.0) for s in per_split]
            ),
            "max_z": jnp.stack(
                [jnp.max(z) * (2 ** cfg.nbits) for z in latents]
            ),
            "min_z": jnp.stack(
                [jnp.min(z) * (2 ** cfg.nbits) for z in latents]
            ),
        }
        return loss, aux

    def _step(params, opt_state, batch, cond=None):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, cond
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        # donate params/opt_state: the updated trees reuse the old buffers
        return jax.jit(_step, donate_argnums=(0, 1)), jax.jit(loss_fn)

    from ..parallel.sharding import replicate, shard_batch

    repl = replicate(mesh)
    dsh = shard_batch(mesh)
    if conditional:
        # cond is per-sample (the VQ reconstruction): shard it with the batch
        train_step = jax.jit(
            _step,
            in_shardings=(repl, repl, dsh, dsh),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1),
        )
        eval_step = jax.jit(
            loss_fn,
            in_shardings=(repl, dsh, dsh),
            out_shardings=(repl, repl),
        )
        return train_step, eval_step
    train_step = jax.jit(
        lambda p, o, b: _step(p, o, b),
        in_shardings=(repl, repl, dsh),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )
    eval_step = jax.jit(
        lambda p, b: loss_fn(p, b),
        in_shardings=(repl, dsh),
        out_shardings=(repl, repl),
    )
    return train_step, eval_step


def make_multi_train_step(model: IDFlow, optimizer, length: int,
                          conditional: bool = False, mesh=None):
    """`length` train steps inside ONE compiled program (lax.scan over the
    step body), consuming a stacked [length, B, H, W, C] super-batch --
    one host dispatch per `length` steps.

    On high-dispatch-latency runtimes (remote tunnels: ~16 ms per dispatch
    measured, a third of the flagship step) this is both the
    throughput-optimal way to train between log points and the only honest
    way to TIME the step: host-observed per-step wall clock conflates
    dispatch cost with compute, and jax.block_until_ready has been observed
    to return early through the tunnel (see CLAUDE.md) -- a scanned
    program timed with a value fetch amortizes one dispatch over `length`
    real steps.  Returns (params, opt_state, losses[length])."""
    cfg = model.cfg

    def loss_fn(params, batch, cond=None):
        if conditional:
            latents, means, logscales = model.apply(params, batch, cond)
        else:
            latents, means, logscales = model.apply(params, batch)
        lp, _ = log_likelihood(cfg, latents, means, logscales)
        return -jnp.mean(lp)

    import optax

    def body(carry, xs):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def multi(params, opt_state, batches):
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batches, length=length
        )
        return params, opt_state, losses

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0, 1))
    # SPMD: params/opt state replicated; the super-batch shards its BATCH
    # axis (dim 1 -- dim 0 is the scan/step axis) over the whole mesh, so
    # every scanned step runs the same data-parallel layout as the
    # single-step sharded program (XLA inserts the per-step grad psum)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import replicate

    repl = replicate(mesh)
    bsh = NamedSharding(mesh, P(None, ("data", "tile")))
    return jax.jit(
        multi,
        in_shardings=(repl, repl, bsh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_forward(model: IDFlow, conditional: bool = False):
    @jax.jit
    def forward(params, batch, cond=None):
        if conditional:
            return model.apply(params, batch, cond)
        return model.apply(params, batch)

    return forward


@TRAINERS.register(name="Trainer")
class Trainer:
    """Config shape mirrors the reference YAML (configs/config1.yaml)."""

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
        test_coding: bool = False,
        seed: int = 0,
        num_streams: int = 4096,
        max_eval_batches: int = 0,
        use_mesh: bool = False,
        log_every: int = 1,
        steps_per_dispatch: int = 1,
    ):
        model = dict(model)
        self.load_path = model.pop("load_path", None)
        self.cfg = FlowCfg.from_ref(model)
        self.model = IDFlow(self.cfg)
        self.trainloader = build(DATALOADERS, train_dataloader)
        self.testloader = build(DATALOADERS, test_dataloader)
        self.optimizer = build_optimizer(optimizer, scheduler, step_per_epoch)
        self.max_step = max_step
        self.step_per_epoch = step_per_epoch
        self.evaluate_interval = evaluate_interval
        self.save_interval = save_interval
        self.save_path = save_path
        self.writer = MetricsWriter(writer_path)
        self.test_coding = test_coding
        self.num_streams = num_streams
        self.max_eval_batches = max_eval_batches
        self.log_every = max(1, log_every)
        # steps_per_dispatch > 1: run K steps per host dispatch through a
        # lax.scan'd program (make_multi_train_step) -- on remote-tunnel
        # runtimes each dispatch costs ~a tunnel RT of host work, a third
        # of the flagship step, so K amortizes it.  All K losses still
        # reach the metrics log (the scan returns them; one fetch per
        # block).  Intervals must align with the block size.
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        if self.steps_per_dispatch > 1:
            for name, iv in (
                ("evaluate_interval", evaluate_interval),
                ("save_interval", save_interval),
                ("step_per_epoch", step_per_epoch),
                # without this the loop overshoots max_step by up to K-1
                ("max_step", max_step),
            ):
                if iv % self.steps_per_dispatch:
                    raise ValueError(
                        f"{name}={iv} must be a multiple of "
                        f"steps_per_dispatch={self.steps_per_dispatch}"
                    )
        self.step = 0

        init_x = jnp.zeros(
            (1, self.cfg.H, self.cfg.W, self.cfg.C), jnp.float32
        )
        # jit the init: eager flax init dispatches one op per parameter,
        # and on remote-tunnel runtimes each dispatch costs a host round
        # trip (minutes for big models; cli/codec.py measured ~335 s
        # eager).  Values are identical (deterministic PRNG math).
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), init_x
        )
        self.opt_state = self.optimizer.init(self.params)
        if self.load_path:
            self.restore(self.load_path)
            K = self.steps_per_dispatch
            if K > 1 and self.step % K:
                # a resumed step not congruent 0 mod K would shift every
                # interval check (all multiples of K) off-phase -- no
                # periodic eval/save would ever fire again.  Realign DOWN
                # (re-runs up to K-1 training steps; harmless).
                old = self.step
                self.step -= self.step % K
                print(
                    f"resume: step {old} realigned to {self.step} "
                    f"(steps_per_dispatch={K} blocks)"
                )

        mesh = None
        if use_mesh and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        self.train_step, self.eval_step = make_train_step(
            self.model, self.optimizer, mesh=mesh
        )
        self.multi_step = None
        if self.steps_per_dispatch > 1:
            self.multi_step = make_multi_train_step(
                self.model, self.optimizer, self.steps_per_dispatch,
                mesh=mesh,
            )
        self.forward = make_forward(self.model)
        self.codec = FlowCodec(self.model, num_streams=self.num_streams)
        self.sharded_codec = None
        if mesh is not None:
            from ..parallel.flow_codec import ShardedFlowCodec

            self.sharded_codec = ShardedFlowCodec(self.codec, mesh)
        self.sample_key = jax.random.PRNGKey(seed + 1)

    # -- checkpointing ----------------------------------------------------

    def _state(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }

    def save(self, path: Optional[str] = None):
        save_checkpoint(path or self.save_path, self._state())

    def restore(self, path: str):
        st = load_checkpoint(path, self._state())
        self.params = st["params"]
        self.opt_state = st["opt_state"]
        self.step = int(st["step"])

    # -- eval -------------------------------------------------------------

    def evaluate(self):
        from ..utils.profiling import PhaseTimer, value_fence

        timer = PhaseTimer()
        bpds, real_bpds, errors = [], [], 0
        n_batches = 0
        fence_warm = False
        for batch in iter(self.testloader):
            batch = jnp.asarray(batch)
            if not fence_warm:
                # warm the compiled program AND the fence's eager ops
                # outside the timed phase (both pay one-time compiles)
                value_fence(self.eval_step(self.params, batch)[0])
                fence_warm = True
            with timer.phase("forward"):
                loss, aux = self.eval_step(self.params, batch)
                # value fence: block_until_ready returns early on the
                # tunnel runtime (docs/DESIGN.md section 7); only a value
                # fetch is a trustworthy fence for the logged forward_time
                loss_v = float(value_fence(loss)[0])
            bpds.append(loss_v / math.log(2.0))
            if self.test_coding:
                # over a mesh, eval coding runs the chip-local sharded
                # pipeline (each device codes its own batch shard; streams
                # never cross devices) when the batch divides evenly
                codec = self.codec
                if (
                    self.sharded_codec is not None
                    and batch.shape[0] % self.sharded_codec.D == 0
                ):
                    codec = self.sharded_codec
                try:
                    with timer.phase("encode"):
                        blobs, info = codec.compress(self.params, batch)
                    with timer.phase("decode"):
                        rec = codec.decompress(
                            self.params, blobs, info
                        )
                        rec = np.asarray(rec)
                    errors += int(np.sum(rec != np.asarray(batch)))
                    real_bpds.append(codec.real_bpd(blobs, info))
                except ValueError:
                    # undecodable stream: count the whole batch as failed
                    # (the reference swallows these, trainer.py:328-329;
                    # we surface them as metrics)
                    errors += int(np.asarray(batch).size)
            n_batches += 1
            if self.max_eval_batches and n_batches >= self.max_eval_batches:
                break
        rep = timer.report()
        out = {
            "test_bpd": float(np.mean(bpds)) if bpds else float("nan"),
            "forward_time": rep.get("forward", {}).get("total_s", 0.0),
        }
        if self.test_coding:
            out["real_bpd"] = (
                float(np.mean(real_bpds)) if real_bpds else float("nan")
            )
            out["coding_errors"] = errors
            out["coding_time"] = (
                rep.get("encode", {}).get("total_s", 0.0)
                + rep.get("decode", {}).get("total_s", 0.0)
            )
            out["phase_report"] = rep
        return out

    def sample_images(self, batch: int = 16, temperatures=(0.25, 0.5, 0.75)):
        shapes = latent_shapes(self.cfg)
        noises = []
        for s in shapes:
            self.sample_key, k = jax.random.split(self.sample_key)
            noises.append(
                dlogistic_sample(
                    k,
                    jnp.zeros((batch,) + s, jnp.float32),
                    jnp.zeros((batch,) + s, jnp.float32),
                    self.cfg.nbits,
                )
            )
        # jitted sample path: the eager apply dispatches one op per conv,
        # which on remote-tunnel runtimes stalled every eval for minutes
        # (hundreds of RTs x 3 temperatures); one compiled program reused
        # across temperatures (same shapes)
        if not hasattr(self, "_sample_jit"):
            self._sample_jit = jax.jit(
                lambda p, ns: self.model.apply(
                    p, ns, method=IDFlow.sample_from_noise
                )
            )
        out = {}
        for t in temperatures:
            img = self._sample_jit(self.params, [n * t for n in noises])
            out[t] = np.asarray(img)
        return out

    # -- main loop --------------------------------------------------------

    def train(self):
        """Main loop; on any crash/interrupt a rescue checkpoint is written
        so long runs always resume (the reference has no resume at all,
        trainer.py:216-217)."""
        try:
            self._train_loop()
        except BaseException:
            try:
                self.save(self.save_path + ".rescue")
                print(f"rescue checkpoint: {self.save_path}.rescue "
                      f"(step {self.step})")
            except Exception:
                pass
            raise

    def _train_loop(self):
        import time

        from ..utils.profiling import compiled_flops, device_peak_tflops

        log = math.log(2.0)
        flops = None
        peak = device_peak_tflops()
        last_sync = None
        K = self.steps_per_dispatch if self.multi_step is not None else 1
        while self.step < self.max_step:
            if K > 1:
                # K steps per dispatch: one scanned program consumes a
                # stacked super-batch; ALL K losses come back in one fetch
                batches = jnp.asarray(np.stack(
                    [np.asarray(next(self.trainloader)) for _ in range(K)]
                ))
                if flops is None:
                    # per-step FLOPs from the SINGLE-step program: XLA's
                    # cost analysis counts a lax.scan body ONCE (trip
                    # count is not folded in at the HLO level), so the
                    # scanned program's count is already ~per-step --
                    # dividing it by K under-reported MFU by ~K (r4
                    # advisor finding; bench.py bench_train_mfu applies
                    # the same rule)
                    flops = compiled_flops(
                        self.train_step, self.params, self.opt_state,
                        batches[0],
                    ) or 0.0
                    if flops:
                        self.writer.add_scalar("flops per step", flops, 0)
                self.params, self.opt_state, losses = self.multi_step(
                    self.params, self.opt_state, batches
                )
                self.step += K
                aux = None
                if (self.step // K) % max(1, self.log_every // K) == 0:
                    ls = np.asarray(losses)  # ONE sync for K losses
                    for j, lv in enumerate(ls):
                        s = self.step - K + 1 + j
                        self.writer.add_scalar("train loss", float(lv), s)
                        self.writer.add_scalar(
                            "train bpd", float(lv) / log, s
                        )
                    now = time.time()
                    if last_sync is not None:
                        # actual sync period: logging fires every
                        # max(1, log_every//K) blocks of K steps, which
                        # is NOT log_every when log_every % K != 0
                        # (r4 advisor finding)
                        period = max(1, self.log_every // K) * K
                        step_s = (now - last_sync) / period
                        self.writer.add_scalar(
                            "step time s", step_s, self.step
                        )
                        if flops and step_s > 0:
                            tf = flops / step_s / 1e12
                            self.writer.add_scalar(
                                "achieved tflops", tf, self.step
                            )
                            if peak:
                                self.writer.add_scalar(
                                    "mfu pct", 100.0 * tf / peak, self.step
                                )
                    last_sync = now
            else:
                self.step += 1
                batch = jnp.asarray(next(self.trainloader))
                if flops is None:
                    # FLOPs/step from XLA's cost model (once; logged with
                    # the achieved-TFLOP/s rate below).  Uses abstract
                    # args, so donated buffers are never touched.
                    flops = compiled_flops(
                        self.train_step, self.params, self.opt_state, batch
                    ) or 0.0
                    if flops:
                        self.writer.add_scalar("flops per step", flops, 0)
                self.params, self.opt_state, loss, aux = self.train_step(
                    self.params, self.opt_state, batch
                )
                if self.step % self.log_every == 0:
                    # reading the loss forces a host sync; log_every > 1
                    # keeps the device pipeline hot on high-latency
                    # runtimes
                    bpd = float(loss) / log
                    self.writer.add_scalar(
                        "train loss", float(loss), self.step
                    )
                    self.writer.add_scalar("train bpd", bpd, self.step)
                    now = time.time()
                    if last_sync is not None:
                        step_s = (now - last_sync) / self.log_every
                        self.writer.add_scalar(
                            "step time s", step_s, self.step
                        )
                        if flops:
                            tf = flops / step_s / 1e12
                            self.writer.add_scalar("achieved tflops", tf,
                                                   self.step)
                            if peak:
                                self.writer.add_scalar(
                                    "mfu pct", 100.0 * tf / peak, self.step
                                )
                    last_sync = now

            if self._at_interval(self.evaluate_interval):
                if aux is not None:  # scanned blocks carry losses only
                    for i, (mx, mn, sb) in enumerate(
                        zip(
                            np.asarray(aux["max_z"]),
                            np.asarray(aux["min_z"]),
                            np.asarray(aux["per_split_bpd"]),
                        )
                    ):
                        print(
                            f"split_id: {i} , max_z : {mx} , min_z : {mn} "
                            f", bpd_for_split : {sb}"
                        )
                ev = self.evaluate()
                self.writer.add_scalar("test bpd", ev["test_bpd"], self.step)
                if self.test_coding:
                    if np.isfinite(ev.get("real_bpd", float("nan"))):
                        self.writer.add_scalar(
                            "real bpd", ev["real_bpd"], self.step
                        )
                    self.writer.add_scalar(
                        "coding errors", ev["coding_errors"], self.step
                    )
                for t, img in self.sample_images().items():
                    self.writer.add_image_grid(f"t={t}", img, self.step)

            if self._at_interval(self.save_interval):
                self.save()
        self.save()

    def _at_interval(self, interval: int) -> bool:
        # reference cadence (trainer.py:242,351): every epoch before the
        # first interval, then at the interval
        return (
            self.step % self.step_per_epoch == 0 and self.step < interval
        ) or self.step % interval == 0
