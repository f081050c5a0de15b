"""Optimizers and LR schedules (optax).

Mirrors the reference's registered optimizers (trainer.py:181-183: Adamax,
Adam, SGD) and its WarmUpScheduler (trainer.py:171-178): a LambdaLR stepped
once per epoch with
    lr_mult(epoch) = min(1, (epoch+1)/warmup) * beta^(epoch+1-warmup)
Here the schedule is a pure function of the global step with
epoch = step // step_per_epoch, which reproduces the per-epoch stepping.
"""

from __future__ import annotations

from typing import Callable

import optax

from ..registry import OPTIMIZERS, SCHEDULERS


def warmup_exp_schedule(
    base_lr: float, warmup: int, beta: float, step_per_epoch: int
) -> Callable:
    def schedule(step):
        import jax.numpy as jnp

        epoch = step // step_per_epoch
        e1 = epoch + 1.0
        return (
            base_lr
            * jnp.minimum(1.0, e1 / warmup)
            * jnp.power(beta, e1 - warmup)
        )

    return schedule


@SCHEDULERS.register(name="WarmUpScheduler")
def warmup_scheduler(base_lr, step_per_epoch, warmup=10, beta=0.99):
    return warmup_exp_schedule(base_lr, warmup, beta, step_per_epoch)


@SCHEDULERS.register(name="Constant")
def constant_scheduler(base_lr, step_per_epoch):
    return lambda step: base_lr


@OPTIMIZERS.register(name="Adamax")
def adamax(learning_rate, **kw):
    return optax.adamax(learning_rate, **kw)


@OPTIMIZERS.register(name="Adam")
def adam(learning_rate, **kw):
    return optax.adam(learning_rate, **kw)


@OPTIMIZERS.register(name="SGD")
def sgd(learning_rate, **kw):
    return optax.sgd(learning_rate, **kw)


def build_optimizer(
    optimizer_cfg: dict, scheduler_cfg: dict, step_per_epoch: int
) -> optax.GradientTransformation:
    """Combine optimizer + scheduler configs (reference YAML shape:
    optimizer: {name, lr}, scheduler: {name, warmup, beta})."""
    ocfg = dict(optimizer_cfg)
    oname = ocfg.pop("name")
    base_lr = ocfg.pop("lr", ocfg.pop("learning_rate", 1e-3))
    grad_clip = ocfg.pop("grad_clip_norm", None)
    scfg = dict(scheduler_cfg or {"name": "Constant"})
    sname = scfg.pop("name")
    schedule = SCHEDULERS.get(sname)(
        base_lr=base_lr, step_per_epoch=step_per_epoch, **scfg
    )
    opt = OPTIMIZERS.get(oname)(learning_rate=schedule, **ocfg)
    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
