"""Sharded training/eval steps (pjit via jax.jit + NamedSharding).

Parallelism layout for this model family (no attention, no MoE -- the axes
that exist are batch and spatial tiles):
- params: replicated (flow/VQ-VAE models are small relative to activations).
- batch: sharded over the flattened ("data", "tile") axes.  In the residual
  pipeline the leading axis is B * num_patches, so this realizes data
  parallelism AND tile/sequence-style parallelism simultaneously.
- gradients: reduced automatically -- with replicated params and sharded
  batch, XLA's SPMD partitioner inserts the psum over both axes.
- VQ codebook: optionally sharded over "tile" (parallel/vq.py) with an
  explicit shard_map argmin + psum gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.idflow import IDFlow, log_likelihood


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh):
    """Shard the leading (batch/tile) axis over the whole mesh."""
    return NamedSharding(mesh, P(("data", "tile")))


def make_sharded_train_step(
    model: IDFlow, optimizer, mesh: Mesh, conditional: bool = False
):
    cfg = model.cfg
    repl = replicate(mesh)
    data_sh = shard_batch(mesh)

    def loss_fn(params, batch, cond):
        if conditional:
            latents, means, logscales = model.apply(params, batch, cond)
        else:
            latents, means, logscales = model.apply(params, batch)
        lp, _ = log_likelihood(cfg, latents, means, logscales)
        return -jnp.mean(lp)

    def _step(params, opt_state, batch, cond):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, cond)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if conditional:
        step = jax.jit(
            _step,
            in_shardings=(repl, repl, data_sh, data_sh),
            out_shardings=(repl, repl, repl),
        )
    else:
        step = jax.jit(
            lambda p, o, b: _step(p, o, b, None),
            in_shardings=(repl, repl, data_sh),
            out_shardings=(repl, repl, repl),
        )
    return step


def make_sharded_eval_step(model: IDFlow, mesh: Mesh,
                           conditional: bool = False):
    cfg = model.cfg
    repl = replicate(mesh)
    data_sh = shard_batch(mesh)

    def loss_fn(params, batch, cond=None):
        if conditional:
            latents, means, logscales = model.apply(params, batch, cond)
        else:
            latents, means, logscales = model.apply(params, batch)
        lp, _ = log_likelihood(cfg, latents, means, logscales)
        return -jnp.mean(lp)

    if conditional:
        return jax.jit(
            loss_fn, in_shardings=(repl, data_sh, data_sh),
            out_shardings=repl,
        )
    return jax.jit(
        lambda p, b: loss_fn(p, b), in_shardings=(repl, data_sh),
        out_shardings=repl,
    )
