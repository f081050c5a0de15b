"""Sharded VQ codebook lookup (expert-parallel style) via shard_map.

The reference VectorQuantizer holds the full codebook on one GPU
(roundlib.py:42-89).  For large codebooks (configs use 8192 x 512) the
distance matmul and the codebook itself can shard over the mesh's `tile`
axis: each device scores only its codebook shard (a local MXU matmul),
devices exchange (local-min, global-index) via all_gather, and the winning
rows are fetched with a masked psum -- no device ever materializes the full
[N, K] distance matrix or the full codebook.

Also provides the cross-device usage-count reduction that keeps dead-code
reinit (models/vqvae.py: vq_reinit) deterministic and identical on every
host: psum the counts, then every host applies the same pure reinit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sharded_vq_lookup(x, codebook, mesh: Mesh, axis: str = "tile"):
    """x: [N, D] (replicated along `axis`), codebook: [K, D] sharded on K.

    Returns (vq_x [N, D], idx [N]) identical to a single-device argmin
    lookup (ties broken toward the lowest global index).
    """
    K = codebook.shape[0]
    nshards = mesh.shape[axis]
    ks = K // nshards

    def kernel(x, cb):
        d = (
            jnp.sum(x * x, axis=1, keepdims=True)
            + jnp.sum(cb * cb, axis=1)
            - 2.0 * jnp.dot(x, cb.T, preferred_element_type=jnp.float32)
        )  # [N, ks]
        li = jnp.argmin(d, axis=1)
        lv = jnp.take_along_axis(d, li[:, None], axis=1)[:, 0]
        shard = jax.lax.axis_index(axis)
        gi = li.astype(jnp.int32) + shard.astype(jnp.int32) * ks
        vs = jax.lax.all_gather(lv, axis)  # [nshards, N]
        gs = jax.lax.all_gather(gi, axis)  # [nshards, N]
        win = jnp.argmin(vs, axis=0)  # [N]
        idx = jnp.take_along_axis(gs, win[None, :], axis=0)[0]
        mine = (idx // ks) == shard
        local_rows = cb[jnp.where(mine, idx % ks, 0)]
        rows = jnp.where(mine[:, None], local_rows, 0.0)
        vq = jax.lax.psum(rows, axis)
        return vq, idx

    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(x, codebook)


def psum_counts(per_device_counts, mesh: Mesh):
    """All-reduce per-device usage counts [n_devices_total, K] -> [K] so
    every host applies the identical dead-code reinit (SURVEY.md section 2).
    In the jit-sharded training path XLA already produces globally-reduced
    counts; this explicit form is for shard_map pipelines."""

    def kernel(c):  # c: [devices/local, K] shard
        return jax.lax.psum(jnp.sum(c, axis=0), mesh.axis_names)

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(mesh.axis_names),
        out_specs=P(),
        check_vma=False,
    )(per_device_counts)
