"""Scaling-efficiency harness (north-star: >=85% from 1 to N devices).

Measures sharded-train-step throughput over sub-meshes of increasing size
and reports efficiency = (throughput_N / throughput_1) / N.  On a CPU host
mesh (xla_force_host_platform_device_count) this validates the sharding
machinery; on a real pod slice the same harness measures ICI scaling.
Per-device batch is held constant (weak scaling), matching the reference
framework's absence of any multi-device baseline (SURVEY.md section 2:
the reference is strictly single-GPU).
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.idflow import IDFlow
from .mesh import make_mesh, mesh_shape_for
from .sharding import make_sharded_train_step


def measure_scaling(
    model: IDFlow,
    per_device_batch: int = 2,
    steps: int = 5,
    device_counts: List[int] = None,
    seed: int = 0,
    mode: str = "weak",
) -> Dict[int, Dict[str, float]]:
    """mode="weak": per-device batch held constant (global batch grows with
    N); efficiency = throughput_N / (N * throughput_1).  The meaningful
    measurement on real chips, where each device adds compute capacity.

    mode="overhead": GLOBAL batch held constant (per_device_batch * max N)
    while the mesh grows; efficiency = throughput_N / throughput_1.  On a
    virtual CPU mesh -- where all "devices" share the same physical cores
    and weak scaling is physically capped at cores/N -- this isolates what
    the harness can honestly validate there: the cost of partitioning +
    XLA collectives at fixed total compute (1.0 = sharding machinery adds
    nothing)."""
    assert mode in ("weak", "overhead")
    cfg = model.cfg
    devices = jax.devices()
    n_total = len(devices)
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_total]
    rng = np.random.default_rng(seed)
    opt = optax.adamax(1e-3)
    global_batch = per_device_batch * max(device_counts)

    results: Dict[int, Dict[str, float]] = {}
    base = None
    for nd in device_counts:
        mesh = make_mesh(mesh_shape_for(nd), devices=devices[:nd])
        B = global_batch if mode == "overhead" else per_device_batch * nd
        x = jnp.asarray(
            np.round(rng.uniform(0, 1, (B, cfg.H, cfg.W, cfg.C)) * 256)
            .astype(np.float32) / 256.0
        )
        params = model.init(jax.random.PRNGKey(0), x[:1])
        opt_state = opt.init(params)
        step = make_sharded_train_step(model, opt, mesh)
        with mesh:
            from ..utils.profiling import value_fence

            params, opt_state, loss = step(params, opt_state, x)  # compile
            value_fence(loss)  # also warms the fence's eager ops
            t0 = time.time()
            for _ in range(steps):
                params, opt_state, loss = step(params, opt_state, x)
            # value fence: trustworthy on every runtime incl. the tunnel
            # (block_until_ready is not -- utils/profiling.value_fence)
            value_fence(loss)
            dt = (time.time() - t0) / steps
        ips = B / dt
        if base is None:
            base = ips if mode == "overhead" else ips / nd
        results[nd] = {
            "images_per_s": ips,
            "efficiency": (
                ips / base if mode == "overhead" else ips / (base * nd)
            ),
        }
    return results
