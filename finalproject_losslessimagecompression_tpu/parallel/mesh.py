"""Device mesh construction + multi-host init.

The reference is strictly single-GPU (SURVEY.md section 2: no distributed
code exists anywhere in it); this layer is new, TPU-native scale-out:
- a 2-axis mesh ("data", "tile"): image batches shard over `data`, patch
  tiles (the Patching unit, reference extenddim.py:41-67) shard over
  `tile`; the VQ codebook shards over `tile` as well (parallel/vq.py).
- collectives ride ICI via XLA (psum for gradient/metric reduction,
  all_gather for codebook stats); rANS streams stay chip-local so coded
  bitstreams are bit-identical regardless of topology.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Default (data, tile) factorization: tile gets the largest power-of-2
    factor <= sqrt(n), data the rest."""
    tile = 1
    while (
        tile * 2 <= int(math.sqrt(n_devices))
        and n_devices % (tile * 2) == 0
    ):
        tile *= 2
    return n_devices // tile, tile


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "tile"),
    devices=None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = mesh_shape_for(n)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def init_distributed(**kwargs) -> None:
    """Multi-host runtime init (jax.distributed).

    Called by cli/train.py when --distributed / LIC_DISTRIBUTED=1 is set
    (coordinator address etc. come from the standard JAX env vars or
    kwargs).  Tolerates exactly one condition -- an already-initialized
    runtime (idempotent re-entry); any real failure propagates, because a
    host silently falling back to single-process mode would desync the
    training fleet."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
