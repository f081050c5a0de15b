from .codec import sharded_decode, sharded_encode
from .mesh import make_mesh, mesh_shape_for
from .sharding import (
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from .sharding import make_sharded_eval_step
from .vq import psum_counts, sharded_vq_lookup

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "replicate",
    "shard_batch",
    "sharded_vq_lookup",
    "sharded_encode",
    "sharded_decode",
    "psum_counts",
]
