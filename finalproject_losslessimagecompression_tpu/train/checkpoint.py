"""Checkpointing with real resume.

The reference saves {model, optimizer, step} via torch.save
(trainer.py:351-357) but its resume path is dead code (`if load_path: pass`,
trainer.py:216-217).  Here save/restore are both first-class: the full train
state (params, opt_state, step) round-trips through flax msgpack
serialization against a structural template, with atomic file replacement.
Permutations are seed-derived (invertible.py in this repo) so checkpoints
stay small and portable -- unlike the reference, which must persist its
unseeded random permutation matrices to keep encode/decode consistent
(reference: invertible.py:33-36).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict

from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    blob = serialization.to_bytes(state)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `template` (same pytree layout)."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)


def load_raw(path: str) -> Dict[str, Any]:
    """Template-free restore to nested dicts of arrays.  Sufficient for
    loading `params` of another model (e.g. the frozen VQ-VAE consumed by
    ResidualTrainer, reference: trainer.py:572-577) without knowing its
    optimizer state structure."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.msgpack_restore(blob)
