"""Straight-through rounding to the 2^-nbits grid.

Semantics mirror the reference (roundlib.py:18-38): forward value is
round(x * 2^nbits) / 2^nbits with round-half-to-even (both torch.round and
jnp.round use banker's rounding), and the gradient passes through unchanged
(straight-through estimator, implemented there as `x + (round(x)-x).detach()`
at roundlib.py:24).

TPU notes: this is a pure VPU elementwise op; XLA fuses it into neighbouring
convolution epilogues so it is effectively free in the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def _round_st(x):
    return jnp.round(x)


@_round_st.defjvp
def _round_st_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    return jnp.round(x), dx


def round_ste(x, nbits: int = 8):
    """Round to the 2^-nbits grid with a straight-through gradient."""
    bins = jnp.asarray(2 ** nbits, x.dtype)
    return _round_st(x * bins) / bins


def round_to_grid(x, nbits: int = 8):
    """Non-differentiable grid rounding (data-pipeline use; reference rounds
    loader output at trainer.py:72)."""
    bins = 2 ** nbits
    return jnp.round(x * bins) / bins
