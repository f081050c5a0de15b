"""Discretized logistic distribution over the 2^-nbits grid.

Mirrors the reference likelihood (distlib.py:40-55):
    logP(x) = logsigmoid((x + 0.5/bins - mean)/scale)
            + log(1 - exp(logsigmoid(x_neg) - logsigmoid(x_pos)) + eps)
and the sampler (distlib.py:57-70): logistic inverse-CDF of a uniform,
affine by (mean, scale), rounded to the grid.

All math is float32 elementwise (VPU); XLA fuses the whole expression.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rounding import round_to_grid


def dlogistic_log_prob(x, mean, logscale, nbits: int = 8, eps: float = 1e-8):
    scale = jnp.exp(logscale)
    bins = 2 ** nbits
    half = 0.5 / bins
    x_pos = (x + half - mean) / scale
    x_neg = (x - half - mean) / scale
    log_f_pos = jax.nn.log_sigmoid(x_pos)
    log_f_neg = jax.nn.log_sigmoid(x_neg)
    return log_f_pos + jnp.log(1.0 - jnp.exp(log_f_neg - log_f_pos) + eps)


def dlogistic_sample(key, mean, logscale, nbits: int = 8, eps: float = 1e-7):
    u = jax.random.uniform(key, mean.shape, mean.dtype, minval=eps, maxval=1.0 - eps)
    std = jnp.log(u / (1.0 - u))
    return round_to_grid(std * jnp.exp(logscale) + mean, nbits)
