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
    # diff <= 0 mathematically; float32 saturation can round it slightly
    # positive, which would make log() NaN -- clamp (the reference's eps
    # guard alone, distlib.py:54, does not cover this).
    diff = jnp.minimum(log_f_neg - log_f_pos, 0.0)
    # NOT log(1 - exp(diff) + eps) as in the reference: XLA's algebraic
    # simplifier reassociates that to (1 + eps) - exp(diff) and const-folds
    # 1 + 1e-8 -> 1.0f, destroying the guard and yielding log(0) = -inf
    # under jit.  -expm1(diff) is both simplifier-proof and exact in the
    # tails (no 1 - exp cancellation), so tail log-probs are *more*
    # accurate than the reference's log(eps) floor.
    return log_f_pos + jnp.log(-jnp.expm1(diff) + eps)


def dlogistic_sample(key, mean, logscale, nbits: int = 8, eps: float = 1e-7):
    u = jax.random.uniform(key, mean.shape, mean.dtype, minval=eps, maxval=1.0 - eps)
    std = jnp.log(u / (1.0 - u))
    return round_to_grid(std * jnp.exp(logscale) + mean, nbits)
