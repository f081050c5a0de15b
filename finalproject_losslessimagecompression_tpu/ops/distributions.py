"""Reconstruction likelihoods for the VQ-VAE (reference: distlib.py:73-103).

- binomial_log_prob: Binomial(255, y) log-likelihood of round(x*255)
  (reference: distlib.py:78-87) -- the default VQ-VAE reconstruction loss.
- unit_gaussian_log_prob: N(y, 1) log-prob (reference: distlib.py:98-100).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..registry import DISTRIBUTIONS

_HALF_LOG_2PI = 0.9189385332046727


@DISTRIBUTIONS.register(name="BinomialDistribution")
class BinomialDistribution:
    def log_prob(self, x, y, eps: float = 1e-6):
        k = jnp.round(x * 255.0)
        y = jnp.clip(y, eps, 1.0 - eps)
        log_comb = (
            gammaln(256.0) - gammaln(k + 1.0) - gammaln(256.0 - k)
        )
        return log_comb + k * jnp.log(y) + (255.0 - k) * jnp.log1p(-y)


@DISTRIBUTIONS.register(name="UnitGaussianDistribution")
class UnitGaussianDistribution:
    def log_prob(self, x, y):
        return -0.5 * (x - y) ** 2 - _HALF_LOG_2PI
