"""Test harness config: run everything on a virtual 8-device CPU mesh.

Real-TPU behaviour is exercised by bench.py / the driver; unit tests must be
hermetic and CPU-runnable (SURVEY.md section 4 implication).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
