"""Test harness config: run everything on a virtual 8-device CPU mesh.

Real-TPU behaviour is exercised by bench.py / the driver; unit tests must be
hermetic and CPU-runnable (SURVEY.md section 4 implication).  Set
LIC_TEST_TPU=1 to keep the real accelerator instead -- that is how the
hardware-only suites (tests/test_pallas.py) run on the chip:
    LIC_TEST_TPU=1 python -m pytest tests/test_pallas.py -q
"""

import os

if os.environ.get("LIC_TEST_TPU", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides
else:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
