"""Scaling harness + profiling utilities on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_scaling_harness_runs():
    from finalproject_losslessimagecompression_tpu.models import (
        CouplingCfg,
        DenseBlockCfg,
        FlowCfg,
        IDFlow,
    )
    from finalproject_losslessimagecompression_tpu.parallel.scaling import (
        measure_scaling,
    )

    cfg = FlowCfg(
        H=8, W=8, C=3, nflows=1, nsplit=1,
        couple=CouplingCfg(0.75, DenseBlockCfg(8, 1, "ReLU")),
        prior_nn=DenseBlockCfg(8, 1, "ReLU"),
    )
    res = measure_scaling(IDFlow(cfg), per_device_batch=1, steps=2,
                          device_counts=[1, 4, 8])
    assert set(res) == {1, 4, 8}
    for nd, r in res.items():
        assert r["images_per_s"] > 0
        assert r["efficiency"] > 0


def test_phase_timer():
    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        PhaseTimer,
    )

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert "a:" in t.summary()
