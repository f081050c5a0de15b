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


def test_overhead_efficiency_at_8_devices():
    """OVERHEAD-MODE PROXY for the BASELINE.md >=85% scaling north star --
    NOT the north star itself.  The real target is weak scaling (fixed
    per-device batch) across physical chips over ICI, which is UNMEASURED
    in this environment (single chip; cli/scaling.py stamps the artifact
    with `weak_scaling_on_hardware: unmeasured` accordingly).  What a
    virtual CPU mesh -- 8 "devices" timesharing 2 physical cores, weak
    scaling hardware-capped at cores/N -- CAN measure honestly is
    `overhead` mode: fixed total compute, growing mesh; efficiency is what
    survives partitioning + XLA collectives.  Best-of-2 repetitions damps
    scheduler noise on the shared host."""
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
        H=32, W=32, C=3, nflows=4, nsplit=2,
        couple=CouplingCfg(0.75, DenseBlockCfg(32, 2, "ReLU")),
        prior_nn=DenseBlockCfg(32, 2, "ReLU"),
    )
    model = IDFlow(cfg)
    best = 0.0
    for _ in range(2):
        res = measure_scaling(model, per_device_batch=2, steps=10,
                              device_counts=[1, 8], mode="overhead")
        best = max(best, res[8]["efficiency"])
        if best >= 0.85:
            break
    assert best >= 0.85, f"8-device overhead efficiency {best:.3f} < 0.85"
