"""Tracing / profiling utilities.

The reference's only instrumentation is manual time.time() spans printed in
the eval loop (reference: trainer.py:253-331, rans/test.py:15-27).  Here:
- `phase(name)`: accumulating wall-clock spans with a report, usable around
  any host-side region (forward vs encode vs decode, like the reference's
  forward_time / rans_en_time / rans_de_time breakdown);
- `device_trace(logdir)`: a jax.profiler trace context producing
  TensorBoard-compatible device profiles (XLA op-level timeline) -- the
  TPU-native replacement for print-timing device work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


def value_fence(x):
    """Trustworthy device sync: fetch one element's VALUE from the last
    leaf of `x`.  On the tunnel runtime `jax.block_until_ready` has been
    observed to return before remote execution completes (the r3 roofline
    artifact: a broken fence "timed" a 20.7-TFLOP program at 5.6x the
    chip's physical peak); a value fetch cannot return early, because the
    bytes must exist to be returned.  This is the ONE fence every timed
    region in the repo must use (bench.py, Trainer.evaluate, the roofline
    scripts).

    CAVEAT: the ravel/slice here are eager ops that pay a one-time
    per-shape REMOTE COMPILE (seconds) on first use -- call value_fence
    once on same-shaped data BEFORE any timed region, or the first window
    absorbs a compile."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return jax.device_get(jnp.ravel(leaves[-1])[:1])


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {v['total_s']:.3f}s/{v['count']}"
            for k, v in sorted(self.report().items())
        )


def compiled_flops(jitted, *args, **kwargs):
    """Total FLOPs of one call of a jitted function, from XLA's own cost
    analysis of the compiled executable (fwd + bwd + optimizer, everything
    in the program).  Args may be concrete arrays or ShapeDtypeStructs;
    they are abstracted so donated buffers are never touched.  Returns
    None when the backend exposes no cost model."""
    import jax

    try:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), (args, kwargs)
        )
        a_args, a_kwargs = abstract
        ca = jitted.lower(*a_args, **a_kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


# dense matmul peak per CHIP, bf16 inputs / f32 accumulate (the MXU's
# native mode and the standard MFU denominator), from the public TPU
# system specs.  device_kind strings follow jax's libtpu naming.
_PEAK_TFLOPS_BF16 = (
    ("v6e", 918.0), ("v6 lite", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def device_peak_tflops() -> float | None:
    """bf16 matmul peak of the current chip (None off-TPU / unknown kind)."""
    import jax

    try:
        d = jax.devices()[0]
        if d.platform != "tpu":
            return None
        kind = d.device_kind.lower()
    except Exception:
        return None
    for key, peak in _PEAK_TFLOPS_BF16:
        if key in kind:
            return peak
    return None


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache (idempotent).  Remote-compile
    environments pay minutes for the big fused programs; the cache makes
    every run after the first pay only dispatch.  Default location:
    <repo>/.jax_cache, overridable via JAX_COMPILATION_CACHE_DIR."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass
