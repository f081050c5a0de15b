"""TPU-native lossless image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lym01803/FinalProject-LosslessImageCompression (integer discrete flows +
discretized-logistic likelihood + rANS entropy coding, VQ-VAE residual
pipeline, conditional and two-level flows), built TPU-first:

- NHWC layouts, MXU-friendly convolutions, XLA-fused elementwise math.
- A vectorized interleaved rANS codec (many independent streams advanced in
  lockstep on the VPU) replacing the reference's serial Cython coder
  (reference: rans/rans.pyx), with a C++ native host codec for CPU-side IO.
- Exact integer-grid invertibility contracts tested at every layer.
- Multi-chip scale-out over a `jax.sharding.Mesh` (data x tile axes) with
  XLA collectives; per-image rANS streams stay chip-local for determinism.

Package layout:
    ops/        rounding, discretized logistic, space-to-depth, patching
    codec/      quantized CDF, rANS oracle + vectorized JAX codec, containers
    native/     C++ interleaved rANS (ctypes bindings)
    models/     flow layers, IDFlow, ConditionalFlow, TwoLevelFlow, VQ-VAE
    data/       datasets + loaders (ImageFolder, ImageNet64 npz, synthetic)
    train/      trainers, optimizers/schedules, checkpointing, metrics
    parallel/   mesh construction, sharded train/eval steps, collectives
    cli/        train / visualize / baselines entry points
"""

__version__ = "0.1.0"
