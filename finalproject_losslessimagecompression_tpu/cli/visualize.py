"""Visualization: sampling grids and latent-space interpolation.

Equivalent of the reference CLI (reference: visualization.py:19-128):
- Sample: latent-shaped discretized-logistic noise at several temperatures
  -> sample_from_noise -> PNG grids (visualization.py:19-43).
- Interpolate: encode 4 corner images, normalize latents
  ((z - mean)/scale), bilinearly mix an NxN grid in latent space, decode
  through the prior-affine sampling path (visualization.py:46-96).

Usage: python -m finalproject_losslessimagecompression_tpu.cli.visualize
           --config <yaml>  [--mode sample|interpolate|both]
Config shape mirrors the reference vis configs (configs/vis_config1.yaml):
train.model (with load_path), train.test_dataloader, output dir.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..data.loader import DataLoader  # noqa: F401 (registers loaders)
from ..models.config import FlowCfg, latent_shapes
from ..models.idflow import IDFlow
from ..ops.dlogistic import dlogistic_sample
from ..registry import DATALOADERS, build
from ..train.checkpoint import load_raw, restore_into
from ..train.metrics import MetricsWriter


def load_model(model_cfg: dict):
    model_cfg = dict(model_cfg)
    load_path = model_cfg.pop("load_path", None)
    cfg = FlowCfg.from_ref(model_cfg)
    model = IDFlow(cfg)
    init_x = jnp.zeros((1, cfg.H, cfg.W, cfg.C), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)
    if load_path:
        # restore_into adapts checkpoints written by the other DenseLayer
        # compute variant (fuse_1x1 on/off; exact rename, checkpoint.py);
        # device_put once -- numpy params re-upload on every jitted call
        params = jax.device_put(
            restore_into(params, load_raw(load_path)["params"])
        )
    return cfg, model, params


def sample(cfg, model, params, writer, batch=16,
           temperatures=(0.25, 0.5, 0.75, 1.0), seed=0):
    key = jax.random.PRNGKey(seed)
    noises = []
    for s in latent_shapes(cfg):
        key, k = jax.random.split(key)
        noises.append(
            dlogistic_sample(k, jnp.zeros((batch,) + s),
                             jnp.zeros((batch,) + s), cfg.nbits)
        )
    # jitted: eager apply pays one tunnel RT per conv on remote runtimes
    gen = jax.jit(lambda p, ns: model.apply(
        p, ns, method=IDFlow.sample_from_noise))
    for t in temperatures:
        img = gen(params, [n * t for n in noises])
        writer.add_image_grid(f"sample_t{t}", np.asarray(img), 0)


def interpolate(cfg, model, params, writer, corners, grid=8):
    """corners: [4, H, W, C] grid images (TL, TR, BL, BR)."""
    latents, means, logscales = model.apply(params, jnp.asarray(corners))
    normed = [
        (z - m) / jnp.exp(ls) for z, m, ls in zip(latents, means, logscales)
    ]
    rows = []
    for i in range(grid):
        a = i / (grid - 1)
        cols = []
        for j in range(grid):
            b = j / (grid - 1)
            mixed = [
                (1 - a) * (1 - b) * z[0]
                + (1 - a) * b * z[1]
                + a * (1 - b) * z[2]
                + a * b * z[3]
                for z in normed
            ]
            cols.append([m[None] for m in mixed])
        rows.append(cols)
    gen = jax.jit(lambda p, ns: model.apply(
        p, ns, method=IDFlow.sample_from_noise))
    imgs = []
    for i in range(grid):
        for j in range(grid):
            img = gen(params, rows[i][j])
            imgs.append(np.asarray(img)[0])
    writer.add_image_grid("interpolate", np.stack(imgs), 0, nrow=grid)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--mode", default="sample",
                    choices=["sample", "interpolate", "both"])
    ap.add_argument("--out", default="./vis_out")
    args = ap.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    tc = config["train"]
    cfg, model, params = load_model(tc["model"])
    writer = MetricsWriter(args.out, use_tensorboard=False)
    if args.mode in ("sample", "both"):
        sample(cfg, model, params, writer)
        print(f"sample grids written under {args.out}/images")
    if args.mode in ("interpolate", "both"):
        loader = build(DATALOADERS, dict(tc["test_dataloader"]))
        batch = next(iter(loader))
        corners = batch[:4]
        if corners.shape[0] < 4:
            corners = np.tile(corners, (4, 1, 1, 1))[:4]
        interpolate(cfg, model, params, writer, corners)
        print(f"interpolation grid written under {args.out}/images")


if __name__ == "__main__":
    main()
