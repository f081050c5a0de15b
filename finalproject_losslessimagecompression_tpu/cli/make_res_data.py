"""Dump VQ-VAE residual datasets to npz (a working version of the
reference's dead stub, reference: make_res_data.py:16-34 -- it builds a
model then ends).

For each batch of the configured dataloader: reconstruct with the frozen
VQ-VAE checkpoint, grid-round, and store (residual, reconstruction) pairs
-- the offline form of ResidualTrainer's per-step pipeline
(trainer.py:603-611), useful for training residual flows without paying
VQ-VAE inference per step.

Usage: python -m finalproject_losslessimagecompression_tpu.cli.make_res_data
           --config <residual-yaml> --out res_data.npz [--max-batches N]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..data.loader import DataLoader  # noqa: F401
from ..models.vqvae import VQVAE, build_vqvae_from_ref
from ..ops.rounding import round_to_grid
from ..registry import DATALOADERS, build
from ..train.checkpoint import load_raw


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-batches", type=int, default=0)
    ap.add_argument("--split", default="test_dataloader",
                    choices=["train_dataloader", "test_dataloader"])
    args = ap.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    tc = config["train"]
    vq_cfg = dict(tc["vqvae"])
    ckpt = vq_cfg.pop("checkpoint")
    vqvae = build_vqvae_from_ref(vq_cfg)
    params = load_raw(ckpt)["params"]
    loader = build(DATALOADERS, dict(tc[args.split]))

    @jax.jit
    def recon(p, batch):
        rec = vqvae.apply(p, (batch - 0.5) / 0.5, method=VQVAE.reconstruct)
        rec = round_to_grid(rec * 0.5 + 0.5, 8)
        return rec, batch - rec

    residuals, recs = [], []
    for i, batch in enumerate(iter(loader)):
        rec, res = recon(params, jnp.asarray(batch))
        residuals.append(np.asarray(res))
        recs.append(np.asarray(rec))
        if args.max_batches and i + 1 >= args.max_batches:
            break
    np.savez_compressed(
        args.out,
        residual=np.concatenate(residuals),
        reconstruction=np.concatenate(recs),
    )
    print(f"wrote {args.out}: residual {np.concatenate(residuals).shape}")


if __name__ == "__main__":
    main()
