"""Training entry point: `python -m finalproject_losslessimagecompression_tpu.cli.train --config <yaml>`.

Mirrors the reference CLI contract (reference: train.py:25-42): one --config
YAML whose `train` subtree selects a trainer by name (`train.trainer`,
default Trainer) and passes the rest as constructor kwargs.
"""

from __future__ import annotations

import argparse

import yaml

from ..registry import TRAINERS
from ..train import trainer as _trainer  # noqa: F401 (registers Trainer)


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def build_trainer(config: dict):
    train_cfg = dict(config["train"])
    name = train_cfg.pop("trainer", "Trainer")
    # late imports so every trainer is registered
    for mod in (
        "finetuner",
        "residual_trainer",
        "twolevel_trainer",
        "vqvae_trainer",
    ):
        try:
            __import__(
                f"finalproject_losslessimagecompression_tpu.train.{mod}"
            )
        except ImportError:
            pass

    return TRAINERS.get(name)(**train_cfg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    args = ap.parse_args(argv)
    config = load_config(args.config)
    print(yaml.dump(config))
    t = build_trainer(config)
    t.train()


if __name__ == "__main__":
    main()
