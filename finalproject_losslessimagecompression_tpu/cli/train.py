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


def apply_overrides(config: dict, sets) -> dict:
    """Apply `--set dotted.path=value` overrides in place.

    Values parse as YAML scalars (`5000` -> int, `true` -> bool, quoted
    strings stay strings).  Intermediate dicts are created as needed, so a
    path can introduce a new key; a path through a non-dict raises."""
    for item in sets or ():
        key, sep, raw = item.partition("=")
        if not sep:
            raise SystemExit(f"--set expects dotted.path=value, got {item!r}")
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise SystemExit(
                    f"--set {key}: {p!r} is a {type(nxt).__name__}, "
                    "not a mapping"
                )
            node = nxt
        value = yaml.safe_load(raw)
        if isinstance(value, str):
            # YAML 1.1 only floats `1.0e-4`, not `1e-4`; accept the
            # common scientific form too
            try:
                value = float(value)
            except ValueError:
                pass
        node[parts[-1]] = value
    return config


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
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument(
        "--distributed", action="store_true",
        help="initialize the jax.distributed multi-host runtime before "
        "building the trainer (also enabled by LIC_DISTRIBUTED=1); "
        "coordinator address/process ids come from the standard JAX env "
        "vars. Pair with `shard: true` on the dataloaders so each host "
        "draws a disjoint slice of every epoch.",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override a config entry by dotted path, e.g. "
        "--set train.max_step=5000 --set train.save_path=./logs/x.ckpt; "
        "values parse as YAML scalars. Repeatable.",
    )
    args = ap.parse_args(argv)
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()  # training restarts skip remote recompiles
    if args.distributed or os.environ.get("LIC_DISTRIBUTED", "") == "1":
        from ..parallel.mesh import init_distributed

        init_distributed()
        import jax

        print(
            f"jax.distributed: process {jax.process_index()} of "
            f"{jax.process_count()}, {len(jax.local_devices())} local / "
            f"{len(jax.devices())} global devices"
        )
    config = apply_overrides(load_config(args.config), args.set)
    print(yaml.dump(config))
    t = build_trainer(config)
    t.train()


if __name__ == "__main__":
    main()
