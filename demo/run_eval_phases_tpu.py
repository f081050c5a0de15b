"""One hardware-recorded Trainer eval with the VALUE-FENCED phase timers
(VERDICT r4 item 5, closing half): Trainer.evaluate's forward phase now
fences with utils/profiling.value_fence instead of the
block_until_ready primitive this repo proved untrustworthy on the tunnel
runtime; this records one real-TPU eval so the logged
forward_time/coding_time are demonstrably trustworthy numbers.

Usage:  python demo/run_eval_phases_tpu.py \
            [--config configs/synthetic64.yaml]
            [--ckpt logs/synthetic64_r04.ckpt]
            [--out results/eval_phases_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic64.yaml")
    ap.add_argument("--ckpt", default="logs/synthetic64_r04.ckpt")
    ap.add_argument("--out", default="results/eval_phases_r05.json")
    ap.add_argument("--batches", type=int, default=2)
    args = ap.parse_args()

    import jax

    from finalproject_losslessimagecompression_tpu.utils.profiling import (
        enable_compile_cache,
    )

    enable_compile_cache()
    from finalproject_losslessimagecompression_tpu.cli.train import (
        build_trainer,
        load_config,
    )

    cfg = load_config(os.path.join(ROOT, args.config))
    t = cfg["train"]
    t["model"] = dict(t["model"], load_path=os.path.join(ROOT, args.ckpt))
    t["max_eval_batches"] = args.batches
    trainer = build_trainer(cfg)
    ev = trainer.evaluate()
    out = {
        "what": "one real-TPU Trainer.evaluate with value-fenced phase "
                "timers (the forward phase previously used "
                "block_until_ready, which returns early on this tunnel "
                "runtime -- docs/DESIGN.md section 7)",
        "hardware": jax.devices()[0].device_kind,
        "config": args.config,
        "ckpt": os.path.basename(args.ckpt),
        "eval": {k: v for k, v in ev.items()},
    }
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
