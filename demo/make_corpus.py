"""Generate the demo corpora for the file-codec demo (run_filecodec_demo.py).

Three corpora:
  demo/corpus/          -- structured out-of-domain images (committed in r3):
                           gradients/shapes the model never trained on; the
                           demo records the honest generalization loss there.
  demo/corpus_indomain/ -- held-out SyntheticImages (the training family of
                           configs/synthetic64.yaml, data/datasets.py:120)
                           at several sizes exercising native dims, tiling
                           multiples, and non-divisible padding.  A model
                           trained on that family should BEAT PNG here, as
                           it does on the eval split (results/
                           synthetic64_metrics.jsonl: test bpd 5.65 vs PNG
                           ~6.5).
  demo/corpus_natural/  -- held-out NaturalSynthetic images (1/f-spectrum
                           + edges + textures, the training family of
                           configs/natural64.yaml) at the same size grid;
                           the natural-statistics generalization corpus
                           VERDICT r4 item 8 asked for.

Deterministic: seeds are fixed and disjoint from the train (seed 1) and
eval (seed 0) splits.
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from finalproject_losslessimagecompression_tpu.data.datasets import (  # noqa: E402
    NaturalSynthetic,
    SyntheticImages,
)

# (filename, (H, W)): native model dims, multiples (tiling), and
# non-divisible sizes (pad path)
_SIZES = [
    ("img_64x64_a.png", (64, 64)),
    ("img_64x64_b.png", (64, 64)),
    ("img_128x128.png", (128, 128)),
    ("img_64x192.png", (64, 192)),
    ("img_80x100.png", (80, 100)),
    ("img_29x37.png", (29, 37)),
]

_HELDOUT_SEED = 7  # train = 1, eval = 0 (configs/synthetic64.yaml)


def _write(ds_cls, outdir: str, **ds_kw) -> None:
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    for i, (name, (h, w)) in enumerate(_SIZES):
        ds = ds_cls(size=(h, w, 3), length=i + 1, seed=_HELDOUT_SEED,
                    **ds_kw)
        img = ds[i]  # item index varies the per-image stream too
        # uint8 v such that the CLI's v/256 mapping (cli/codec.py) lands on
        # the SAME 1/256-grid values the training loader produced
        # (round(img*256)/256, data/loader.py:_round_grid); only the
        # saturated 256 bin clips to 255
        arr = np.clip(np.round(img * 256.0), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(outdir, name), optimize=True)
        print(f"wrote {os.path.basename(outdir)}/{name} ({h}x{w})")


def main(outdir: str | None = None) -> None:
    if outdir:
        _write(SyntheticImages, outdir)
        return
    _write(SyntheticImages, os.path.join(ROOT, "demo", "corpus_indomain"))
    _write(NaturalSynthetic, os.path.join(ROOT, "demo", "corpus_natural"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
