"""One-shot converter: reference distilled-feature dumps (.pt) -> .npy.

The PanopLi scenes ship 64-d distilled feature targets as torch pickles
(features/<name>.pt, reference dataset/panopli.py). TPU hosts shouldn't need
torch at data-loading time, so the reader (data/panopli.py) prefers a
sibling .npy; run this once per scene on any machine with torch installed.

Usage: python tools/convert_features.py <scene_root> [<scene_root> ...]
"""
import sys
from pathlib import Path

import numpy as np


def convert_scene(root: Path) -> int:
    import torch
    n = 0
    for sub in ("features", "features_bilinear"):
        d = root / sub
        if not d.is_dir():
            continue
        for pt in sorted(d.glob("*.pt")):
            out = pt.with_suffix(".npy")
            if out.exists():
                continue
            arr = torch.load(pt, map_location="cpu",
                             weights_only=True).numpy().astype(np.float32)
            np.save(out, arr)
            n += 1
    return n


def main():
    total = 0
    for arg in sys.argv[1:]:
        total += convert_scene(Path(arg))
    print(f"converted {total} feature files")


if __name__ == "__main__":
    main()
