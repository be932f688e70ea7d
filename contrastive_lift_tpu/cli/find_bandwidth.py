"""Bandwidth-sweep CLI (reference: inference/find_bandwidth.py:34-244)."""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..config import Config, load_config
from ..data import load_scene
from ..inference.calibrate import find_bandwidth
from ..inference.render import load_model_for_inference


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--use_dbscan", action="store_true")
    parser.add_argument("--segmentwise", action="store_true")
    parser.add_argument("--subsample", type=int, default=1)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[128, 128])
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=8192)
    args = parser.parse_args(argv)

    ckpt = Path(args.ckpt_path)
    cfg_path = ckpt.parents[1] / "config.json"
    cfg = load_config(cfg_path) if cfg_path.exists() else Config()
    cfg.subsample_frames = args.subsample
    cfg.image_dim = tuple(args.image_dim)

    # calibration runs on TRAIN views against pseudo-labels, never GT
    scene = load_scene(cfg, load_val=False)
    params, mcfg, rcfg, state_r, _ = load_model_for_inference(
        ckpt, cfg, scene.num_semantic_classes, white_bg=scene.white_bg)
    output_dir = (Path(args.output_dir) if args.output_dir else
                  Path("runs") / f"{Path(cfg.dataset_root).stem}_bandwidth_{cfg.experiment}")
    result = find_bandwidth(
        params, mcfg, rcfg, state_r, cfg, scene.train_frames,
        scene.segmentation.fg_classes, use_dbscan=args.use_dbscan,
        segmentwise=args.segmentwise, chunk=args.chunk, output_dir=output_dir)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}, indent=2))


if __name__ == "__main__":
    main()
