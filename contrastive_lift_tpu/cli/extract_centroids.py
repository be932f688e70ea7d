"""Centroid-extraction CLI (reference: inference/extract_train_centroids.py:33-148).

Clusters train-view embeddings segmentwise and pickles {thing_class: centroids}
to all_centroids.pkl for reuse by the render CLI (--cached_centroids_path).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ..config import Config, load_config
from ..data import load_scene
from ..inference.calibrate import extract_train_centroids
from ..inference.render import load_model_for_inference


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--bandwidth", type=float, default=0.15)
    parser.add_argument("--cluster_size", type=int, default=500)
    parser.add_argument("--use_dbscan", action="store_true")
    parser.add_argument("--use_silverman", action="store_true")
    parser.add_argument("--subsample", type=int, default=1)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[128, 128])
    parser.add_argument("--output_path", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=8192)
    args = parser.parse_args(argv)

    ckpt = Path(args.ckpt_path)
    cfg_path = ckpt.parents[1] / "config.json"
    cfg = load_config(cfg_path) if cfg_path.exists() else Config()
    cfg.subsample_frames = args.subsample
    cfg.image_dim = tuple(args.image_dim)

    scene = load_scene(cfg, load_val=False)
    params, mcfg, rcfg, state_r, _ = load_model_for_inference(
        ckpt, cfg, scene.num_semantic_classes, white_bg=scene.white_bg)
    output_path = (Path(args.output_path) if args.output_path
                   else ckpt.parent / "all_centroids.pkl")
    centroids = extract_train_centroids(
        params, mcfg, rcfg, state_r, cfg, scene.train_frames,
        scene.segmentation.fg_classes, bandwidth=args.bandwidth,
        use_dbscan=args.use_dbscan, use_silverman=args.use_silverman,
        cluster_size=args.cluster_size, chunk=args.chunk,
        output_path=output_path)
    print(f"wrote {output_path}: "
          + ", ".join(f"class {k}: {len(v)} centroids" for k, v in centroids.items()))


if __name__ == "__main__":
    main()
