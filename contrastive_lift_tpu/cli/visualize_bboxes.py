"""BBox visualization CLI: per-instance 3D boxes from rendered surface points.

Reference: inference/visualize_bboxes.py:52-259 + mbr.py. Renders the test
split, back-projects depth into world points labeled by clustered instance
ids, fits boxes (aabb/pca/ellipsoid/mbr), and writes an OBJ point cloud +
boxes.json.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..config import Config, load_config
from ..data import load_scene
from ..inference.bboxes import instance_bounding_boxes
from ..inference.cluster import cluster, create_instances_from_semantics
from ..inference.render import load_model_for_inference, render_frames
from ..utils.colors import DistinctColors
from ..utils.points import save_obj_points


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--method", choices=["aabb", "pca", "ellipsoid", "mbr"],
                        default="mbr")
    parser.add_argument("--bandwidth", type=float, default=0.15)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[128, 128])
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=8192)
    args = parser.parse_args(argv)

    ckpt = Path(args.ckpt_path)
    cfg_path = ckpt.parents[1] / "config.json"
    cfg = load_config(cfg_path) if cfg_path.exists() else Config()
    cfg.image_dim = tuple(args.image_dim)
    scene = load_scene(cfg, load_train=False)
    frames = scene.val_frames
    params, mcfg, rcfg, state_r, _ = load_model_for_inference(
        ckpt, cfg, scene.num_semantic_classes, white_bg=scene.white_bg)

    per_frame = render_frames(params, mcfg, rcfg, state_r, frames, args.chunk)
    sem_cat = np.concatenate([f["semantics"] for f in per_frame])
    inst_cat = np.concatenate([f["instances"] for f in per_frame])
    if mcfg.slow_fast_mode:
        inst_cat = inst_cat[:, :cfg.max_instances]
    thing_feats = create_instances_from_semantics(
        inst_cat, sem_cat, scene.segmentation.fg_classes)
    onehot = cluster(thing_feats, args.bandwidth, num_images=len(frames))
    labels = np.asarray(onehot).argmax(-1).reshape(-1)

    # back-project rendered depth into world surface points
    pts, ids = [], []
    for i, frame in enumerate(frames):
        o, d = frame.rays[:, :3], frame.rays[:, 3:6]
        depth = per_frame[i]["depth"]
        surf = o + depth[:, None] * d
        pts.append(surf)
        ids.append(np.asarray(onehot[i]).argmax(-1))
    points = np.concatenate(pts)
    inst_ids = np.concatenate(ids)

    boxes = instance_bounding_boxes(points, inst_ids, method=args.method)
    output_dir = Path(args.output_dir or
                      Path("runs") / f"{Path(cfg.dataset_root).stem}_bboxes")
    output_dir.mkdir(parents=True, exist_ok=True)
    dc = DistinctColors()
    save_obj_points(output_dir / "points.obj", points, dc.apply(inst_ids))
    (output_dir / "boxes.json").write_text(json.dumps(
        {str(k): {kk: np.asarray(vv).tolist() for kk, vv in v.items()}
         for k, v in boxes.items()}, indent=2))
    print(f"{len(boxes)} boxes -> {output_dir}")


if __name__ == "__main__":
    main()
