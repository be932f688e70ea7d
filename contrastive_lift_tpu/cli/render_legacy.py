"""Legacy render CLI: argmax-channel instance ids, no clustering.

For linear-assignment models whose instance head emits per-channel logits
(reference: inference/render_panopli_original.py:23-118). Also supports
rendering a novel-view trajectory instead of the test split.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..config import Config, load_config
from ..data import load_scene
from ..inference.render import load_model_for_inference, render_frames
from ..utils.viz import save_image, visualize_panoptic_outputs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[256, 384])
    parser.add_argument("--subsample", type=int, default=1)
    parser.add_argument("--render_trajectory", action="store_true")
    parser.add_argument("--trajectory_path", type=str, default=None,
                        help="pickled cam2world list; default: spherical orbit")
    parser.add_argument("--trajectory_frames", type=int, default=60)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=8192)
    args = parser.parse_args(argv)

    ckpt = Path(args.ckpt_path)
    cfg_path = ckpt.parents[1] / "config.json"
    cfg = load_config(cfg_path) if cfg_path.exists() else Config()
    cfg.subsample_frames = args.subsample
    cfg.image_dim = tuple(args.image_dim)

    scene = load_scene(cfg, load_train=False)
    params, mcfg, rcfg, state_r, _ = load_model_for_inference(
        ckpt, cfg, scene.num_semantic_classes, white_bg=scene.white_bg)

    if args.render_trajectory:
        from ..data.trajectory import (load_trajectory, rays_for_poses,
                                       spherical_orbit)
        intr = scene.val_frames[0].intrinsics
        if args.trajectory_path:
            frames = load_trajectory(args.trajectory_path, intr, cfg.image_dim)
        else:
            frames = rays_for_poses(
                spherical_orbit(args.trajectory_frames), intr, cfg.image_dim)
        tag = "trajectory"
    else:
        frames = scene.val_frames
        tag = "test"

    output_dir = (Path(args.output_dir) if args.output_dir else
                  Path("runs") / f"{Path(cfg.dataset_root).stem}_{tag}_{cfg.experiment}_original")
    for sub in ("vis", "pred_semantics", "pred_surrogateid"):
        (output_dir / sub).mkdir(parents=True, exist_ok=True)

    per_frame = render_frames(params, mcfg, rcfg, state_r, frames, args.chunk)
    h, w = cfg.image_dim
    from PIL import Image
    for i, frame in enumerate(frames):
        out = per_frame[i]
        sem = out["semantics"].argmax(-1).reshape(h, w)
        inst_logits = out["instances"][:, :cfg.max_instances]  # fast half
        inst = inst_logits.argmax(-1).reshape(h, w)
        name = f"{frame.name}.png"
        Image.fromarray(sem.astype(np.uint8)).save(
            output_dir / "pred_semantics" / name)
        Image.fromarray(inst.astype(np.uint16)).save(
            output_dir / "pred_surrogateid" / name)
        onehot = np.eye(int(inst.max()) + 1, dtype=np.float32)[inst.reshape(-1)]
        grid = visualize_panoptic_outputs(
            out["rgb"], out["semantics"], onehot, out["depth"], None, None,
            None, h, w, thing_classes=scene.segmentation.fg_classes,
            visualize_entropy=False)
        save_image(output_dir / "vis" / name, grid)
    print(json.dumps({"num_frames": len(frames), "output_dir": str(output_dir)}))


if __name__ == "__main__":
    main()
