"""Diagnose the raw-PQ^scene=0 failure on the synthetic e2e fixture.

Renders one train frame and one val frame from a trained e2e checkpoint and
splits the error by GT region (floor / thing / sky): if the val floor pixels
composite thing-class semantics with shallow depth, the field has memorized
the train views as a light field (fog), which the distortion regularizer
(reference: panopli_tensoRF_renderer.py:101 + lambda ramp
train_panopli_tensorf.py:447) exists to prevent.

Usage: JAX_PLATFORMS=cpu python tools/diag_valgap.py --ckpt .../final.npz \
    --image_dim 64 96 --checker_freq 18
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def region_stats(frame, out):
    gt_sem = frame.gt_semantics
    sem_pred = np.asarray(out["semantics"]).argmax(-1)
    rgb = np.asarray(out["rgb"])
    depth = np.asarray(out["depth"])
    mask = frame.mask
    rows = {}
    for name, region in [("floor", mask & (gt_sem == 0)),
                         ("thing", mask & (gt_sem > 0)),
                         ("sky", ~mask)]:
        if not region.any():
            continue
        rows[name] = {
            "n": int(region.sum()),
            "sem_err": round(float((sem_pred[region] != gt_sem[region]).mean()), 4),
            "rgb_mae": round(float(np.abs(rgb[region] - frame.rgbs[region]).mean()), 4),
            "depth_mae": round(float(np.abs(depth[region] - frame.depth[region]).mean()), 4),
        }
    mse = float(((rgb - frame.rgbs) ** 2)[mask].mean())
    rows["psnr_masked"] = round(-10 * np.log10(max(mse, 1e-12)), 2)
    return rows


def main():
    from contrastive_lift_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--image_dim", type=int, nargs=2, default=[48, 64])
    ap.add_argument("--checker_freq", type=float, default=40.0)
    ap.add_argument("--num_train", type=int, default=24)
    ap.add_argument("--step_ratio", type=float, default=0.5,
                    help="0.5 = train-time sample count (cheap CPU probe)")
    args = ap.parse_args()

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.inference.render import (
        load_model_for_inference, render_frames)

    scene = make_synthetic_scene(num_spheres=5, num_train=args.num_train,
                                 num_val=4, image_dim=tuple(args.image_dim),
                                 num_thing_classes=1, seed=7,
                                 checker_freq=args.checker_freq)
    cfg = Config(
        instance_loss_mode="slow_fast", use_DINO_style=True, use_proj=False,
        use_delta=False, temperature=100.0, max_instances=3,
        use_mlp_for_semantics=True, use_mlp_for_instances=True,
        pe_sem=0, pe_ins=0, semantic_weight_mode="softmax",
        probabilistic_ce_mode="NoTTAConf", image_dim=tuple(args.image_dim),
        weight_class_0=1.0,
    ).resolve_epochs()
    params, mcfg, rcfg, state_r, _ = load_model_for_inference(
        args.ckpt, cfg, scene.segmentation.num_semantic_classes,
        step_ratio=args.step_ratio)

    frames = [scene.train_frames[0], scene.val_frames[0]]
    outs = render_frames(params, mcfg, rcfg, state_r, frames, chunk=4096)
    for name, frame, out in zip(["train0", "val0"], frames, outs):
        print(json.dumps({name: region_stats(frame, out)}), flush=True)


if __name__ == "__main__":
    main()
