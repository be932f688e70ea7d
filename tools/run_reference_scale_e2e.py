"""Reference-scale end-to-end run on the real TPU: full lifecycle + PQ.

Trains the flagship slow-fast configuration on the synthetic multi-object
scene at reference-like scale — 2048-ray batches, 64->128 grid upscales,
bbox reset, all three phase gates at the reference-relative schedule — then
renders the test split at inference settings (2x samples, fast path),
clusters the embeddings, and reports PQ^scene — both raw-vs-GT and with the
reference's validation-time label masking (train_panopli_tensorf.py:375).
Writes per-epoch metrics and the final summary as JSON lines.

Expectation management: at these short budgets (~360-1400 steps vs the
reference's ~100k) the raw semantics plateau on the synthetic fixture (its
x40 checker texture aliases at 48x64, capping floor geometry around PSNR
17), so raw pq_scene stays low while the masked metrics climb — the run
demonstrates the full LIFECYCLE (upscales, bbox reset, phase gates, fast
inference, clustering) at reference batch sizes on one chip, not converged
paper-level accuracy.

Usage: python tools/run_reference_scale_e2e.py [--epochs 8] [--out DIR]
"""
import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from contrastive_lift_tpu.utils.platform import honor_platform_env
    honor_platform_env()  # JAX_PLATFORMS=cpu must beat the axon default
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[48, 64])
    parser.add_argument("--num_train", type=int, default=24)
    parser.add_argument("--max_grid", type=int, default=128,
                        help="final grid resolution (192 = the bench.py "
                             "inference operating point)")
    parser.add_argument("--checker_freq", type=float, default=40.0,
                        help="synthetic texture frequency; 40 aliases at the "
                             "48x64 default (semantics plateau, raw "
                             "pq_scene = 0) — pass ~18 with --image_dim "
                             "64 96 for a fixture whose raw PQ^scene is "
                             "non-zero (VERDICT r4 #5)")
    parser.add_argument("--dist_reg", type=float, default=0.005,
                        help="lambda_dist_reg (reference default 0.005, "
                             "panopli_paper.yaml:32, ramped per epoch). The "
                             "r4/r5a runs trained with 0.0 and collapsed to a "
                             "view-memorizing light field: floor depth wrong "
                             "even on TRAIN views, floor semantics ~70%% "
                             "wrong (appearance memorizes via viewdirs, "
                             "semantics cannot) -> raw PQ^scene = 0 "
                             "(tools/diag_valgap.py evidence)")
    args = parser.parse_args()

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.inference.cluster import (
        cluster, create_instances_from_semantics)
    from contrastive_lift_tpu.inference.render import render_frames
    from contrastive_lift_tpu.metrics.panoptic_quality import panoptic_quality
    from contrastive_lift_tpu.train.loop import Trainer

    scene = make_synthetic_scene(num_spheres=5, num_train=args.num_train,
                                 num_val=4, image_dim=tuple(args.image_dim),
                                 num_thing_classes=1, seed=7,
                                 checker_freq=args.checker_freq)
    cfg = Config(
        # flagship model (configs/contrastive_lift.yaml)
        instance_loss_mode="slow_fast", use_DINO_style=True, use_proj=False,
        use_delta=False, temperature=100.0, max_instances=3,
        use_mlp_for_semantics=True, use_mlp_for_instances=True,
        pe_sem=0, pe_ins=0, semantic_weight_mode="softmax",
        probabilistic_ce_mode="NoTTAConf",
        # reference-scale batching / lifecycle
        batch_size=2048, chunk=4096, min_grid_dim=64,
        max_grid_dim=args.max_grid,
        grid_upscale_epochs=[1, 2], bbox_aabb_reset_epochs=[1, 2],
        max_rays_instances=1024, max_labels_per_image=16,
        batch_size_segments=16, max_rays_segments=512, chunk_segment=2048,
        late_semantic_optimization=0, instance_optimization_epoch=3,
        segment_optimization_epoch=6, max_epoch=args.epochs,
        image_dim=tuple(args.image_dim), seed=0, lr=1.5e-3,
        # LR decay scales with the run length (10 epochs -> the original
        # [6, 7]); a fixed [6, 7] would freeze longer runs at lr*0.01 for
        # most of training and the field would never sharpen
        decay_step=[max(1, int(args.epochs * 0.6)),
                    max(2, int(args.epochs * 0.7))],
        save_every_n_train_steps=0, precision="bf16",
        weight_class_0=1.0, lambda_semantics=1.0,
        lambda_dist_reg=args.dist_reg,
    ).resolve_epochs()

    out_dir = args.out or tempfile.mkdtemp(prefix="refscale_")
    trainer = Trainer(cfg, scene, out_dir, log_every=1000)
    t0 = time.time()
    for epoch in range(cfg.max_epoch):
        m = trainer.train_epoch(epoch)
        val = trainer.validate(epoch)
        print(json.dumps({"epoch": epoch, "grid": trainer.grid_dim[0],
                          "epoch_seconds": round(m.get("epoch_seconds", 0), 1),
                          **{k: round(float(v), 4) for k, v in val.items()}}),
              flush=True)
    # final checkpoint: feeds bench.py --ckpt (trained-field throughput) and
    # tools/pq_fidelity_gate.py (fast-path PQ parity) — VERDICT r3 #3/#4
    trainer.save("final", cfg.max_epoch - 1)

    per_frame = render_frames(trainer.state.params, trainer.mcfg,
                              trainer.rcfg, trainer.state_r, scene.val_frames,
                              chunk=cfg.chunk)
    sem_cat = np.concatenate([f["semantics"] for f in per_frame])
    inst_cat = np.concatenate([f["instances"] for f in per_frame])
    fast = inst_cat[:, :cfg.max_instances]
    thing_features = create_instances_from_semantics(
        fast, sem_cat, scene.segmentation.fg_classes)
    onehot = cluster(thing_features, bandwidth=0.15,
                     num_images=len(scene.val_frames))
    preds, preds_masked, targets = [], [], []
    for i, frame in enumerate(scene.val_frames):
        sem_pred = per_frame[i]["semantics"].argmax(-1)
        inst_pred = np.asarray(onehot[i]).argmax(-1)
        # evaluate where GT is defined: the synthetic fixture marks rays that
        # miss all geometry invalid (no supervision, no GT class)
        m = frame.mask
        preds.append(np.stack([sem_pred[m], inst_pred[m]], -1))
        # reference-faithful variant: predictions on pseudo-label-void pixels
        # forced to void (the masking the reference applies at validation,
        # train_panopli_tensorf.py:375)
        sem_m = np.where(frame.semantics == 0, 0, sem_pred)
        preds_masked.append(np.stack([sem_m[m], inst_pred[m]], -1))
        targets.append(np.stack([frame.gt_semantics[m],
                                 frame.gt_instances[m]], -1))
    things = scene.things_filtered or set(scene.segmentation.fg_classes)
    stuffs = scene.stuff_filtered or {0}
    pq, sq, rq = panoptic_quality(
        np.concatenate(preds), np.concatenate(targets), things, stuffs,
        allow_unknown_preds_category=True)
    pq_m, sq_m, rq_m = panoptic_quality(
        np.concatenate(preds_masked), np.concatenate(targets), things, stuffs,
        allow_unknown_preds_category=True)
    print(json.dumps({
        "final": True, "wall_minutes": round((time.time() - t0) / 60, 1),
        "pq_scene": round(float(pq), 4), "sq": round(float(sq), 4),
        "rq": round(float(rq), 4),
        "pq_scene_masked": round(float(pq_m), 4),
        "num_found": int(len(np.unique(np.concatenate(
            [np.asarray(onehot[i]).argmax(-1)
             for i in range(len(scene.val_frames))])))),
        "out_dir": out_dir}), flush=True)


if __name__ == "__main__":
    main()
