"""PQ^scene fidelity gate: production fast path vs dense fp32 reference.

The BASELINE.json accuracy criterion is METRIC-level: the fast render path
(three-level ESS, calibrated budgets, bf16 heads, top-k head compaction) must
cost < 0.5 PQ^scene points against the dense fp32 render of the SAME trained
field, clustered identically. Map-level probes (rgb p99 / opacity / argmax
mismatch, PERFORMANCE.md) bound this indirectly; this tool records the direct
number (VERDICT r3 #4).

Flow (reference metric: preprocess_scannet.py:685-705, pipeline:
inference/render_panopli.py:31-189):
  1. load a trained checkpoint (tools/run_reference_scale_e2e.py --out saves
     ``final.ckpt.npz``) + regenerate its deterministic synthetic scene;
  2. render the val split twice — dense fp32 (no ESS, no top-k, f32 heads)
     and the production fast path (inference.render_frames defaults);
  3. cluster both identically (same bandwidth, same mean-shift seeding);
  4. PQ^scene both against GT; gate |delta| <= 0.5 pt; write a JSON artifact.

Usage:
  python tools/pq_fidelity_gate.py --ckpt /path/final.ckpt.npz \
      [--out FIDELITY_PQ.json] [--bandwidth 0.15] [--epochs 10]

Scene args must match the training run (defaults = the e2e tool's defaults).
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def e2e_scene(image_dim=(48, 64), num_train=24, checker_freq=40.0):
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    return make_synthetic_scene(num_spheres=5, num_train=num_train, num_val=4,
                                image_dim=tuple(image_dim),
                                num_thing_classes=1, seed=7,
                                checker_freq=checker_freq)


def e2e_config(image_dim=(48, 64), max_grid=128, epochs=10):
    from contrastive_lift_tpu.config import Config
    return Config(
        instance_loss_mode="slow_fast", use_DINO_style=True, use_proj=False,
        use_delta=False, temperature=100.0, max_instances=3,
        use_mlp_for_semantics=True, use_mlp_for_instances=True,
        pe_sem=0, pe_ins=0, semantic_weight_mode="softmax",
        probabilistic_ce_mode="NoTTAConf",
        batch_size=2048, chunk=4096, min_grid_dim=64, max_grid_dim=max_grid,
        max_epoch=epochs, image_dim=tuple(image_dim), seed=0,
        weight_class_0=1.0,
    ).resolve_epochs()


def pq_for(per_frame, onehot, scene, max_instances):
    """PQ^scene of rendered maps + clustered instances vs the synthetic GT
    (same evaluation as tools/run_reference_scale_e2e.py). Returns
    (pq, sq, rq, pq_masked): the masked variant forces predictions on
    pseudo-label-void pixels to void — the reference's validation-time
    masking (train_panopli_tensorf.py:375). At short training budgets the
    raw semantics plateau (raw PQ can be 0 on the synthetic fixture), so
    the masked PQ is the variant with signal and the one the gate compares."""
    from contrastive_lift_tpu.metrics.panoptic_quality import panoptic_quality
    preds, preds_masked, targets = [], [], []
    for i, frame in enumerate(scene.val_frames):
        sem_pred = per_frame[i]["semantics"].argmax(-1)
        inst_pred = np.asarray(onehot[i]).argmax(-1)
        m = frame.mask
        preds.append(np.stack([sem_pred[m], inst_pred[m]], -1))
        sem_m = np.where(frame.semantics == 0, 0, sem_pred)
        preds_masked.append(np.stack([sem_m[m], inst_pred[m]], -1))
        targets.append(np.stack([frame.gt_semantics[m],
                                 frame.gt_instances[m]], -1))
    things = scene.things_filtered or set(scene.segmentation.fg_classes)
    stuffs = scene.stuff_filtered or {0}
    targets_cat = np.concatenate(targets)
    pq, sq, rq = panoptic_quality(
        np.concatenate(preds), targets_cat, things, stuffs,
        allow_unknown_preds_category=True)
    pq_m, _, _ = panoptic_quality(
        np.concatenate(preds_masked), targets_cat, things, stuffs,
        allow_unknown_preds_category=True)
    return float(pq), float(sq), float(rq), float(pq_m)


def cluster_maps(per_frame, scene, bandwidth, max_instances):
    from contrastive_lift_tpu.inference.cluster import (
        cluster, create_instances_from_semantics)
    sem_cat = np.concatenate([f["semantics"] for f in per_frame])
    inst_cat = np.concatenate([f["instances"] for f in per_frame])
    fast = inst_cat[:, :max_instances]
    thing_features = create_instances_from_semantics(
        fast, sem_cat, scene.segmentation.fg_classes)
    return cluster(thing_features, bandwidth=bandwidth,
                   num_images=len(scene.val_frames))


def run_gate(params, mcfg, rcfg, state_r, scene, max_instances: int,
             bandwidth: float = 0.15, gate: float = 0.005,
             chunk: int = 4096, head_tail_eps: float = 2e-3) -> dict:
    """Render the val split through the fast path and the dense fp32 path,
    cluster identically, and return the PQ^scene comparison record."""
    import dataclasses as _dc

    from contrastive_lift_tpu.inference.render import render_frames

    t0 = time.time()
    fast_frames = render_frames(params, mcfg, rcfg, state_r, scene.val_frames,
                                chunk=chunk, head_tail_eps=head_tail_eps)
    t_fast = time.time() - t0

    # dense fp32 reference: no ESS, no top-k, f32 heads. compact=True is
    # exact for composited maps (zero-density bricks carry zero weight) and
    # keeps the f32 tables inside chip HBM (see tools/fidelity_sweep.py).
    rcfg_dense = _dc.replace(
        rcfg, coarse_stride=None, sub_stride=None, head_topk=None,
        head_topk_semins=None, head_dtype="float32",
        atlas_dtype="float32")  # the reference is fp32 by definition
    t0 = time.time()
    dense_frames = render_frames(params, mcfg, rcfg_dense, state_r,
                                 scene.val_frames, chunk=min(chunk, 1024))
    t_dense = time.time() - t0

    oh_fast = cluster_maps(fast_frames, scene, bandwidth, max_instances)
    oh_dense = cluster_maps(dense_frames, scene, bandwidth, max_instances)

    pq_f, sq_f, rq_f, pqm_f = pq_for(fast_frames, oh_fast, scene,
                                     max_instances)
    pq_d, sq_d, rq_d, pqm_d = pq_for(dense_frames, oh_dense, scene,
                                     max_instances)

    rgb_f = np.concatenate([f["rgb"] for f in fast_frames])
    rgb_d = np.concatenate([f["rgb"] for f in dense_frames])
    sem_f = np.concatenate([f["semantics"] for f in fast_frames]).argmax(-1)
    sem_d = np.concatenate([f["semantics"] for f in dense_frames]).argmax(-1)

    # the gate compares BOTH PQ variants: raw and the reference's
    # validation-masked form (the one with signal at short budgets); the
    # fast path must hold the bound on whichever carries the scene's metric
    delta = max(abs(pq_f - pq_d), abs(pqm_f - pqm_d))
    return {
        "pq_scene_fast": round(pq_f, 4), "pq_scene_dense": round(pq_d, 4),
        "delta_pq": round(pq_f - pq_d, 4),
        "pq_masked_fast": round(pqm_f, 4), "pq_masked_dense": round(pqm_d, 4),
        "delta_pq_masked": round(pqm_f - pqm_d, 4),
        "sq_fast": round(sq_f, 4), "sq_dense": round(sq_d, 4),
        "rq_fast": round(rq_f, 4), "rq_dense": round(rq_d, 4),
        "rgb_p99_err": round(float(np.quantile(np.abs(rgb_f - rgb_d), 0.99)), 6),
        "sem_argmax_mismatch": round(float((sem_f != sem_d).mean()), 6),
        "render_seconds_fast": round(t_fast, 1),
        "render_seconds_dense": round(t_dense, 1),
        "gate": gate,
        "pass": bool(delta <= gate),
    }


def main():
    from contrastive_lift_tpu.utils.platform import honor_platform_env
    honor_platform_env()  # JAX_PLATFORMS=cpu must beat the axon default
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None,
                    help="JSON artifact path (default: stdout only)")
    ap.add_argument("--bandwidth", type=float, default=0.15)
    ap.add_argument("--image_dim", type=int, nargs=2, default=[48, 64])
    ap.add_argument("--num_train", type=int, default=24)
    ap.add_argument("--checker_freq", type=float, default=40.0,
                    help="must match the training run's fixture "
                         "(run_reference_scale_e2e.py --checker_freq)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--gate", type=float, default=0.005,
                    help="max |PQ(fast) - PQ(dense)| (BASELINE.json: 0.5 pt)")
    ap.add_argument("--head_topk", type=int, default=None,
                    help="override the auto head top-k with the BENCH "
                         "operating point (e.g. 24) so the gate adjudicates "
                         "the exact configuration the headline rays/s uses")
    ap.add_argument("--k2", type=int, default=None,
                    help="head_topk_semins override (requires --head_topk)")
    ap.add_argument("--head_select", default="sort",
                    choices=("sort", "iter", "rank"),
                    help="head selection mode to gate (RenderConfig."
                         "head_select; 'rank' = nearest-k above threshold "
                         "needs per-field adjudication, 'iter' is an exact "
                         "top-k implementation swap)")
    ap.add_argument("--atlas_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="brick-atlas storage dtype to gate (the dense "
                         "reference always stays fp32)")
    ap.add_argument("--head_tail_eps", type=float, default=2e-3,
                    help="per-ray dropped-mass bound the two-phase head "
                         "calibration may accept (calibrate_budgets "
                         "head_tail_eps) — gate candidate operating points "
                         "before loosening the production default")
    args = ap.parse_args()

    from contrastive_lift_tpu.inference.render import load_model_for_inference

    scene = e2e_scene(tuple(args.image_dim), args.num_train,
                      args.checker_freq)
    cfg = e2e_config(tuple(args.image_dim), epochs=args.epochs)
    params, mcfg, rcfg, state_r, meta = load_model_for_inference(
        args.ckpt, cfg, scene.num_semantic_classes, step_ratio=0.25,
        head_topk=args.head_topk if args.head_topk else "auto")
    if args.head_topk:
        # the BENCH headline point runs bf16 heads; mirror it so the gate
        # adjudicates the exact recorded configuration
        import dataclasses as _dc
        rcfg = _dc.replace(rcfg, head_dtype="bfloat16",
                           head_topk_semins=args.k2)
    if args.head_select != "sort":
        import dataclasses as _dc
        rcfg = _dc.replace(rcfg, head_select=args.head_select)
    if args.atlas_dtype != "float32":
        import dataclasses as _dc
        rcfg = _dc.replace(rcfg, atlas_dtype=args.atlas_dtype)
    result = run_gate(params, mcfg, rcfg, state_r, scene, cfg.max_instances,
                      bandwidth=args.bandwidth, gate=args.gate,
                      chunk=cfg.chunk, head_tail_eps=args.head_tail_eps)
    result = {"ckpt": str(args.ckpt), "grid_dim": list(meta["grid_dim"]),
              "head_topk": rcfg.head_topk,
              "head_topk_semins": rcfg.head_topk_semins,
              "head_dtype": rcfg.head_dtype,
              "head_select": rcfg.head_select,
              "atlas_dtype": rcfg.atlas_dtype,
              "head_tail_eps": args.head_tail_eps, **result}
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        Path(args.out).write_text(line + "\n")
    if not result["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
