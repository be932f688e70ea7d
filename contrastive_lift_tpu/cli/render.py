"""Render CLI (reference entry: inference/render_panopli.py:430-458).

Renders the test split from a checkpoint at 2x samples, clusters the instance
embeddings (mean-shift / HDBSCAN / cached centroids), and writes the
reference-compatible artifact tree (instance_features.npy, pred_semantics/,
pred_surrogateid/, vis grids).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..config import Config, load_config
from ..data import load_scene
from ..inference.render import load_model_for_inference, render_checkpoint_outputs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--bandwidth", type=float, default=0.15)
    parser.add_argument("--cluster_size", type=int, default=500,
                        help="min_cluster_size for HDBSCAN")
    parser.add_argument("--use_dbscan", action="store_true")
    parser.add_argument("--segmentwise", action="store_true")
    parser.add_argument("--subsample", type=int, default=1)
    parser.add_argument("--use_silverman", action="store_true")
    parser.add_argument("--cached_centroids_path", type=str, default=None)
    parser.add_argument("--image_dim", type=int, nargs=2, default=[256, 384],
                        help="render resolution (reference hardcodes 256x384)")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--chunk", type=int, default=8192)
    parser.add_argument("--n_data_shards", type=int, default=None,
                        help="devices for sharded rendering (0=all; default: "
                        "the run config's n_data_shards)")
    parser.add_argument("--no-term", dest="term", action="store_false",
                        default=True,
                        help="disable two-phase early-termination fine "
                        "evaluation (RenderConfig.term_first; ON by default "
                        "since round 4: +8.6%% on-chip A/B, PERFORMANCE.md; "
                        "budgets stay scene-calibrated and guarded by "
                        "budget_tail)")
    parser.add_argument("--no-hterm", dest="head_term", action="store_false",
                        default=True,
                        help="disable the two-phase head-evaluation "
                        "calibration (RenderConfig.head_term_first; fires "
                        "only where the probe proves a >=15%% head saving)")
    parser.add_argument("--no-tail-complete", dest="tail_complete",
                        action="store_false", default=None,
                        help="disable top-k tail completion (RenderConfig."
                        "head_tail_complete; ON by default since round 4 "
                        "whenever head_topk is set) — restores the pre-r4 "
                        "exact-top-k render")
    parser.add_argument("--head-topk", default="auto",
                        help="per-ray head-evaluation budget: 'auto' (the "
                        "round-5 gate-adopted k=8 with tail completion), an "
                        "integer (e.g. 24 for tighter rgb at -22%% "
                        "throughput, PERFORMANCE.md round-5 adjudication), "
                        "or 'none' for dense head evaluation")
    parser.add_argument("--l1", dest="l2_only", action="store_false",
                        default=True,
                        help="restore the L1 segment cascade (default: "
                        "L2-only flat grouped-bit selection — faster and "
                        "strictly more accurate, PERFORMANCE.md round 4)")
    args = parser.parse_args(argv)

    ckpt = Path(args.ckpt_path)
    # read the snapshotted run config next to the checkpoint
    cfg_path = ckpt.parents[1] / "config.json"
    cfg = load_config(cfg_path) if cfg_path.exists() else Config()
    cfg.subsample_frames = args.subsample
    cfg.image_dim = tuple(args.image_dim)

    scene = load_scene(cfg, load_train=False)
    frames = scene.val_frames
    ht = args.head_topk
    head_topk = ("auto" if ht == "auto"
                 else None if ht in ("none", "0") else int(ht))
    params, mcfg, rcfg, state_r, meta = load_model_for_inference(
        ckpt, cfg, scene.num_semantic_classes, white_bg=scene.white_bg,
        head_topk=head_topk)

    n_shards = (args.n_data_shards if args.n_data_shards is not None
                else cfg.n_data_shards)
    mesh = None
    if n_shards != 1:
        from ..parallel import mesh as pmesh
        mesh = pmesh.make_mesh(n_shards or None, cfg.data_axis)

    suffix = ("_dbscan" if args.use_dbscan else "") + ("_seg" if args.segmentwise else "")
    output_dir = (Path(args.output_dir) if args.output_dir else
                  Path("runs") / f"{Path(cfg.dataset_root).stem}_test_{cfg.experiment}{suffix}")
    summary = render_checkpoint_outputs(
        params, mcfg, rcfg, state_r, cfg, frames,
        scene.segmentation.fg_classes, output_dir,
        bandwidth=args.bandwidth, use_dbscan=args.use_dbscan,
        segmentwise=args.segmentwise, use_silverman=args.use_silverman,
        cluster_size=args.cluster_size,
        cached_centroids_path=args.cached_centroids_path, chunk=args.chunk,
        mesh=mesh, termination=args.term, head_term=args.head_term,
        l2_only=args.l2_only, tail_complete=args.tail_complete)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
