"""Inference pipeline: checkpoint -> rendered maps -> clustering -> artifacts.

The TPU equivalent of the reference render CLI (reference:
inference/render_panopli.py:31-189): render every test frame at doubled sample
count (step_ratio x0.5), keep the fast half of slow-fast embeddings, build
±inf-padded thing features, cluster (in-process or from cached centroids), and
write ``instance_features.npy`` / ``thing_features.npy`` / ``slow_features.npy``,
per-frame ``pred_semantics/*.png`` (uint8), ``pred_surrogateid/*.png`` (uint16)
and visualization grids — byte-compatible artifact layout.
"""
from __future__ import annotations

import dataclasses
import functools
import pickle
import time
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from ..config import Config
from ..data.base import FrameData
from ..factory import make_model_config, make_render_config
from ..io.checkpoint import load_checkpoint
from ..models import tensorf as tf
from ..renderer import render as R
from ..utils import geometry as geo
from ..utils.viz import save_image, visualize_panoptic_outputs
from .cluster import (assign_clusters, cluster, cluster_segmentwise,
                      create_instances_from_semantics)


def load_model_for_inference(ckpt_path, cfg: Config, num_semantic_classes: int,
                             step_ratio: float = 0.25, white_bg: bool = False,
                             head_topk: str | int | None = "auto"):
    """Rebuild (params, mcfg, rcfg, state_r) at the checkpoint's stored shapes.

    The reference replays grid upsampling to recover shapes
    (render_panopli.py:91-98); our checkpoints carry grid_dim/bbox_aabb
    metadata so the model is built directly at target resolution.
    ``step_ratio`` defaults to 0.25 = inference-time 2x samples
    (reference :104 halves the 0.5 training ratio).
    """
    params, meta = load_checkpoint(ckpt_path)
    grid_dim = tuple(meta["grid_dim"])
    bbox_aabb = np.asarray(meta["bbox_aabb"], np.float32)
    mcfg = make_model_config(cfg, num_semantic_classes)
    rcfg = make_render_config(cfg, bbox_aabb, grid_dim, mcfg,
                              step_ratio=step_ratio, white_bg=white_bg)
    if head_topk == "auto":
        # Round-5 adoption: with tail completion (the render_frames default
        # since r4) k=8 passes the 0.5 pt PQ^scene gate on all three
        # committed trained checkpoints AND holds analytic fidelity flat
        # (rgb p99 0.0013, 0% argmax mismatch) at +28% throughput vs k=24 —
        # see PERFORMANCE.md "Round-5 adjudication" and the committed
        # artifacts/e2e_r5*/FIDELITY_PQ_k*.json. Head cost scales hard with
        # k (k=8/24/64 -> ~3/7/36 ms/chunk on v5e), so auto resolves to the
        # smallest gate-passing k. Callers who explicitly pass
        # tail_complete=False to render_frames should also pick their own k
        # (the pre-r5 rule was min(64, max(16, n_samples // 4)) — top-64
        # covers everything above raymarch_weight_thres on surface-peaked
        # fields, tests/test_topk_render.py); the head_tail warning in
        # render_frames fires if k=8 under-budgets an uncompleted render.
        head_topk = 8
    if head_topk:
        import dataclasses
        rcfg = dataclasses.replace(rcfg, head_topk=int(head_topk))
    state_r = R.make_render_state(bbox_aabb, grid_dim, step_ratio)
    params = jax.tree.map(lambda x: jax.numpy.asarray(x), params)
    return params, mcfg, rcfg, state_r, meta


@functools.lru_cache(maxsize=8)
def _jitted_render(mcfg, rcfg):
    """Process-wide jit cache keyed by the static configs, so repeated
    render_frames calls (validation loops, bandwidth sweeps) re-trace only on
    a genuine config change (VERDICT r1 weak #4)."""
    def fn(p, f, sr, r):
        return R.render_rays(p, mcfg, rcfg, sr, r, None, False, fused=f)
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _jitted_render_group(mcfg, rcfg):
    """Single-dispatch grouped variant of _jitted_render: renders a [G, chunk]
    ray stack with ONE device dispatch via lax.map (the body is traced and
    compiled once; iterations run sequentially on device). On the remote-TPU
    platform every dispatch serializes a ~1.2 ms tunnel round trip
    (PERFORMANCE.md), so grouping G chunks amortizes it G-fold; per-chunk
    compute and numerics are identical to the per-chunk path. TPU-perf
    design — the reference's render loop (inference/render_panopli.py:108-120)
    launches per-chunk CUDA work where launch cost is negligible."""
    def fn(p, f, sr, rays_g):
        return jax.lax.map(
            lambda r: R.render_rays(p, mcfg, rcfg, sr, r, None, False,
                                    fused=f), rays_g)
    return jax.jit(fn)


def _build_render_grids(params, mcfg, rcfg, state_r):
    import jax.numpy as jnp
    from ..ops.fused_grid import build_render_grids
    dtype = jnp.bfloat16 if rcfg.head_dtype == "bfloat16" else jnp.float32
    adt = jnp.bfloat16 if rcfg.atlas_dtype == "bfloat16" else jnp.float32
    return build_render_grids(params, mcfg, rcfg, state_r,
                              compact=rcfg.coarse_stride is not None,
                              feature_dtype=dtype, atlas_dtype=adt)


def render_frames(params, mcfg, rcfg, state_r, frames: List[FrameData],
                  chunk: int = 8192, progress: bool = False,
                  use_fused: bool = True, mesh=None, data_axis: str = "data",
                  auto_budget: bool = True, bake_heads: bool = False,
                  termination: bool = True, head_term: bool = True,
                  dispatch_group: int = 4, l2_only: bool = True,
                  head_tail_eps: float = 2e-3,
                  tail_complete: bool | None = None):
    """Chunked full-pass render of a frame list -> per-frame map dicts.

    Builds the fused dense grids once (parameters are fixed at inference) so
    every chunk renders on the one-gather-per-sample fast path, and — with
    ``auto_budget`` — calibrates the empty-space-skipping segment budgets on
    a probe of the first frame's rays (renderer.calibrate_budgets), so dense
    scenes don't truncate and sparse scenes render faster than the
    configured defaults. With ``mesh`` (a 1-axis jax.sharding.Mesh) each ray
    chunk is sharded over the data axis and parameters are replicated — the
    multi-chip render path (reference DDP analog; chunk must divide the mesh
    size). ``dispatch_group`` renders that many chunks per device dispatch
    (single-chip path only) — identical numerics, fewer host round trips.
    """
    fused = _build_render_grids(params, mcfg, rcfg, state_r) if use_fused else None
    if tail_complete is None:
        # production default since round 4: completion ON wherever top-k
        # head compaction is active. NOTE for pre-r4 callers: this flips the
        # RenderConfig default (False) — pass tail_complete=False to restore
        # the unrenormalized top-k maps (advisor r4: the old bool kwarg
        # silently overrode an explicit rcfg; None now means "apply the
        # production default", an explicit bool is always honored).
        tail_complete = rcfg.head_topk is not None
    if rcfg.head_topk is not None and tail_complete != rcfg.head_tail_complete:
        # top-k tail completion: renormalizes rgb/instance maps by the exact
        # above-threshold mass the top-k cut dropped — a no-op on sharp
        # fields, and on fuzzy trained fields it collapses the truncation
        # error that previously failed the k=24 PQ gate
        # (RenderConfig.head_tail_complete)
        rcfg = dataclasses.replace(rcfg, head_tail_complete=tail_complete)
    if (l2_only and fused is not None and rcfg.sub_stride is not None
            and fused.coarse_occ_tight is not None):
        # L2-only selection (production default since round 4): the flat
        # grouped-bit sub-segment test drops the L1 gather + top_k + glue
        # and cannot truncate at the segment budget — faster AND strictly
        # more accurate than the cascade (PERFORMANCE.md r4 sweep:
        # 479.9k vs 466.4k rays/s at otherwise-identical defaults)
        rcfg = dataclasses.replace(rcfg, use_l1=False)
    if fused is not None and (fused.occ_group is not None
                              or fused.occ_bits_group is not None):
        rcfg = R.occ_grouping_for(rcfg, state_r)
    if (auto_budget and fused is not None and frames
            and rcfg.coarse_stride is not None and fused.coarse_occ is not None):
        # probe across up to 8 frames so budgets cover every viewpoint
        sel = frames[::max(1, len(frames) // 8)][:8]
        per = max(1, 4096 // len(sel))
        probe = np.concatenate(
            [f.rays[::max(1, len(f.rays) // per)][:per] for f in sel])
        # head_tail_eps: the per-ray dropped-mass bound the two-phase head
        # calibration may accept on pass-A non-survivors — a fidelity
        # operating point; loosen only with a PQ-gate artifact proving it
        # (tools/pq_fidelity_gate.py --head_tail_eps)
        rcfg = R.calibrate_budgets(mcfg, rcfg, state_r, probe, fused,
                                   termination=termination,
                                   head_term=head_term,
                                   head_tail_eps=head_tail_eps)
    if bake_heads and fused is not None and fused.compact_cells is not None:
        from ..renderer.bake import bake_head_tables
        fused = bake_head_tables(params, mcfg, fused)
    # span-gather exactness contract (RenderConfig.fine_span_rows) — checked
    # once on concrete state before any trace; no-op when span is off
    R.validate_fine_span(rcfg, state_r)
    fn = _jitted_render(mcfg, rcfg)
    if mesh is not None:
        from ..parallel import mesh as pmesh
        if chunk % mesh.size:
            raise ValueError(f"chunk={chunk} must divide mesh size {mesh.size}")
        params = pmesh.replicate_tree(mesh, params)
        state_r = pmesh.replicate_tree(mesh, state_r)
        if fused is not None:
            fused = pmesh.replicate_tree(mesh, fused)
        ray_sharding = pmesh.batch_sharding(mesh, data_axis)
    # Cross-frame pipelining: dispatch is async, so frame i's chunks compute
    # while frame i-1's maps stream to host (copy_to_host_async) — on the
    # remote-TPU platform each synchronous fetch costs a ~29 ms round trip,
    # which this overlaps with compute. Maps are concatenated ON DEVICE so
    # the fetch is 4 transfers per frame, not 4 per chunk.
    import jax.numpy as jnp
    keys = ("rgb", "semantics", "instances", "depth")
    results = []
    pending = None
    tails = []
    head_tails = []
    dedup_tails = []

    def _drain(dev_maps):
        return {k: np.asarray(v) for k, v in dev_maps.items()}

    for fi, frame in enumerate(frames):
        rays = frame.rays.astype(np.float32)
        n = rays.shape[0]
        pad = (-n) % chunk
        # pad by REPEATING the last real ray, not with zeros: zero rays
        # degenerate to a single in-box point and would compete in the
        # ray-adaptive paths (heavy/light bucketing by occupied count,
        # termination survivor slots) and pollute the tail guardrails;
        # duplicates of a real ray are sliced away by [:n] below
        rays_p = (np.concatenate([rays, np.repeat(rays[-1:], pad, axis=0)])
                  if pad else rays)
        n_chunks = len(rays_p) // chunk
        if dispatch_group > 1 and n_chunks > 1:
            # grouped dispatch: G chunks per device call (one tunnel round
            # trip instead of G); at most two trace shapes per frame set
            # (full groups + one remainder group). Under a mesh the chunk
            # (ray) axis stays sharded — lax.map iterates over the
            # replicated group axis, so each body step is the same sharded
            # program the per-chunk path runs.
            gfn = _jitted_render_group(mcfg, rcfg)
            stacked = rays_p.reshape(n_chunks, chunk, rays_p.shape[-1])
            if mesh is None:
                arr = jax.device_put(stacked)
            else:
                arr = jax.device_put(
                    stacked, pmesh.group_batch_sharding(mesh, data_axis))
            outs = [gfn(params, fused, state_r, arr[i:i + dispatch_group])
                    for i in range(0, n_chunks, dispatch_group)]
            tails.extend(jnp.max(o["budget_tail"]) for o in outs)
            head_tails.extend(jnp.max(o["head_tail"]) for o in outs)
            dedup_tails.extend(jnp.max(o["dedup_tail"]) for o in outs)
            cat = {k: jnp.concatenate(
                [o[k].reshape((-1,) + o[k].shape[2:]) for o in outs])[:n]
                for k in keys}
        else:
            if mesh is None:
                # one H2D per frame; chunk slices stay on device
                rays_dev = jax.device_put(rays_p)
                chunks = [rays_dev[i:i + chunk]
                          for i in range(0, len(rays_p), chunk)]
            else:
                chunks = [jax.device_put(rays_p[i:i + chunk], ray_sharding)
                          for i in range(0, len(rays_p), chunk)]
            outs = [fn(params, fused, state_r, r) for r in chunks]
            tails.extend(o["budget_tail"] for o in outs)
            head_tails.extend(o["head_tail"] for o in outs)
            dedup_tails.extend(o["dedup_tail"] for o in outs)
            cat = {k: jnp.concatenate([o[k] for o in outs])[:n] for k in keys}
        for v in cat.values():
            try:
                v.copy_to_host_async()
            except Exception:  # pragma: no cover - platform-dependent
                pass
        if pending is not None:
            results.append(_drain(pending))
        pending = cat
        if progress:
            print(f"rendered frame {fi + 1}/{len(frames)}", flush=True)
    if pending is not None:
        results.append(_drain(pending))
    if tails:
        # calibrated-budget margin guardrail (see render_rays budget_tail):
        # rays outside the probe cone that would silently truncate show up as
        # compositing weight in the deepest kept segment
        worst = float(jnp.max(jnp.stack(tails)))
        if worst > 1e-2:
            import warnings
            warnings.warn(
                f"empty-space-skipping budget margin exhausted: deepest kept "
                f"segment carries weight {worst:.3g} on some ray — rendered "
                f"views exceed the calibration probe; raise max_segments/"
                f"max_subsegments or re-probe with these frames")
    if dedup_tails:
        worst_d = float(jnp.max(jnp.stack(dedup_tails)))
        if worst_d > 0:
            import warnings
            warnings.warn(
                f"head_dedup_cells budget exceeded: {worst_d:.3%} of live "
                f"head samples hit an overflowed unique-cell run and read a "
                f"clamped row — raise head_dedup_cells or re-calibrate with "
                f"these frames")
    if head_tails:
        worst_k = float(jnp.max(jnp.stack(head_tails)))
        if rcfg.head_topk is not None and rcfg.head_tail_complete:
            # tail completion renormalizes the dropped above-threshold mass
            # back into the maps, so a non-trivial head_tail is EXPECTED at
            # the adopted small-k point (analytic k=8: 0.075) and fidelity
            # is adjudicated by the PQ gate / fidelity sweep, not by this
            # heuristic — the residual error after completion is bounded by
            # the dropped mass times the WITHIN-surface value spread. Warn
            # only on an extreme tail that says this field/k pair sits far
            # outside anything the gates checked.
            if worst_k > 0.25:
                import warnings
                warnings.warn(
                    f"head compaction tail is extreme: head_tail {worst_k:.3g} "
                    f"(k-th kept weight, or dropped mass under rank-select/"
                    f"two-phase heads) at head_topk={rcfg.head_topk} — tail "
                    f"completion renormalizes it, but this operating point "
                    f"is far outside the gate-adjudicated regime; re-run "
                    f"tools/pq_fidelity_gate.py at this k or raise head_topk")
        elif (rcfg.head_term_first > 0
              or getattr(rcfg, "head_select", "sort") == "rank"):
            # with two-phase heads (or rank-select compaction) active,
            # head_tail carries a DROPPED-MASS bound, which calibration only
            # bounds by head_tail_eps — gate the warning on that bound, not
            # the raw-weight threshold (advisor r4: the 2*thres gate fired
            # spuriously on every head_term render)
            if worst_k > max(2 * rcfg.raymarch_weight_thres, head_tail_eps):
                import warnings
                warnings.warn(
                    f"head dropped-mass bound exceeded: a ray drops "
                    f"compositing mass {worst_k:.3g} "
                    f"(calibrated bound {head_tail_eps:g}) — rendered views "
                    f"exceed the calibration probe; re-probe with these "
                    f"frames, raise head_term_fraction/head_topk, or enable "
                    f"tail completion")
        elif worst_k > rcfg.raymarch_weight_thres * 2:
            import warnings
            warnings.warn(
                f"head_topk budget tight: the k-th kept compositing weight "
                f"reaches {worst_k:.3g} (threshold "
                f"{rcfg.raymarch_weight_thres:g}) — some above-threshold "
                f"samples were dropped from the head evaluation; raise "
                f"head_topk")
    return results


def render_checkpoint_outputs(
        params, mcfg: tf.TensoRFConfig, rcfg, state_r, cfg: Config,
        frames: List[FrameData], thing_classes, output_dir,
        bandwidth: float = 0.15, use_dbscan: bool = False,
        segmentwise: bool = False, use_silverman: bool = False,
        cluster_size: int = 500, cached_centroids_path=None,
        chunk: int = 8192, save_visualizations: bool = True,
        mesh=None, termination: bool = True,
        head_term: bool = True, l2_only: bool = True,
        tail_complete: bool | None = None) -> dict:
    """Full inference: render + cluster + write artifacts. Returns summary."""
    output_dir = Path(output_dir)
    for sub in ("vis_semantics_and_surrogate", "pred_semantics", "pred_surrogateid"):
        (output_dir / sub).mkdir(parents=True, exist_ok=True)
    h, w = cfg.image_dim

    t_render0 = time.time()
    per_frame = render_frames(params, mcfg, rcfg, state_r, frames, chunk,
                              mesh=mesh, data_axis=cfg.data_axis,
                              termination=termination, head_term=head_term,
                              l2_only=l2_only, tail_complete=tail_complete)
    t_render = time.time() - t_render0

    all_sem = [f["semantics"] for f in per_frame]
    all_inst = np.concatenate([f["instances"] for f in per_frame])
    slow_features = None
    if mcfg.slow_fast_mode:
        slow_features = all_inst[:, cfg.max_instances:]
        all_inst = all_inst[:, :cfg.max_instances]  # keep fast features
    if cfg.use_delta:
        rays = np.concatenate([f.rays for f in frames])
        dists = np.concatenate([f["depth"] for f in per_frame])
        all_inst = all_inst + rays[:, 0:3] + dists[:, None] * rays[:, 3:6]

    np.save(output_dir / "instance_features.npy", all_inst)
    sem_cat = np.concatenate(all_sem)
    thing_features = create_instances_from_semantics(all_inst, sem_cat, thing_classes)
    np.save(output_dir / "thing_features.npy", thing_features)
    if slow_features is not None:
        np.save(output_dir / "slow_features.npy", slow_features)

    t_cluster0 = time.time()
    num_images = len(frames)
    if cached_centroids_path is not None:
        with open(cached_centroids_path, "rb") as f:
            all_centroids = pickle.load(f)
        instances_oh = assign_clusters(thing_features, sem_cat, all_centroids,
                                       num_images)
    elif segmentwise:
        instances_oh, _ = cluster_segmentwise(
            thing_features, sem_cat, bandwidth, num_images, use_dbscan,
            use_silverman, cluster_size)
    else:
        instances_oh = cluster(thing_features, bandwidth, num_images,
                               use_dbscan, use_silverman, cluster_size)
    t_cluster = time.time() - t_cluster0

    from PIL import Image
    for i, frame in enumerate(frames):
        name = f"{frame.name}.png"
        out = per_frame[i]
        sem_label = out["semantics"].argmax(-1).reshape(h, w)
        inst_label = np.asarray(instances_oh[i]).argmax(-1).reshape(h, w)
        Image.fromarray(sem_label.astype(np.uint8)).save(
            output_dir / "pred_semantics" / name)
        Image.fromarray(inst_label.astype(np.uint16)).save(
            output_dir / "pred_surrogateid" / name)
        if save_visualizations:
            depth = (geo.distance_to_depth(frame.intrinsics, out["depth"], h, w)
                     if frame.intrinsics is not None else out["depth"])
            grid = visualize_panoptic_outputs(
                out["rgb"], out["semantics"], np.asarray(instances_oh[i]),
                np.asarray(depth), None, None, None, h, w,
                thing_classes=thing_classes, visualize_entropy=False)
            save_image(output_dir / "vis_semantics_and_surrogate" / name, grid)

    rays_total = num_images * h * w
    return {
        "num_frames": num_images,
        "render_seconds": t_render,
        "cluster_seconds": t_cluster,
        "rays_per_second": rays_total / max(t_render, 1e-9),
        "output_dir": str(output_dir),
    }
