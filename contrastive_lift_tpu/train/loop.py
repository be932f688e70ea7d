"""Training orchestration: stages, epoch gates, validation, checkpoints.

Replaces the reference's Lightning trainer (reference: trainer/__init__.py:61-123,
trainer/train_panopli_tensorf.py:148-470). Structure:

  * an epoch loop; at ``bbox_aabb_reset_epochs`` the AABB is recomputed and the
    grids shrink; at ``grid_upscale_epochs`` the grids upsample along the
    log-spaced voxel schedule — both change array shapes, so each becomes a
    new *stage* with a freshly jitted train step and re-initialized optimizer
    state (the reference also re-creates its optimizers there);
  * per-step host work is only batch sampling (numpy) + device put;
  * validation renders full val frames in ray chunks and reports
    PSNR / mIoU / PQ / SQ / RQ against machine labels and GT.
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data.base import (InstanceBundleSampler, RayPoolSampler, SceneData,
                         SegmentBundleSampler)
from ..factory import build_model, class_weights_for, make_render_config
from ..io.checkpoint import save_checkpoint
from ..metrics.metrics import ConfusionMatrix
from ..metrics.panoptic_quality import panoptic_quality
from ..models import tensorf as tf
from ..renderer import occupancy as occ
from ..renderer import render as R
from .schedule import lr_scale_for_epoch
from .state import TrainState, init_train_state
from .step import gates_for_epoch, make_train_step


@dataclass
class Trainer:
    cfg: Config
    scene: SceneData
    run_dir: Path
    log_every: int = 50

    def __post_init__(self):
        cfg = self.cfg
        self.run_dir = Path(self.run_dir)
        (self.run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
        cfg.save(self.run_dir / "config.json")
        self.grid_dim = (cfg.min_grid_dim,) * 3
        self.mcfg, params, self.rcfg, self.state_r = build_model(
            cfg, self.scene.num_semantic_classes, self.scene.scene_bounds,
            self.grid_dim, white_bg=self.scene.white_bg)
        self.class_weights = class_weights_for(cfg, self.scene.segmentation)
        self.state = init_train_state(cfg, params)
        self.main_sampler = RayPoolSampler(
            self.scene.train_frames, self.scene.num_semantic_classes,
            load_feats=self.mcfg.use_distilled,
            load_depth=cfg.lambda_depth > 0)
        self.inst_sampler = InstanceBundleSampler(
            self.scene.train_frames, cfg.max_rays_instances,
            cfg.max_labels_per_image)
        self.seg_sampler = (SegmentBundleSampler(self.scene.train_frames,
                                                 cfg.max_rays_segments)
                            if cfg.segment_grouping_mode != "none" else None)
        self.rng = np.random.default_rng(cfg.seed or 0)
        self.global_step = 0
        self._step_fn = None
        self._step_key = None
        from ..utils.logger import make_logger, snapshot_source
        from ..utils.observability import print_model_summary
        snapshot_source(self.run_dir)  # code + config snapshot (reproducibility)
        self.logger = make_logger(cfg.logger, self.run_dir)
        print_model_summary(params)
        self.voxel_schedule = occ.grid_upscale_voxel_counts(
            cfg.min_grid_dim, cfg.max_grid_dim, len(cfg.grid_upscale_epochs))

    # -- stage management ---------------------------------------------------

    def _rebuild_stage(self, epoch: int):
        """Re-jit the step + reset optimizer state after any shape change."""
        gates = gates_for_epoch(self.cfg, epoch)
        key = (self.grid_dim, gates, self.rcfg.n_samples)
        if key == self._step_key and self._step_fn is not None:
            return
        params = self.state.params
        fresh = init_train_state(self.cfg, params)
        self.state = TrainState(params, fresh.opt_state_main,
                                fresh.opt_state_inst, fresh.step)
        self._step_fn = make_train_step(self.cfg, self.mcfg, self.rcfg, gates,
                                        self.class_weights, params)
        self._step_key = key

    def on_epoch_start(self, epoch: int):
        cfg = self.cfg
        shape_changed = False
        if epoch in cfg.bbox_aabb_reset_epochs:
            params, state_r, grid_dim = occ.update_bbox_and_shrink(
                self.state.params, self.mcfg, self.state_r, self.grid_dim)
            if grid_dim != self.grid_dim:
                self.state = self.state._replace(params=params)
                self.state_r, self.grid_dim = state_r, grid_dim
                shape_changed = True
        if epoch in cfg.grid_upscale_epochs:
            target_voxels = self.voxel_schedule[
                list(cfg.grid_upscale_epochs).index(epoch)]
            target_res = occ.get_target_resolution(self.state_r, target_voxels)
            params = tf.upsample_volume_grid(self.state.params, target_res)
            self.state = self.state._replace(params=params)
            self.grid_dim = target_res
            self.state_r = R.make_render_state(
                np.asarray(self.state_r.bbox_aabb), target_res)
            self.cfg.weight_decay = 0.0  # reference zeroes wd after upscale
            shape_changed = True
        if shape_changed:
            self.rcfg = make_render_config(
                self.cfg, np.asarray(self.state_r.bbox_aabb), self.grid_dim,
                self.mcfg, white_bg=self.scene.white_bg)
            self._step_key = None
        self._rebuild_stage(epoch)

    # -- main loops ----------------------------------------------------------

    def steps_per_epoch(self) -> int:
        return max(1, self.main_sampler.n // self.cfg.batch_size)

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.cfg
        self.on_epoch_start(epoch)
        gates = gates_for_epoch(cfg, epoch)
        lr_scale = lr_scale_for_epoch(epoch, cfg.decay_step, cfg.decay_gamma,
                                      cfg.warmup_epochs, cfg.warmup_multiplier)
        lambda_dist = cfg.lambda_dist_reg * (1 - np.exp(-0.25 * epoch))
        last_metrics = {}
        t0 = time.time()
        for it in range(self.steps_per_epoch()):
            batch_main = self.main_sampler.sample(self.rng, cfg.batch_size)
            batch_inst = (self.inst_sampler.sample(self.rng, cfg.batch_size_contrastive)
                          if gates.instances_on else None)
            batch_seg = (self.seg_sampler.sample(self.rng, cfg.batch_size_segments)
                         if gates.segments_on and self.seg_sampler else None)
            self.state, metrics = self._step_fn(
                self.state, self.state_r, batch_main, batch_inst, batch_seg,
                jax.random.PRNGKey(self.global_step), lr_scale, lambda_dist)
            self.global_step += 1
            if self.global_step % self.log_every == 0:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                self._log({"epoch": epoch, "step": self.global_step,
                           "lr_scale": lr_scale, **last_metrics})
            if (cfg.save_every_n_train_steps
                    and self.global_step % cfg.save_every_n_train_steps == 0):
                self.save(f"step_{self.global_step:06d}")
        last_metrics["epoch_seconds"] = time.time() - t0
        return last_metrics

    def fit(self, max_epoch: Optional[int] = None):
        for epoch in range(max_epoch or self.cfg.max_epoch):
            m = self.train_epoch(epoch)
            val = self.validate(epoch)
            self._log({"epoch": epoch, "val": val, **m})
            self.visualize()
            self.save("last")
        return self.state

    # -- validation ----------------------------------------------------------

    def render_frame(self, rays: np.ndarray, chunk: Optional[int] = None) -> dict:
        chunk = chunk or self.cfg.chunk
        outs = []
        fn = jax.jit(lambda p, r: R.render_rays(
            p, self.mcfg, self.rcfg, self.state_r, r, None, False))
        n = rays.shape[0]
        pad = (-n) % chunk
        rays_p = np.pad(rays, ((0, pad), (0, 0)))
        for i in range(0, len(rays_p), chunk):
            outs.append(fn(self.state.params, rays_p[i:i + chunk]))
        cat = {k: np.concatenate([np.asarray(o[k]) for o in outs])[:n]
               for k in ("rgb", "semantics", "instances", "depth")}
        return cat

    def validate(self, epoch: int) -> dict:
        rows = []
        for frame in self.scene.val_frames:
            out = self.render_frame(frame.rays)
            mask = frame.mask
            rgb = np.where(mask[:, None], out["rgb"], 0.0)
            gt = np.where(mask[:, None], frame.rgbs, 0.0)
            mse = float(np.mean((rgb - gt) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-12))
            sem_pred = out["semantics"].argmax(-1)
            sem_pred_m = np.where(frame.semantics == 0, 0, sem_pred)
            cm = ConfusionMatrix(self.scene.num_semantic_classes, ignore_class=[0])
            iou = cm.add_batch(sem_pred_m, frame.semantics, return_miou=True)
            inst_pred = out["instances"].argmax(-1)
            pq, sq, rq = panoptic_quality(
                np.stack([sem_pred_m, inst_pred], -1),
                np.stack([frame.semantics, frame.instances], -1),
                self.scene.things_filtered, self.scene.stuff_filtered,
                allow_unknown_preds_category=True)
            row = {"psnr": psnr, "iou": iou, "pq": pq, "sq": sq, "rq": rq}
            if frame.gt_semantics is not None:
                cm_gt = ConfusionMatrix(self.scene.num_semantic_classes,
                                        ignore_class=list(self.scene.faulty_classes))
                row["rs_iou"] = cm_gt.add_batch(sem_pred, frame.gt_semantics,
                                                return_miou=True)
                rs_pq, rs_sq, rs_rq = panoptic_quality(
                    np.stack([sem_pred, inst_pred], -1),
                    np.stack([frame.gt_semantics, frame.gt_instances], -1),
                    self.scene.things_filtered, self.scene.stuff_filtered,
                    allow_unknown_preds_category=True)
                row.update(rs_pq=rs_pq, rs_sq=rs_sq, rs_rq=rs_rq)
            rows.append(row)
        keys = rows[0].keys()
        return {k: float(np.nanmean([r[k] for r in rows])) for k in keys}

    # -- io -------------------------------------------------------------------

    def save(self, tag: str):
        save_checkpoint(
            self.run_dir / "checkpoints" / f"{tag}.npz", self.state.params,
            grid_dim=self.grid_dim,
            bbox_aabb=np.asarray(self.state_r.bbox_aabb),
            epoch=self.global_step // max(1, self.steps_per_epoch()),
            global_step=self.global_step,
            config_dict=self.cfg.to_dict())

    def _log(self, record: dict):
        flat = dict(record)
        if isinstance(flat.get("val"), dict):
            val = flat.pop("val")
            flat.update({f"val/{k}": v for k, v in val.items()})
        self.logger.log(flat, step=self.global_step)
        printable = {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in record.items() if not isinstance(v, dict)}
        print(printable, flush=True)

    def visualize(self, indices=None, max_frames: int = 4):
        """Save panoptic visualization grids for selected val frames
        (reference: on_validation_epoch_end image dumps :412-429)."""
        from ..utils.viz import visualize_panoptic_outputs
        h, w = self.scene.image_dim
        indices = (self.cfg.visualized_indices
                   if indices is None and self.cfg.visualized_indices
                   else indices) or list(range(min(max_frames,
                                                   len(self.scene.val_frames))))
        for idx in indices:
            frame = self.scene.val_frames[idx]
            out = self.render_frame(frame.rays)
            inst_onehot = np.eye(int(out["instances"].argmax(-1).max()) + 1,
                                 dtype=np.float32)[out["instances"].argmax(-1)]
            grid = visualize_panoptic_outputs(
                out["rgb"], out["semantics"], inst_onehot, out["depth"],
                frame.rgbs, frame.gt_semantics, frame.gt_instances, h, w,
                thing_classes=self.scene.segmentation.fg_classes,
                m2f_semantics=frame.semantics, m2f_instances=frame.instances)
            self.logger.log_image(f"val/{idx:04d}", grid, self.global_step)
