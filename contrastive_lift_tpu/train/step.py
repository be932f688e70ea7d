"""The jitted two-phase train step.

One XLA program per (stage, epoch-gate) combination covers what the reference
spreads over Lightning manual optimization (reference:
trainer/train_panopli_tensorf.py:148-228):

  phase 1: render the main ray batch, MSE + TV + distortion + distilled-feature
           + semantic CE + segment-grouping losses, update the main partition;
  EMA:     slow <- 0.9 slow + 0.1 fast (slow_fast mode);
  phase 2: render per-image instance ray bundles (no-grad density), apply the
           instance clustering loss, update the instance partition.

Epoch gates are static Python bools — flipping a gate recompiles once, which
mirrors the reference re-running optimizer setup at those same epochs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..losses import losses as L
from ..models import tensorf as tf
from ..renderer import render as R
from .state import TrainState, ema_update_slow, make_optimizers


@dataclass(frozen=True)
class TrainGates:
    """Static epoch gates (reference: epoch checks at trainer :176,185,210)."""
    semantics_on: bool = True
    instances_on: bool = False
    segments_on: bool = False
    features_on: bool = False  # distilled-feature L1 still being optimized


def gates_for_epoch(cfg, epoch: int) -> TrainGates:
    return TrainGates(
        semantics_on=epoch >= cfg.late_semantic_optimization,
        instances_on=epoch >= cfg.instance_optimization_epoch,
        segments_on=(cfg.segment_grouping_mode != "none"
                     and epoch >= cfg.segment_optimization_epoch),
        features_on=(epoch <= cfg.feature_optimization_end_epoch),
    )


def _gate_epoch(cfg, gates: TrainGates) -> int:
    """An epoch value consistent with the static gates, for TV epoch-gating."""
    epoch = 0
    if gates.semantics_on:
        epoch = max(epoch, cfg.late_semantic_optimization)
    if gates.instances_on:
        epoch = max(epoch, cfg.instance_optimization_epoch)
    return epoch


def main_phase_loss(params, cfg, mcfg: tf.TensoRFConfig, rcfg: R.RenderConfig,
                    state_r: R.RenderState, gates: TrainGates, batch: dict,
                    rng, lambda_dist_reg, class_weights, head_topk=None):
    """Phase-1 loss (reference trainer :152-197). Returns (loss, metrics).

    ``head_topk`` (Trainer per-stage calibration) compacts the MAIN-phase
    heads to the k highest-weight samples per ray — the reference evaluates
    heads only where weight > raymarch_weight_thres in training too
    (panopli_tensoRF_renderer.py:103 boolean mask, shared forward), so the
    compaction is exact (losses AND gradients) while per-ray above-threshold
    counts stay <= k; the ``main_head_tail`` metric guards that contract
    (max k-th kept weight — exact when <= raymarch_weight_thres)."""
    if head_topk and rcfg.head_topk is None:
        import dataclasses
        rcfg = dataclasses.replace(rcfg, head_topk=int(head_topk))
    fused = None
    if getattr(cfg, "fused_main_density", False):
        # differentiable densified density (Config.fused_main_density):
        # built INSIDE the loss so value_and_grad differentiates through
        # the densify einsums; heads keep direct VM sampling
        from ..ops.fused_grid import build_density_only
        fused = build_density_only(params)
    out = R.render_rays(params, mcfg, rcfg, state_r, batch["rays"], rng,
                        is_train=True, fused=fused)
    mask = batch["mask"]
    rgb = jnp.where(mask[:, None], out["rgb"], 0.0)
    rgbs = jnp.where(mask[:, None], batch["rgbs"], 0.0)
    confs = jnp.where(mask, batch["confidences"], 0.0)

    metrics = {}
    loss = jnp.asarray(0.0)
    if cfg.lambda_rgb > 0:
        loss_rgb = L.mse_loss(rgb, rgbs)
        loss_tv = L.total_tv_loss(params, cfg, _gate_epoch(cfg, gates))
        loss_feat = jnp.asarray(0.0)
        if mcfg.use_distilled and gates.features_on:
            loss_tv = loss_tv + (L.branch_tv(params, "feature", 1e-2, 1e-3)
                                 * cfg.lambda_tv_distilled_features)
            loss_feat = L.l1_loss(out["distilled"], batch["feats"])
        loss = cfg.lambda_rgb * (loss_rgb + loss_tv
                                 + out["dist_reg"] * lambda_dist_reg
                                 + loss_feat * cfg.lambda_feat)
        if cfg.lambda_depth > 0 and "depth" in batch:
            depth_err = jnp.abs(out["depth"] - batch["depth"]) * mask
            loss_depth = jnp.sum(depth_err) / jnp.maximum(jnp.sum(mask), 1.0)
            loss = loss + cfg.lambda_depth * loss_depth
            metrics["loss_depth"] = loss_depth
        metrics.update(loss_rgb=loss_rgb, loss_feat=loss_feat,
                       loss_dist_reg=out["dist_reg"])

    loss_sem = jnp.asarray(0.0)
    if gates.semantics_on:
        loss_sem = L.semantic_loss(
            out["semantics"], batch["semantics"], batch["probabilities"], confs,
            cfg.probabilistic_ce_mode, class_weights, cfg.use_symmetric_ce,
            cfg.ce_alpha, cfg.ce_beta)
        loss = loss + cfg.lambda_semantics * loss_sem
    metrics["loss_semantics"] = loss_sem
    metrics["psnr"] = -10.0 * jnp.log10(L.mse_loss(jax.lax.stop_gradient(rgb), rgbs))
    if head_topk:
        metrics["main_head_tail"] = out["head_tail"]
    return loss, metrics


def segment_phase_loss(params, cfg, mcfg, rcfg, state_r, batch_seg: dict,
                       rng, class_weights, aux_head_topk=None):
    """Segment-grouping loss (reference trainer :185-195). Returns
    (loss, topk_tail, ess_budget_tail guardrails).

    The segment stream is large (batch_size_segments x max_rays_segments rays,
    each with n_samples points); rendering it in one shot would hold tens of
    GB of activations for backward. lax.map over checkpointed ray chunks keeps
    the backward working set per-chunk — the jit-native analog of the
    reference's chunk_segment Python loop.
    """
    rays = batch_seg["rays"]
    n = rays.shape[0]
    chunk = min(cfg.chunk_segment, n)
    pad = (-n) % chunk
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    chunks = rays_p.reshape(-1, chunk, rays.shape[1])

    fused = _aux_density_grids(params, cfg)
    rcfg_aux = _aux_rcfg(cfg, rcfg, aux_head_topk)

    @jax.checkpoint
    def render_chunk(r):
        return R.render_segment_features(params, mcfg, rcfg_aux, state_r, r,
                                         rng, is_train=True, fused=fused,
                                         return_tail=True)

    seg_map, tails, btails = jax.lax.map(render_chunk, chunks)
    seg_map = seg_map.reshape(rays_p.shape[0], -1)[:n]
    loss = L.segment_grouping_loss(
        seg_map, batch_seg["group"], batch_seg["confidences"],
        cfg.batch_size_segments, class_weights, cfg.segment_grouping_mode,
        valid=batch_seg.get("valid"))
    return loss, jnp.max(tails), jnp.max(btails)


def _aux_density_grids(params, cfg):
    """Fused density grids for the stop-gradient passes (instance/segment).

    Their density carries no gradient (reference renders it under no_grad), so
    the one-gather-per-sample fused path is exact and free of autodiff cost;
    rebuilding the dense grid each step is a few einsums. With
    ``ess_train_stride`` the grids also carry the coarse occupancy for
    train-time empty-space skipping (two reduce_windows per step).
    """
    if not getattr(cfg, "fused_aux_density", True):
        return None
    from ..ops.fused_grid import build_density_only
    return jax.lax.stop_gradient(build_density_only(
        params, with_occupancy=bool(getattr(cfg, "ess_train_stride", 0))))


def _aux_rcfg(cfg, rcfg: R.RenderConfig,
              aux_head_topk=None) -> R.RenderConfig:
    """Render config for the stop-grad passes: train-time two-level ESS.

    Conservative at the 0.5 training step ratio: the level-1 test margin
    needs (stride/2) * step_ratio + 1 interp voxel <= the 4-voxel block
    dilation — 3 <= 4 at the default stride 8 (with slack for mildly
    non-cubic voxels; Config.ess_train_stride docs that contract). The sub
    level is off: its 2-voxel margin is too tight at ratio 0.5.

    ``aux_head_topk`` (Trainer auto-calibration, Config.head_topk_train_auto)
    additionally sets the weight-top-k head budget for these passes — exact
    while per-ray above-threshold counts stay <= k (renderer._aux_topk).
    """
    import dataclasses
    repl = {}
    stride = int(getattr(cfg, "ess_train_stride", 0))
    if stride and getattr(cfg, "fused_aux_density", True):
        repl.update(coarse_stride=stride,
                    max_segments=int(getattr(cfg, "ess_train_segments", 32)),
                    sub_stride=None)
    if aux_head_topk and rcfg.head_topk is None:
        repl.update(head_topk=int(aux_head_topk))
    return dataclasses.replace(rcfg, **repl) if repl else rcfg


def _interp_slow(params: dict, coeff, use_proj: bool) -> dict:
    """Params with slow <- stop_grad(coeff*slow + (1-coeff)*fast).

    EMA with constant momentum m applied k times to a fixed fast net is a
    single interpolation with coeff m^k, so the reference's per-image
    ema_update_slownet loop (train_panopli_tensorf.py:213-218,258-259)
    becomes one closed-form mix per image. stop_gradient mirrors the
    reference's torch.no_grad EMA (:325-329).
    """
    def mix(slow_tree, fast_tree):
        return jax.tree.map(
            lambda s, f: jax.lax.stop_gradient(coeff * s + (1.0 - coeff) * f),
            slow_tree, fast_tree)

    out = dict(params)
    imlp = dict(params["instance_mlp"])
    imlp["slow"] = mix(imlp["slow"], imlp["fast"])
    out["instance_mlp"] = imlp
    if use_proj and "proj" in params:
        proj = dict(params["proj"])
        proj["slow"] = mix(proj["slow"], proj["fast"])
        out["proj"] = proj
    return out


def instance_phase_loss(params, cfg, mcfg, rcfg, state_r, batch_inst: dict, rng,
                        aux_head_topk=None):
    """Phase-2 loss over the per-image contrastive bundles (reference :210-221).
    Returns (summed loss, topk_tail, ess_budget_tail guardrails).

    batch_inst: rays [I,R,8], labels [I,R] (compact ids), confidences [I,R],
    valid [I,R]. The reference's python loop over images becomes a vmap.

    slow_fast EMA dynamics are reference-exact for any batch_size_contrastive:
    the reference renders image k with the slow net as of k EMA updates this
    step (forward happens before calculate_instance_clustering_loss's EMA,
    trainer :213-218,258-259), so image k here uses the closed-form
    interpolation with coeff 0.9^k. The step function commits slow_I
    (= coeff 0.9^I) after gradients are taken.
    """
    num_images = batch_inst["rays"].shape[0]
    rngs = jax.random.split(rng, num_images)
    coeffs = jnp.power(0.9, jnp.arange(num_images, dtype=jnp.float32))
    fused = _aux_density_grids(params, cfg)
    rcfg_aux = _aux_rcfg(cfg, rcfg, aux_head_topk)

    def one_image(rays, labels, confs, valid, k, coeff):
        if cfg.instance_loss_mode == "slow_fast":
            p_img = _interp_slow(params, coeff, mcfg.use_proj)
        else:
            p_img = params
        feats, points_xyz, tail, btail = R.render_instance_features(
            p_img, mcfg, rcfg_aux, state_r, rays, k, is_train=True, fused=fused,
            return_tail=True)
        if cfg.instance_loss_mode == "slow_fast":
            half = mcfg.dim_feature_instance // 2
            fast, slow = feats[:, :half], feats[:, half:]
            if mcfg.use_proj:
                fast, slow = tf.apply_proj(p_img, fast, slow)
            slow = jax.lax.stop_gradient(slow)
            return L.slow_fast_loss(fast, slow, labels, confs,
                                    cfg.max_labels_per_image,
                                    valid=valid), tail, btail
        if cfg.instance_loss_mode == "contrastive":
            if cfg.use_delta:
                feats = points_xyz + feats
            loss = L.contrastive_loss(feats, labels, cfg.temperature, valid=valid)
            if cfg.use_delta:
                loss = loss + 0.1 * jnp.mean(
                    jnp.linalg.norm(feats - points_xyz, axis=-1))
            return loss, tail, btail
        if cfg.instance_loss_mode == "linear_assignment":
            return L.linear_assignment_loss(
                feats, labels, confs, cfg.max_labels_per_image,
                valid=valid), tail, btail
        raise NotImplementedError(cfg.instance_loss_mode)

    losses, tails, btails = jax.vmap(one_image)(
        batch_inst["rays"], batch_inst["labels"], batch_inst["confidences"],
        batch_inst["valid"], rngs, coeffs)
    return jnp.sum(losses), jnp.max(tails), jnp.max(btails)


def make_train_step(cfg, mcfg: tf.TensoRFConfig, rcfg: R.RenderConfig,
                    gates: TrainGates, class_weights, params,
                    donate: bool = True, aux_head_topk=None):
    """Build the jitted train step for one (stage, gates) combination.

    ``params`` is only used for its pytree structure (optax partition labels).
    ``aux_head_topk``: per-stage calibrated top-k head budget for EVERY
    train-phase head — the stop-grad aux passes AND the main phase (the
    reference masks heads at the same weight threshold in all of them,
    panopli_tensoRF_renderer.py:103); metrics carry the ``aux_head_tail`` /
    ``main_head_tail`` guardrails (0 / <= raymarch_weight_thres ⇒ the
    compaction was exact this step).
    """
    main_tx, inst_tx, _ = make_optimizers(cfg, params)

    def step(state: TrainState, state_r: R.RenderState, batch_main: dict,
             batch_inst: Optional[dict], batch_seg: Optional[dict],
             rng, lr_scale, lambda_dist_reg):
        rng_main, rng_seg, rng_inst = jax.random.split(rng, 3)
        params_ = state.params
        opt_main = state.opt_state_main
        metrics = {}

        if not cfg.optimize_instance_only:
            def loss_fn(p):
                loss, m = main_phase_loss(
                    p, cfg, mcfg, rcfg, state_r, gates, batch_main, rng_main,
                    lambda_dist_reg, class_weights, head_topk=aux_head_topk)
                if gates.segments_on and batch_seg is not None:
                    seg, seg_tail, seg_btail = segment_phase_loss(
                        p, cfg, mcfg, rcfg, state_r, batch_seg, rng_seg,
                        class_weights, aux_head_topk)
                    loss = loss + cfg.lambda_semantics * cfg.lambda_segment * seg
                    m["loss_segment"] = seg
                    m["aux_budget_tail"] = seg_btail
                    if aux_head_topk:
                        m["aux_head_tail"] = seg_tail
                return loss, m

            (loss_main, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params_)
            updates, opt_main = main_tx.update(grads, opt_main, params_)
            params_ = jax.tree.map(lambda p_, u: p_ + u * lr_scale, params_, updates)
            metrics.update(m)
            metrics["loss_main"] = loss_main

        opt_inst = state.opt_state_inst
        if gates.instances_on and batch_inst is not None:
            def inst_loss_fn(p):
                loss_i, tail_i, btail_i = instance_phase_loss(
                    p, cfg, mcfg, rcfg, state_r, batch_inst, rng_inst,
                    aux_head_topk)
                return loss_i, (tail_i, btail_i)

            (loss_inst, (inst_tail, inst_btail)), grads_i = jax.value_and_grad(
                inst_loss_fn, has_aux=True)(params_)
            metrics["aux_budget_tail"] = jnp.maximum(
                metrics.get("aux_budget_tail", 0.0), inst_btail)
            if aux_head_topk:
                metrics["aux_head_tail"] = jnp.maximum(
                    metrics.get("aux_head_tail", 0.0), inst_tail)
            if cfg.instance_loss_mode == "slow_fast":
                # commit slow_I: one EMA per image this step (reference runs
                # ema_update_slownet inside the per-image loop, :213-218);
                # m applied I times to a fixed fast net == coeff m^I.
                num_images = batch_inst["rays"].shape[0]
                params_ = ema_update_slow(params_, 0.9 ** num_images,
                                          mcfg.use_proj)
            updates_i, opt_inst = inst_tx.update(grads_i, opt_inst, params_)
            params_ = jax.tree.map(lambda p_, u: p_ + u * lr_scale, params_, updates_i)
            metrics["loss_clustering"] = loss_inst

        new_state = TrainState(params_, opt_main, opt_inst, state.step + 1)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
