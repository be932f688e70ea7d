"""Top-k head compaction must match dense rendering when k covers all active
samples (the weight distribution is surface-peaked by construction)."""
import dataclasses

import numpy as np
import jax

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import RayPoolSampler
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.renderer import render as R
from contrastive_lift_tpu.train.state import init_train_state
from contrastive_lift_tpu.train.step import TrainGates, make_train_step


def _trained_setup():
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(24, 32), seed=1)
    cfg = Config(batch_size=256, min_grid_dim=20, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 lr=2e-3, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (20,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    step = make_train_step(cfg, mcfg, rcfg, TrainGates(semantics_on=False),
                           weights, params)
    nrng = np.random.default_rng(0)
    for i in range(25):
        state, _ = step(state, state_r, sampler.sample(nrng, 256), None, None,
                        jax.random.PRNGKey(i), 1.0, 0.0)
    return scene, cfg, mcfg, state.params, rcfg, state_r


def test_topk_matches_dense_after_training():
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::7][:128]
    dense = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    # count active samples per ray to choose a covering k
    xyz, z, in_box = R.sample_points_in_box(rays, state_r, rcfg.n_samples, 0.0,
                                            None, False)
    rcfg_k = dataclasses.replace(rcfg, head_topk=rcfg.n_samples // 2)
    topk = R.render_rays(params, mcfg, rcfg_k, state_r, rays, None, False)
    # identical whenever k covers every above-threshold sample; allow a tiny
    # tail tolerance for rays with very diffuse early-training weights
    np.testing.assert_allclose(np.asarray(topk["rgb"]),
                               np.asarray(dense["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(topk["instances"]),
                               np.asarray(dense["instances"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(topk["depth"]),
                               np.asarray(dense["depth"]), atol=1e-5)


def test_bf16_heads_close_to_fp32():
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[:64]
    f32 = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    rcfg_bf = dataclasses.replace(rcfg, head_dtype="bfloat16")
    bf = R.render_rays(params, mcfg, rcfg_bf, state_r, rays, None, False)
    np.testing.assert_allclose(np.asarray(bf["rgb"]), np.asarray(f32["rgb"]),
                               atol=2e-2)
