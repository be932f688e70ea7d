"""Variant-path coverage: distilled features, DINO projection, use_delta,
contrastive mode, SCE, segment modes — each through a full train step."""
import numpy as np
import jax
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import (InstanceBundleSampler,
                                            RayPoolSampler,
                                            SegmentBundleSampler)
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.train.state import init_train_state
from contrastive_lift_tpu.train.step import TrainGates, make_train_step


@pytest.fixture(scope="module")
def scene():
    sc = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                              image_dim=(20, 24), seed=11)
    # attach fake distilled-feature targets (the reference reads these from
    # precomputed DINO maps)
    rng = np.random.default_rng(0)
    for f in sc.train_frames + sc.val_frames:
        feats = rng.normal(size=(f.rays.shape[0], 64)).astype(np.float32)
        f.feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    return sc


def _run_one_step(cfg, scene, gates=None):
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds,
        (cfg.min_grid_dim,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    main_s = RayPoolSampler(scene.train_frames, scene.num_semantic_classes,
                            load_feats=mcfg.use_distilled)
    inst_s = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                                   cfg.max_labels_per_image)
    seg_s = SegmentBundleSampler(scene.train_frames, cfg.max_rays_segments)
    gates = gates or TrainGates(semantics_on=True, instances_on=True,
                                segments_on=True,
                                features_on=mcfg.use_distilled)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    nrng = np.random.default_rng(1)
    state, metrics = step(state, state_r,
                          main_s.sample(nrng, cfg.batch_size),
                          inst_s.sample(nrng, cfg.batch_size_contrastive),
                          seg_s.sample(nrng, cfg.batch_size_segments),
                          jax.random.PRNGKey(0), 1.0, 0.001)
    for key, value in metrics.items():
        assert np.isfinite(float(value)), (key, value)
    return state, metrics


def _base_cfg(**kw):
    defaults = dict(batch_size=128, chunk=128, min_grid_dim=16,
                    max_instances=3, max_rays_instances=64,
                    max_labels_per_image=8, batch_size_segments=2,
                    max_rays_segments=32, seed=0,
                    late_semantic_optimization=0,
                    instance_optimization_epoch=0,
                    segment_optimization_epoch=0)
    defaults.update(kw)
    return Config(**defaults).resolve_epochs()


def test_distilled_features_path(scene):
    cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=True,
                    use_distilled_features_semantic=True,
                    use_distilled_features_instance=True,
                    feature_stop_grad=True)
    state, metrics = _run_one_step(cfg, scene)
    assert "loss_feat" in metrics
    assert "feature" in state.params and "feature_mlp" in state.params


def test_proj_head_path(scene):
    cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=True,
                    use_proj=True)
    state, metrics = _run_one_step(cfg, scene)
    assert "proj" in state.params
    assert np.isfinite(float(metrics["loss_clustering"]))


def test_contrastive_use_delta_path(scene):
    cfg = _base_cfg(instance_loss_mode="contrastive", use_delta=True,
                    max_instances=3, temperature=100.0)
    state, metrics = _run_one_step(cfg, scene)
    assert np.isfinite(float(metrics["loss_clustering"]))


def test_symmetric_ce_path(scene):
    cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=True,
                    use_symmetric_ce=True, ce_alpha=0.85, ce_beta=0.15)
    _, metrics = _run_one_step(cfg, scene)
    assert np.isfinite(float(metrics["loss_semantics"]))


def test_segment_grouping_modes(scene):
    for mode in ("argmax_noconf", "prob_conf", "prob_noconf"):
        cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=True,
                        segment_grouping_mode=mode)
        _, metrics = _run_one_step(cfg, scene)
        assert np.isfinite(float(metrics["loss_segment"])), mode


def test_argmax_semantic_weight_mode(scene):
    cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=True,
                    semantic_weight_mode="argmax")
    _, metrics = _run_one_step(cfg, scene)
    assert np.isfinite(float(metrics["loss_semantics"]))


def test_slow_fast_without_dino_trains_slow_net(scene):
    """use_DINO_style=False: the slow net is optimizer-trained, not EMA-only."""
    cfg = _base_cfg(instance_loss_mode="slow_fast", use_DINO_style=False)
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (16,) * 3)
    from contrastive_lift_tpu.train.state import build_labels, INST_SLOW
    labels = build_labels(params, use_dino_style=False)
    leaf = labels["instance_mlp"]["slow"]["layers"][0]["w"]
    assert leaf == INST_SLOW
