"""Calibration pipeline: sweep grids, thing folding, bandwidth search flow."""
import numpy as np
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.inference.calibrate import (
    extract_train_centroids, find_bandwidth, modify_things_to_singleclass,
    sweep_values)


def test_sweep_values_match_reference_grids():
    cfg = Config(max_instances=3, dataset_class="panopli")
    vals = sweep_values(cfg, use_dbscan=False, is_mos=False)
    top = np.sqrt(3) / 3.5
    assert len(vals) == 25  # arange(top/25, top, top/25)
    np.testing.assert_allclose(vals[0], top / 25)
    vals_mos = sweep_values(cfg, use_dbscan=False, is_mos=True)
    assert len(vals_mos) == 50
    db = sweep_values(cfg, use_dbscan=True, is_mos=False)
    assert db[0] == 250 and db[-1] == 2950
    db_mos = sweep_values(cfg, use_dbscan=True, is_mos=True)
    assert db_mos[0] == 10 and db_mos[-1] == 190


def test_modify_things_to_singleclass():
    sem = np.zeros((6, 4), np.float32)
    sem[np.arange(6), [0, 1, 2, 3, 1, 0]] = 1.0
    out = modify_things_to_singleclass(sem, thing_classes=[2, 3])
    labels = out.argmax(-1)
    np.testing.assert_array_equal(labels, [0, 1, 2, 2, 1, 0])


@pytest.mark.slow
def test_find_bandwidth_and_centroids_flow(tmp_path):
    """End-to-end calibration on a (briefly trained) synthetic model."""
    import jax
    from contrastive_lift_tpu.data.base import RayPoolSampler
    from contrastive_lift_tpu.factory import class_weights_for
    from contrastive_lift_tpu.train.state import init_train_state
    from contrastive_lift_tpu.train.step import TrainGates, make_train_step

    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(20, 24), num_thing_classes=1,
                                 seed=5)
    cfg = Config(batch_size=256, min_grid_dim=16, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 image_dim=(20, 24), lr=2e-3, seed=0,
                 weight_class_0=1.0, semantic_weight_mode="none",
                 use_mlp_for_semantics=False,
                 probabilistic_ce_mode="NoTTAConf", lambda_depth=0.5,
                 late_semantic_optimization=0,
                 instance_optimization_epoch=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (16,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes,
                             load_depth=True)
    from contrastive_lift_tpu.data.base import InstanceBundleSampler
    inst_s = InstanceBundleSampler(scene.train_frames, 128, 8)
    step = make_train_step(cfg, mcfg, rcfg,
                           TrainGates(semantics_on=True, instances_on=True),
                           weights, params)
    nrng = np.random.default_rng(0)
    for i in range(30):
        state, _ = step(state, state_r, sampler.sample(nrng, 256),
                        inst_s.sample(nrng, 1), None,
                        jax.random.PRNGKey(i), 1.0, 0.0)

    result = find_bandwidth(
        state.params, mcfg, rcfg, state_r, cfg, scene.train_frames[:2],
        scene.segmentation.fg_classes, chunk=512,
        sweep=np.array([0.1, 0.3]), output_dir=tmp_path)
    assert (tmp_path / "all_thing_features_train.npy").exists()
    assert result["mode"] == "bandwidth"
    assert len(result["curve"]) <= 2  # failed values are skipped gracefully

    centroids = extract_train_centroids(
        state.params, mcfg, rcfg, state_r, cfg, scene.train_frames[:2],
        scene.segmentation.fg_classes, bandwidth=0.3, chunk=512,
        output_path=tmp_path / "all_centroids.pkl")
    assert (tmp_path / "all_centroids.pkl").exists()
    for cls, cents in centroids.items():
        assert cents.shape[1] == cfg.max_instances
