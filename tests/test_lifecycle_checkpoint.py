"""Grid lifecycle (upsample / AABB shrink) + shape-morphing checkpoints."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from contrastive_lift_tpu.models import tensorf as tf
from contrastive_lift_tpu.renderer import occupancy as occ
from contrastive_lift_tpu.renderer import render as R


def _mini(grid=16, num_classes=3):
    cfg = Config(min_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", seed=0)
    return cfg, *build_model(cfg, num_classes, grid_dim=(grid,) * 3)


def test_upsample_preserves_field_values():
    cfg, mcfg, params, rcfg, state_r = _mini(12)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (64, 3)),
                      jnp.float32)
    before = tf.compute_density_raw(params, mcfg, xyz)
    up = tf.upsample_volume_grid(params, (23, 23, 23))
    after = tf.compute_density_raw(up, mcfg, xyz)
    assert tf.grid_dim_of(up) == (23, 23, 23)
    # bilinear align-corners upsample is near-exact at odd 2x-1 resolution
    np.testing.assert_allclose(np.asarray(after), np.asarray(before), atol=1e-4)


def test_shrink_crops_and_keeps_interior():
    cfg, mcfg, params, rcfg, state_r = _mini(16)
    shrunk = tf.shrink_volume_grid(params, (2, 3, 4), (14, 13, 12))
    assert tf.grid_dim_of(shrunk) == (12, 10, 8)


def test_target_resolution_and_voxel_schedule():
    state_r = R.make_render_state(
        np.array([[-1, -1, -1], [1, 1, 1]], np.float32), (16, 16, 16))
    res = occ.get_target_resolution(state_r, 20**3)
    assert res == (20, 20, 20)
    counts = occ.grid_upscale_voxel_counts(128, 192, 4)
    assert len(counts) == 4 and counts[-1] == 192**3
    assert all(counts[i] < counts[i + 1] for i in range(3))


def test_update_bbox_and_shrink_finds_occupied_region():
    cfg, mcfg, params, rcfg, state_r = _mini(24)
    # carve a density bump near the corner (+0.5,+0.5,+0.5) by boosting grids
    rng = np.random.default_rng(1)
    planes = list(params["density"]["planes"])
    lines = list(params["density"]["lines"])
    # make all factors strongly positive in the upper half of each axis
    for i in range(3):
        p = np.zeros(planes[i].shape, np.float32)
        p[:, p.shape[1] // 2:, p.shape[2] // 2:] = 3.0
        planes[i] = jnp.asarray(p)
        l = np.zeros(lines[i].shape, np.float32)
        l[:, l.shape[1] // 2:] = 3.0
        lines[i] = jnp.asarray(l)
    params["density"] = {"planes": tuple(planes), "lines": tuple(lines)}
    new_params, new_state, new_grid = occ.update_bbox_and_shrink(
        params, mcfg, state_r, (24, 24, 24))
    assert np.all(np.asarray(new_grid) <= 24)
    aabb = np.asarray(new_state.bbox_aabb)
    # occupied region is in the positive octant -> lower bound must move up
    assert np.all(aabb[0] > -0.6)
    assert tf.grid_dim_of(new_params) == tuple(new_grid)


def _resume_cfg(**over):
    base = dict(
        batch_size=256, chunk=256, min_grid_dim=14, max_grid_dim=20,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        max_rays_instances=64, max_labels_per_image=8,
        batch_size_segments=4, max_rays_segments=32, seed=0, lr=2e-3,
        late_semantic_optimization=0, instance_optimization_epoch=1,
        segment_optimization_epoch=99, grid_upscale_epochs=[1],
        bbox_aabb_reset_epochs=[], sanity_steps=0,
        save_every_n_train_steps=0, lambda_dist_reg=0.0,
        semantic_weight_mode="none", probabilistic_ce_mode="NoTTAConf",
        weight_class_0=1.0, use_mlp_for_semantics=False)
    base.update(over)
    from contrastive_lift_tpu.config import Config
    return Config(**base).resolve_epochs()


def test_resume_across_upscale_boundary(tmp_path):
    """Train across the grid-upscale epoch, checkpoint, resume in a FRESH
    Trainer: model must rebuild at the checkpoint grid_dim, optimizer state
    and epoch must restore, upscale must not replay, and the loss must
    continue without a spike (reference: on_load_checkpoint replays growth +
    Lightning restores optimizers, train_panopli_tensorf.py:461-470)."""
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.train.loop import Trainer

    scene = make_synthetic_scene(num_spheres=3, num_train=6, num_val=1,
                                 image_dim=(16, 16), seed=0)
    cfg = _resume_cfg()
    t1 = Trainer(cfg, scene, tmp_path / "run1", log_every=1000)
    t1.fit(max_epoch=2)  # epoch 1 upsamples 14^3 -> 20^3
    assert t1.grid_dim != (14, 14, 14), "upscale must have run"
    grid_after = t1.grid_dim
    step_after = t1.global_step
    ckpt = tmp_path / "run1" / "checkpoints" / "last.npz"
    assert ckpt.exists()
    # reference loss level at the end of run1
    rng = np.random.default_rng(123)
    probe = t1.main_sampler.sample(rng, cfg.batch_size)
    t1.state, m_end = t1._step_fn(t1.state, t1.state_r, probe, None, None,
                                  jax.random.PRNGKey(9), 1.0, 0.0)

    t2 = Trainer(_resume_cfg(), scene, tmp_path / "run2", log_every=1000)
    t2.restore(ckpt)
    assert t2.grid_dim == grid_after
    assert t2.start_epoch == 2
    assert t2.global_step == step_after
    # optimizer state restored (Adam moments nonzero, not a cold restart)
    leaves = jax.tree_util.tree_leaves(t2.state.opt_state_main)
    assert any(np.any(np.asarray(l) != 0) for l in leaves
               if hasattr(l, "shape") and getattr(l, "size", 0) > 1)
    # resuming must not replay the upscale nor error on shapes; loss continues
    # at the trained level (no cold-model spike)
    t2.on_epoch_start(2)
    assert t2.grid_dim == grid_after
    t2.state, m2 = t2._step_fn(t2.state, t2.state_r, probe, None, None,
                               jax.random.PRNGKey(9), 1.0, 0.0)
    np.testing.assert_allclose(float(m2["loss_rgb"]), float(m_end["loss_rgb"]),
                               rtol=0.2, atol=5e-3)
    # and training continues fine for another epoch
    t2.fit(max_epoch=3)
    assert t2.global_step > step_after


def test_checkpoint_roundtrip_with_shape_morph(tmp_path):
    cfg, mcfg, params, rcfg, state_r = _mini(12)
    params = tf.upsample_volume_grid(params, (17, 15, 13))
    path = tmp_path / "ck.npz"
    save_checkpoint(path, params, grid_dim=(17, 15, 13),
                    bbox_aabb=np.asarray(state_r.bbox_aabb), epoch=3,
                    global_step=1234, config_dict=cfg.to_dict())
    loaded, meta = load_checkpoint(path)
    assert meta["grid_dim"] == [17, 15, 13]
    assert meta["global_step"] == 1234
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params, loaded)
    # structure identical (tuples for planes/lines, lists for layers)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(loaded)
    # loaded params drive the renderer unchanged
    xyz = jnp.zeros((4, 3))
    a = tf.compute_density(params, mcfg, xyz)
    b = tf.compute_density(jax.tree.map(jnp.asarray, loaded), mcfg, xyz)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
