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
