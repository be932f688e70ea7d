"""Scene-editing render ops and bounding-box estimation."""
import numpy as np
import jax.numpy as jnp
import pytest

from contrastive_lift_tpu.inference import bboxes as B
from contrastive_lift_tpu.renderer.editing import (EditKind,
                                                   points_in_oriented_box,
                                                   render_edited)
from contrastive_lift_tpu.utils.transforms import (dot, hmg, inverse_rigid,
                                                   tr_comp, trs_comp)


def test_transforms_roundtrip():
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t = trs_comp([1, 2, 3], rot, 1.0)
    pts = np.array([[1.0, 0, 0]], np.float32)
    out = dot(t, pts)
    np.testing.assert_allclose(out, [[1, 3, 3]], atol=1e-6)
    inv = inverse_rigid(t)
    back = dot(inv, out)
    np.testing.assert_allclose(back, pts, atol=1e-6)
    assert hmg(rot).shape == (4, 4)
    assert tr_comp([0, 0, 0], rot)[3, 3] == 1.0


def test_points_in_oriented_box():
    pts = jnp.asarray(np.array([[0, 0, 0], [0.4, 0, 0], [0, 0.9, 0],
                                [2, 2, 2]], np.float32))
    # box rotated 90deg about z with extent (1, 0.5, 1): local x <- world y
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    mask = np.asarray(points_in_oriented_box(pts, [2.0, 0.5, 1.0],
                                             [0, 0, 0], rot))
    assert mask[0] and mask[2] and not mask[3]
    assert not mask[1]  # 0.4 along world-x maps to local-y > 0.25


@pytest.fixture(scope="module")
def trained_scene():
    import jax
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.base import RayPoolSampler
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.factory import build_model, class_weights_for
    from contrastive_lift_tpu.train.state import init_train_state
    from contrastive_lift_tpu.train.step import TrainGates, make_train_step

    scene = make_synthetic_scene(num_spheres=2, num_train=4, num_val=1,
                                 image_dim=(20, 24), seed=7)
    cfg = Config(batch_size=256, min_grid_dim=20, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 lr=2e-3, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (20,) * 3)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    step = make_train_step(cfg, mcfg, rcfg, TrainGates(semantics_on=False),
                           class_weights_for(cfg, scene.segmentation), params)
    nrng = np.random.default_rng(0)
    for i in range(20):
        state, _ = step(state, state_r, sampler.sample(nrng, 256), None, None,
                        jax.random.PRNGKey(i), 1.0, 0.0)
    return scene, mcfg, state.params, rcfg, state_r


def test_delete_reduces_opacity(trained_scene):
    scene, mcfg, params, rcfg, state_r = trained_scene
    rays = scene.val_frames[0].rays[:200]
    from contrastive_lift_tpu.renderer import render as R
    plain = R.render_rays(params, mcfg, rcfg, state_r, jnp.asarray(rays))
    # delete everything: a box covering the whole scene
    out = render_edited(params, mcfg, rcfg, state_r, rays, EditKind.DELETE,
                        {"extent": [4, 4, 4], "position": [0, 0, 0],
                         "orientation": np.eye(3, dtype=np.float32)})
    assert float(np.asarray(out["depth"]).sum()) < \
        float(np.asarray(plain["depth"]).sum()) * 0.01


def test_extract_keeps_only_box(trained_scene):
    scene, mcfg, params, rcfg, state_r = trained_scene
    rays = scene.val_frames[0].rays[:200]
    full = render_edited(params, mcfg, rcfg, state_r, rays, EditKind.EXTRACT,
                         {"extent": [4, 4, 4], "position": [0, 0, 0],
                          "orientation": np.eye(3, dtype=np.float32)})
    none = render_edited(params, mcfg, rcfg, state_r, rays, EditKind.EXTRACT,
                         {"extent": [1e-4] * 3, "position": [5, 5, 5],
                          "orientation": np.eye(3, dtype=np.float32)})
    assert float(np.asarray(none["depth"]).sum()) < \
        float(np.asarray(full["depth"]).sum()) * 0.01


def test_duplicate_and_manipulate_run(trained_scene):
    scene, mcfg, params, rcfg, state_r = trained_scene
    rays = scene.val_frames[0].rays[:100]
    bbox = {"extent": [0.4, 0.4, 0.4], "position": [0.0, 0.0, 0.0],
            "orientation": np.eye(3, dtype=np.float32)}
    for kind in (EditKind.DUPLICATE, EditKind.MANIPULATE):
        out = render_edited(params, mcfg, rcfg, state_r, rays, kind, bbox,
                            translation=[0.2, 0.0, 0.0],
                            rotation=np.eye(3, dtype=np.float32))
        assert np.isfinite(np.asarray(out["rgb"])).all()


# ---------------------------------------------------------------------------
# Bounding boxes
# ---------------------------------------------------------------------------

def _rotated_box_points(rng, center, half_extent, angle, n=500):
    local = rng.uniform(-1, 1, (n, 3)) * half_extent
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return local @ rot.T + center


def test_aabb_and_pca_boxes():
    rng = np.random.default_rng(0)
    pts = _rotated_box_points(rng, [1, 2, 3], [0.5, 0.2, 0.1], 0.0)
    box = B.axis_aligned_box(pts)
    np.testing.assert_allclose(box["position"], [1, 2, 3], atol=0.05)
    np.testing.assert_allclose(box["extent"], [1.0, 0.4, 0.2], atol=0.05)
    pca = B.pca_box(pts)
    # PCA axes of a near-axis-aligned cloud give a box of comparable volume
    assert np.prod(pca["extent"]) <= np.prod(box["extent"]) * 1.5


def test_mbr_recovers_rotation():
    rng = np.random.default_rng(1)
    angle = 0.5
    pts = _rotated_box_points(rng, [0, 0, 0], [0.8, 0.3, 0.2], angle, n=2000)
    box = B.mbr_box(pts)
    vol = np.prod(box["extent"])
    aabb_vol = np.prod(B.axis_aligned_box(pts)["extent"])
    assert vol < aabb_vol * 0.85  # rotated box is much tighter than AABB
    np.testing.assert_allclose(sorted(box["extent"][:2]), [0.6, 1.6], atol=0.05)


def test_min_volume_ellipsoid_contains_points():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 3))
    a, c = B.min_volume_ellipsoid(pts)
    vals = np.einsum("ni,ij,nj->n", pts - c, a, pts - c)
    assert np.all(vals <= 1.0 + 1e-2)


def test_instance_bounding_boxes():
    rng = np.random.default_rng(3)
    pts1 = _rotated_box_points(rng, [0, 0, 0], [0.2, 0.2, 0.2], 0.0, 300)
    pts2 = _rotated_box_points(rng, [2, 0, 0], [0.3, 0.1, 0.1], 0.7, 300)
    points = np.concatenate([pts1, pts2])
    ids = np.concatenate([np.full(300, 1), np.full(300, 2)])
    boxes = B.instance_bounding_boxes(points, ids, method="mbr")
    assert set(boxes) == {1, 2}
    np.testing.assert_allclose(boxes[2]["position"][0], 2.0, atol=0.1)
