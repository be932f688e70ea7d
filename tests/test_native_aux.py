"""Native raypool parity + observability/points/trajectory utilities."""
import numpy as np
import pytest

from contrastive_lift_tpu.data import native
from contrastive_lift_tpu.data.trajectory import (rays_for_poses,
                                                  spherical_orbit)
from contrastive_lift_tpu.utils import geometry as geo
from contrastive_lift_tpu.utils.observability import (PhaseTimer,
                                                      parameter_counts,
                                                      scrub_nan_grads)
from contrastive_lift_tpu.utils.points import (camera_frustum_points,
                                               save_obj_points, save_ply)


def test_native_build_rays_matches_jax():
    if not native.native_available():
        pytest.skip("no native toolchain")
    K = np.array([[55.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.2, -0.1, 0.3]
    c2w[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    ours = native.build_rays(24, 32, K, c2w)
    dirs = geo.ray_directions_from_intrinsics(24, 32, K)
    ref = np.asarray(geo.make_ray_bundle(dirs, c2w))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_native_gather_rows():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1000, 8)).astype(np.float32)
    idx = rng.integers(0, 1000, 257)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])
    src_i = rng.integers(0, 100, (500, 3)).astype(np.int32)
    idx_i = rng.integers(0, 500, 100)
    np.testing.assert_array_equal(native.gather_rows(src_i, idx_i),
                                  src_i[idx_i])


def test_native_sample_indices_deterministic():
    a = native.sample_indices(10_000, 512, seed=7)
    b = native.sample_indices(10_000, 512, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() < 10_000
    # roughly uniform
    assert len(np.unique(a)) > 400


def test_scrub_nan_grads():
    import jax.numpy as jnp
    grads = {"a": jnp.array([1.0, jnp.nan, jnp.inf]),
             "b": {"c": jnp.array([-jnp.inf, 2.0])}}
    out = scrub_nan_grads(grads)
    np.testing.assert_array_equal(np.asarray(out["a"]), [1.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(out["b"]["c"]), [0.0, 2.0])


def test_parameter_counts():
    import jax.numpy as jnp
    params = {"density": {"planes": (jnp.zeros((2, 3, 4)),)},
              "mlp": {"layers": [{"w": jnp.zeros((5, 6)), "b": jnp.zeros(6)}]}}
    counts = parameter_counts(params)
    assert counts["density"] == 24
    assert counts["mlp"] == 36
    assert counts["total"] == 60


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("x"):
        pass
    with t.phase("x"):
        pass
    s = t.summary()
    assert s["x"]["count"] == 2


def test_point_export(tmp_path):
    pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(10, 3))
    save_ply(tmp_path / "p.ply", pts, cols)
    text = (tmp_path / "p.ply").read_text()
    assert "element vertex 10" in text
    save_obj_points(tmp_path / "p.obj", pts)
    assert (tmp_path / "p.obj").read_text().count("\nv ") == 9


def test_camera_pose_figure(tmp_path):
    # frustum-pyramid figure (reference camera_pose_visualizer.py:55-173)
    pytest.importorskip("matplotlib")
    from contrastive_lift_tpu.utils.points import plot_camera_poses
    poses = np.stack([np.eye(4)] * 4)
    poses[:, 1, 3] = np.arange(4.0)  # spread along y -> alpha depth cue
    plot_camera_poses(tmp_path / "poses.png", poses, color_by_index=True)
    assert (tmp_path / "poses.png").stat().st_size > 1000


def test_camera_frustum_and_orbit():
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    c2w = np.eye(4)
    pts = camera_frustum_points(c2w, K, (24, 32))
    assert pts.shape == (5, 3)
    poses = spherical_orbit(8, radius=0.7)
    assert len(poses) == 8
    frames = rays_for_poses(poses, K.astype(np.float32), (12, 16))
    assert frames[0].rays.shape == (12 * 16, 8)
    # rays normalized: far = sphere exit
    exit_pts = frames[0].rays[:, :3] + frames[0].rays[:, 7:8] * frames[0].rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(exit_pts, axis=-1), 1.0, atol=1e-4)
