"""Unit tests: alpha compositing, distortion loss, ray geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.ops.compositing import (composite, distortion_loss,
                                                  raw_to_alpha)
from contrastive_lift_tpu.utils import geometry as geo


def test_raw_to_alpha_hand_computed():
    sigma = jnp.array([[1.0, 2.0, 0.0]])
    dist = jnp.array([[0.5, 0.5, 0.5]])
    alpha, weights, bg = raw_to_alpha(sigma, dist)
    a = 1 - np.exp(-np.array([0.5, 1.0, 0.0]))
    t = np.cumprod(np.concatenate([[1.0], 1 - a + 1e-10]))
    np.testing.assert_allclose(np.asarray(alpha[0]), a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(weights[0]), a * t[:-1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bg[0]), t[-1:], rtol=1e-5, atol=1e-6)


def test_weights_sum_plus_bg_is_one():
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 5, (7, 33)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.01, 0.2, (7, 33)).astype(np.float32))
    _, weights, bg = raw_to_alpha(sigma, dist)
    total = np.asarray(jnp.sum(weights, -1) + bg[:, 0])
    np.testing.assert_allclose(total, np.ones(7), atol=1e-5)


def test_distortion_loss_matches_quadratic_form():
    """O(S) prefix-sum form == naive O(S^2) double sum."""
    rng = np.random.default_rng(1)
    w = rng.uniform(0, 0.2, (5, 16)).astype(np.float32)
    m = np.sort(rng.uniform(0, 1, (5, 16)).astype(np.float32), axis=-1)
    d = rng.uniform(0.01, 0.1, (5, 16)).astype(np.float32)
    naive = np.mean(
        np.sum(w[:, :, None] * w[:, None, :] * np.abs(m[:, :, None] - m[:, None, :]),
               axis=(1, 2))
        + np.sum(w * w * d, axis=-1) / 3.0)
    ours = float(distortion_loss(jnp.asarray(w), jnp.asarray(m), jnp.asarray(d)))
    np.testing.assert_allclose(ours, naive, rtol=1e-4)


def test_composite():
    w = jnp.array([[0.25, 0.75]])
    v = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    np.testing.assert_allclose(np.asarray(composite(w, v)[0]), [0.25, 0.75])


def test_ray_directions_center_pixel():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    dirs = np.asarray(geo.ray_directions_from_intrinsics(48, 64, K))
    assert dirs.shape == (48, 64, 3)
    # pixel (x=32, y=24) passes through the optical axis
    np.testing.assert_allclose(dirs[24, 32], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(dirs[24, 42], [0.1, 0, 1], atol=1e-6)


def test_rays_world_normalized():
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.2, 0.3]
    dirs = geo.ray_directions_from_intrinsics(24, 32, K)
    o, d = geo.rays_world(dirs, c2w)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o[0]), [0.1, -0.2, 0.3], atol=1e-6)


def test_sphere_intersection():
    o = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    t = np.asarray(geo.rays_intersect_sphere(o, d, 1.0))
    np.testing.assert_allclose(t, [1.0, 0.5], atol=1e-6)
    # exit point lies on the sphere
    p = np.asarray(o) + t[:, None] * np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, atol=1e-6)


def test_scene_normalization_contains_cameras():
    rng = np.random.default_rng(2)
    n = 5
    dims = np.full((n, 2), [48, 64], np.float32)
    K = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32), (n, 1, 1))
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2ws[:, :3, 3] = rng.uniform(-2, 2, (n, 3))
    w2n = geo.compute_world2normscene(dims, K, c2ws, max_depth=4.0)
    cams_h = np.concatenate([c2ws[:, :3, 3], np.ones((n, 1))], -1)
    cams_n = (w2n @ cams_h.T).T[:, :3]
    assert np.all(np.linalg.norm(cams_n, axis=-1) < 1.0)


def test_distance_depth_roundtrip():
    K = np.array([[80.0, 0, 20], [0, 80.0, 15], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 3.0, (30, 40)).astype(np.float32)
    dist = geo.depth_to_distance(K, depth, 30, 40)
    back = geo.distance_to_depth(K, dist, 30, 40)
    np.testing.assert_allclose(np.asarray(back), depth.reshape(-1), rtol=1e-5)


def test_undistort_identity_when_no_distortion():
    x = jnp.linspace(-0.5, 0.5, 11)
    y = jnp.linspace(-0.3, 0.3, 11)
    xu, yu = geo.radial_tangential_undistort(x, y)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-6)


def test_undistort_inverts_distortion():
    k1, k2 = 0.1, -0.05
    x = np.linspace(-0.4, 0.4, 9).astype(np.float32)
    y = np.linspace(-0.3, 0.3, 9).astype(np.float32)
    r = x * x + y * y
    d = 1 + k1 * r + k2 * r * r
    xd, yd = x * d, y * d
    xu, yu = geo.radial_tangential_undistort(jnp.asarray(xd), jnp.asarray(yd), k1=k1, k2=k2)
    np.testing.assert_allclose(np.asarray(xu), x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yu), y, atol=1e-5)
