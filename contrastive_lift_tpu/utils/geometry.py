"""Camera / ray geometry (pure JAX, CPU-testable).

Covers the capability surface of the reference's util/ray.py and util/camera.py:
pinhole ray generation, unit-sphere far plane, frustum-union scene
normalization, distance<->depth conversion, (un)projection, and Newton-iteration
radial/tangential undistortion. Everything is functional and jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pixel_grid(height: int, width: int):
    """Pixel-center (i=x, j=y) grids of shape [H, W].

    Matches the reference convention (reference: util/ray.py:8-12) where the
    returned i varies along width and j along height.
    """
    i = jnp.tile(jnp.arange(width, dtype=jnp.float32)[None, :], (height, 1))
    j = jnp.tile(jnp.arange(height, dtype=jnp.float32)[:, None], (1, width))
    return i, j


def ray_directions_from_intrinsics(height: int, width: int, intrinsics) -> jnp.ndarray:
    """Per-pixel camera-space ray directions [H, W, 3] for a pinhole camera.

    Convention: +z forward, unnormalized (reference: util/ray.py:25-31).
    """
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    i, j = pixel_grid(height, width)
    return jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)


def ray_directions_undistorted(height: int, width: int, intrinsics, distortion) -> jnp.ndarray:
    """Ray directions with radial/tangential undistortion (k1,k2,k3,k4).

    Reference: util/ray.py:34-43.
    """
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    i, j = pixel_grid(height, width)
    x = (i - cx) / fx
    y = (j - cy) / fy
    x, y = radial_tangential_undistort(x, y, *distortion)
    return jnp.stack([x, y, jnp.ones_like(i)], axis=-1)


def rays_world(directions, cam2world):
    """World-space (origins, normalized directions), each [N, 3].

    Reference: util/ray.py:46-54.
    """
    cam2world = jnp.asarray(cam2world, jnp.float32)
    directions = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    rays_d = directions @ cam2world[:3, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(cam2world[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_intersect_sphere(rays_o, rays_d, radius: float = 1.0):
    """Forward intersection distance t with the sphere ||o + t d|| = radius.

    Callers must guarantee cameras are inside the sphere (the reference asserts
    this, util/ray.py:81-99); here a non-negative clamp keeps it jit-safe and a
    NaN would surface downstream if the precondition is violated.
    """
    odotd = jnp.sum(rays_o * rays_d, axis=-1)
    d_norm_sq = jnp.sum(rays_d**2, axis=-1)
    o_norm_sq = jnp.sum(rays_o**2, axis=-1)
    determinant = odotd**2 + (radius**2 - o_norm_sq) * d_norm_sq
    return (jnp.sqrt(determinant) - odotd) / d_norm_sq


def make_ray_bundle(directions, cam2world, near: float = 0.01):
    """Assemble the 8-float ray layout [o(3) d(3) near far] used everywhere.

    far = unit-sphere exit distance (reference: dataset/base.py:216-219).
    """
    rays_o, rays_d = rays_world(directions, cam2world)
    far = rays_intersect_sphere(rays_o, rays_d, 1.0)
    near_col = jnp.full_like(far, near)
    return jnp.concatenate([rays_o, rays_d, near_col[:, None], far[:, None]], axis=-1)


def ndc_rays(height: int, width: int, focal_length: float, near: float,
             rays_o, rays_d):
    """Shift rays to the near plane and project into NDC space.

    Reference: util/ray.py:57-78 (forward-facing capture support).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (width / (2.0 * focal_length)) * ox_oz
    o1 = -1.0 / (height / (2.0 * focal_length)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (width / (2.0 * focal_length)) * (
        rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (height / (2.0 * focal_length)) * (
        rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


# ---------------------------------------------------------------------------
# Scene normalization: fit the union of camera frustums into the unit sphere.
# Reference: util/camera.py:10-73.
# ---------------------------------------------------------------------------

def frustum_world_sphere(dims, intrinsics, cam2worlds, max_depth: float):
    """(center, radius) of a sphere containing all camera frustums.

    dims [N,2] (h,w); intrinsics [N,3,3]; cam2worlds [N,4,4]. Numpy, host-side.
    """
    dims = np.asarray(dims, np.float32)
    intrinsics = np.asarray(intrinsics, np.float32)
    cam2worlds = np.asarray(cam2worlds, np.float32)
    n = len(dims)
    # three homogeneous image-corner skeleton points in (h, w, 1) order
    h_img_corners = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 1]], np.float32)
    intr_hw = intrinsics[:, [1, 0, 2]]  # K rows are WH-major -> convert to HW
    intr_inv = np.linalg.inv(intr_hw)
    hw1 = np.concatenate([dims, np.ones((n, 1), np.float32)], axis=1)  # [N,3]
    skel = hw1[:, None, :] * h_img_corners[None, :, :]                 # [N,3,3]
    corners_far = np.einsum("nij,nkj->nki", intr_inv, skel) * max_depth
    corners_near = np.einsum("nij,nkj->nki", intr_inv, skel) * 0.01
    corners = np.concatenate([corners_far, corners_near], axis=0)      # [2N,3,3]
    corners_h = np.concatenate([corners, np.ones((*corners.shape[:2], 1), np.float32)], -1)
    c2w2 = np.concatenate([cam2worlds, cam2worlds], axis=0)
    world = np.einsum("nij,nkj->nki", c2w2, corners_h).reshape(-1, 4)[:, :3]
    center = world.mean(axis=0)
    radius = np.linalg.norm(world - center, axis=1).max()
    return center, radius


def compute_world2normscene(dims, intrinsics, cam2worlds, max_depth: float,
                            rescale_factor: float = 1.0) -> np.ndarray:
    """4x4 transform scaling the scene so all frustums fit in the unit sphere.

    Reference: util/camera.py:56-73.
    """
    assert rescale_factor >= 1.0
    center, radius = frustum_world_sphere(dims, intrinsics, cam2worlds, max_depth)
    scale = 1.0 / (rescale_factor * radius)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] *= scale
    transform[:3, 3] = -center * scale
    return transform


# ---------------------------------------------------------------------------
# Distance <-> depth
# ---------------------------------------------------------------------------

def distance_to_depth(intrinsics, dist, height: int, width: int):
    """Convert per-pixel ray-distance to z-depth. dist flat [H*W] or [H,W].

    Reference: util/camera.py:86-104.
    """
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    dist = jnp.asarray(dist).reshape(-1)
    i, j = pixel_grid(height, width)
    uvh = jnp.stack([i.reshape(-1), j.reshape(-1), jnp.ones(height * width)], axis=-1)
    pts = uvh @ jnp.linalg.inv(intrinsics).T
    return dist / jnp.linalg.norm(pts, axis=-1)


def depth_to_distance(intrinsics, depth, height: int, width: int):
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    depth = jnp.asarray(depth).reshape(-1)
    i, j = pixel_grid(height, width)
    uvh = jnp.stack([i.reshape(-1), j.reshape(-1), jnp.ones(height * width)], axis=-1)
    pts = uvh @ jnp.linalg.inv(intrinsics).T
    return depth * jnp.linalg.norm(pts, axis=-1)


def unproject_2d_3d(cam2world, intrinsics, depth, height: int, width: int):
    """Back-project a depth map into world points [H*W, 3]."""
    cam2world = jnp.asarray(cam2world, jnp.float32)
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    i, j = pixel_grid(height, width)
    uvh = jnp.stack([i.reshape(-1), j.reshape(-1), jnp.ones(height * width)], axis=-1)
    cam_pts = (uvh @ jnp.linalg.inv(intrinsics).T) * jnp.reshape(depth, (-1, 1))
    return cam_pts @ cam2world[:3, :3].T + cam2world[:3, 3]


def project_3d_2d(cam2world, intrinsics, world_points):
    """Project world points to pixel coords [N, 2] (continuous)."""
    cam2world = jnp.asarray(cam2world, jnp.float32)
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    world2cam = jnp.linalg.inv(cam2world)
    pts_h = jnp.concatenate([world_points, jnp.ones_like(world_points[:, :1])], -1)
    cam = (pts_h @ world2cam.T)[:, :3]
    img = cam @ intrinsics.T
    return img[:, :2] / img[:, 2:3]


# ---------------------------------------------------------------------------
# Undistortion (Newton iterations) — reference: util/camera.py:213-277
# ---------------------------------------------------------------------------

def _undistort_residual_jacobian(x, y, xd, yd, k1, k2, k3, k4, p1, p2):
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r
    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_tangential_undistort(xd, yd, k1=0.0, k2=0.0, k3=0.0, k4=0.0,
                                p1=0.0, p2=0.0, eps=1e-9, max_iterations=10):
    xd = jnp.asarray(xd, jnp.float32)
    yd = jnp.asarray(yd, jnp.float32)

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _undistort_residual_jacobian(
            x, y, xd, yd, k1, k2, k3, k4, p1, p2)
        denom = fy_x * fx_y - fx_x * fy_y
        step_x = jnp.where(jnp.abs(denom) > eps, (fx * fy_y - fy * fx_y) / denom, 0.0)
        step_y = jnp.where(jnp.abs(denom) > eps, (fy * fx_x - fx * fy_x) / denom, 0.0)
        return x + step_x, y + step_y

    return jax.lax.fori_loop(0, max_iterations, body, (xd, yd))
