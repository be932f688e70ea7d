"""Occupancy maintenance: dense alpha evaluation, dilation, AABB shrink.

Reference: model/renderer/panopli_tensoRF_renderer.py:668-761. These run
between epochs (host-driven, shape-changing) so they stay out of the hot jit;
the dense density evaluation itself is jitted and sliced along x.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tensorf as tf
from .render import RenderState, make_render_state


@partial(jax.jit, static_argnames=("mcfg", "grid_dim"))
def dense_alpha(params, mcfg: tf.TensoRFConfig, state_r: RenderState,
                grid_dim: Tuple[int, int, int]):
    """Alpha = 1 - exp(-sigma * step) on the dense voxel lattice.

    Returns (alpha [gx,gy,gz], xyz [gx,gy,gz,3] world coords).
    """
    gx, gy, gz = grid_dim
    lin = [jnp.linspace(0.0, 1.0, g) for g in (gx, gy, gz)]
    grid = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1)  # [gx,gy,gz,3]
    xyz = state_r.bbox_aabb[0] * (1 - grid) + state_r.bbox_aabb[1] * grid

    def slice_alpha(xy_slice):
        norm = (xy_slice.reshape(-1, 3) - state_r.bbox_aabb[0]) \
            * state_r.inv_box_extent - 1.0
        sigma = tf.compute_density(params, mcfg, norm)
        return (1.0 - jnp.exp(-sigma * state_r.step_size)).reshape(gy, gz)

    alpha = jax.lax.map(slice_alpha, xyz)
    return alpha, xyz


def _max_pool3d(alpha: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3D max-pool dilation, stride 1, same padding (ref uses F.max_pool3d)."""
    pad = kernel // 2
    return jax.lax.reduce_window(
        alpha, -jnp.inf, jax.lax.max,
        window_dimensions=(kernel, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=((pad, pad), (pad, pad), (pad, pad)))


def update_bbox_and_shrink(params, mcfg: tf.TensoRFConfig, state_r: RenderState,
                           grid_dim: Tuple[int, int, int],
                           alpha_mask_threshold: float = 0.0075,
                           step_ratio: float = 0.5,
                           fractional_lenience: float = 1.0):
    """Recompute the occupied AABB and crop the factor grids to it.

    Returns (new_params, new_render_state, new_grid_dim) — or the inputs
    unchanged when no voxels are occupied. Reference: :668-715.
    """
    alpha, xyz = dense_alpha(params, mcfg, state_r, grid_dim)
    alpha = jnp.clip(alpha, 0.0, 1.0)
    dilated = _max_pool3d(alpha) >= alpha_mask_threshold
    occupied = np.asarray(dilated)
    xyz_np = np.asarray(xyz)

    if not occupied.any():
        return params, state_r, grid_dim

    valid = xyz_np[occupied]
    xyz_min = valid.min(axis=0)
    xyz_max = valid.max(axis=0)
    extent = xyz_max - xyz_min
    position = (xyz_min + xyz_max) / 2
    xyz_min = position - extent * fractional_lenience / 2
    xyz_max = position + extent * fractional_lenience / 2
    box_min = np.asarray(state_r.bbox_aabb[0])
    box_max = np.asarray(state_r.bbox_aabb[1])
    xyz_min = np.maximum(box_min, xyz_min)
    xyz_max = np.minimum(box_max, xyz_max)
    new_aabb = np.stack([xyz_min, xyz_max]).astype(np.float32)

    units = np.asarray(state_r.units)
    t_l = np.round(np.round((xyz_min - box_min) / units)).astype(np.int64)
    b_r = np.round((xyz_max - box_min) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, np.asarray(grid_dim))
    new_size = b_r - t_l
    if not np.all(new_size > 0):
        return params, state_r, grid_dim

    new_params = tf.shrink_volume_grid(params, t_l, b_r)
    new_grid_dim = tuple(int(s) for s in new_size)
    new_state = make_render_state(new_aabb, new_grid_dim, step_ratio)
    return new_params, new_state, new_grid_dim


def dense_sigma(params, mcfg: tf.TensoRFConfig, state_r: RenderState,
                grid_dim: Tuple[int, int, int], upsample: int = 1):
    """Dense density volume at (upsampled) grid resolution (reference :736-748)."""
    gx, gy, gz = (g * upsample for g in grid_dim)
    lin = [jnp.linspace(0.0, 1.0, g) for g in (gx, gy, gz)]
    grid = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1)
    xyz = state_r.bbox_aabb[0] * (1 - grid) + state_r.bbox_aabb[1] * grid

    def slice_sigma(xy_slice):
        norm = (xy_slice.reshape(-1, 3) - state_r.bbox_aabb[0]) \
            * state_r.inv_box_extent - 1.0
        return tf.compute_density(params, mcfg, norm).reshape(gy, gz)

    return jax.lax.map(slice_sigma, xyz)


def get_instance_clusters(params, mcfg: tf.TensoRFConfig, state_r: RenderState,
                          grid_dim: Tuple[int, int, int], mode: str = "alpha",
                          alpha_mask_threshold: float = 0.0075,
                          max_samples: Optional[int] = None, seed: int = 0):
    """Dense-grid instance argmax -> labeled surface point cloud for debugging.

    Returns (xyz [N,3], labels [N]). Reference: panopli_tensoRF_renderer.py:
    636-666; export via utils.points.save_obj_points + utils.colors.
    """
    import numpy as np
    alpha, xyz = dense_alpha(params, mcfg, state_r, grid_dim)
    xyz_flat = np.asarray(xyz).reshape(-1, 3)
    alpha_flat = np.clip(np.asarray(alpha).reshape(-1), 0, 1)
    norm = (jnp.asarray(xyz_flat) - state_r.bbox_aabb[0]) \
        * state_r.inv_box_extent - 1.0
    # chunked head evaluation over the dense lattice
    labels = []
    for i in range(0, norm.shape[0], 262144):
        feats = tf.render_instances(params, mcfg, norm[i:i + 262144])
        half = (mcfg.dim_feature_instance // 2 if mcfg.slow_fast_mode
                else mcfg.dim_feature_instance)
        labels.append(np.asarray(jnp.argmax(feats[:, :half], axis=-1)))
    labels = np.concatenate(labels)
    if mode == "alpha":
        keep = alpha_flat >= alpha_mask_threshold
        default_cap = 2 ** 18
    else:
        keep = np.ones_like(alpha_flat, bool)
        default_cap = 2 ** 16
    xyz_keep, labels_keep = xyz_flat[keep], labels[keep]
    cap = max_samples or default_cap
    if len(xyz_keep) > cap:
        sel = np.random.default_rng(seed).choice(len(xyz_keep), cap, False)
        xyz_keep, labels_keep = xyz_keep[sel], labels_keep[sel]
    return xyz_keep, labels_keep


def export_instance_clusters(params, mcfg, state_r, grid_dim, output_dir):
    """Colored OBJ point clouds of the clustered field (reference :775-782)."""
    from pathlib import Path
    from ..utils.colors import DistinctColors
    from ..utils.points import save_obj_points
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    dc = DistinctColors()
    for mode in ("alpha", "full"):
        xyz, labels = get_instance_clusters(params, mcfg, state_r, grid_dim, mode)
        save_obj_points(out / f"{mode}.obj", xyz, dc.apply(labels))


def get_target_resolution(state_r: RenderState, n_voxels: int) -> Tuple[int, int, int]:
    """Resolution with ~n_voxels total, proportional to the AABB extent.

    Reference: :756-761.
    """
    aabb = np.asarray(state_r.bbox_aabb)
    extent = aabb[1] - aabb[0]
    voxel_size = float((np.prod(extent) / n_voxels) ** (1 / 3))
    res = np.int64(extent / voxel_size)
    return tuple(int(max(r, 1)) for r in res)


def grid_upscale_voxel_counts(min_grid_dim: int, max_grid_dim: int,
                              num_upscales: int):
    """Log-spaced voxel-count schedule (reference: trainer :450-452)."""
    counts = np.exp(np.linspace(np.log(min_grid_dim**3), np.log(max_grid_dim**3),
                                num_upscales + 1))
    return [int(round(c)) for c in counts[1:]]
