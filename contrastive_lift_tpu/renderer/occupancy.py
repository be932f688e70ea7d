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
