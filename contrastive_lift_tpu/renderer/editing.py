"""Scene-editing render passes: delete / extract / duplicate / manipulate.

Reference: model/renderer/panopli_tensoRF_renderer.py:302-623,785-797. Objects
are selected by oriented 3D bounding boxes; edits act by zeroing density
inside (or outside) the box and/or warping sample coordinates + view
directions. All passes are no-grad, static-shape, jit-friendly — the
reference's four near-identical 120-line forwards collapse into one core with
an edit spec.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import tensorf as tf
from ..ops.compositing import composite, raw_to_alpha
from ..utils.transforms import inverse_rigid, trs_comp
from .render import (RenderConfig, RenderState, _head_weights,
                     _semantic_map_postprocess, normalize_coordinates,
                     sample_points_in_box)


@dataclass(frozen=True)
class EditKind:
    DELETE = "delete"
    EXTRACT = "extract"
    DUPLICATE = "duplicate"
    MANIPULATE = "manipulate"


def points_in_oriented_box(xyz: jnp.ndarray, extent, position, orientation):
    """Mask of points inside an oriented box (reference: split_points_minimal
    :785-797): inverse-transform points then test |p_i| <= extent_i/2."""
    extent = jnp.asarray(extent, jnp.float32)
    tr = trs_comp(jnp.asarray(position), jnp.asarray(orientation), 1.0)
    inv = inverse_rigid(jnp.asarray(tr))
    local = xyz @ inv[:3, :3].T + inv[:3, 3]
    return jnp.all(jnp.abs(local) <= extent / 2.0, axis=-1)


def render_edited(params, mcfg: tf.TensoRFConfig, rcfg: RenderConfig,
                  state: RenderState, rays: jnp.ndarray, kind: str,
                  bbox: dict, translation=None, rotation=None,
                  white_bg: bool = False):
    """One edited render pass.

    bbox: {"extent": [3], "position": [3], "orientation": [3,3]}.
    delete: zero density inside the box (reference :302-376);
    extract: zero density outside (reference :378-453);
    duplicate: warp samples inside the translated box back to the source so
      the object appears twice (reference :455-536);
    manipulate: move/rotate the object — samples in the target box map back
      into the source box, source-box leftovers are cleared (reference :538-623).
    """
    rays = jnp.asarray(rays, jnp.float32)
    xyz, z_vals, in_box = sample_points_in_box(
        rays, state, rcfg.n_samples, 0.0, None, False)
    R, S = z_vals.shape
    flat_world = xyz.reshape(-1, 3)
    viewdirs = jnp.broadcast_to(rays[:, None, 3:6], (R, S, 3)).reshape(-1, 3)

    extent = jnp.asarray(bbox["extent"], jnp.float32)
    position = jnp.asarray(bbox["position"], jnp.float32)
    orientation = jnp.asarray(bbox["orientation"], jnp.float32)
    translation = (jnp.zeros(3, jnp.float32) if translation is None
                   else jnp.asarray(translation, jnp.float32))
    rotation = (jnp.eye(3, dtype=jnp.float32) if rotation is None
                else jnp.asarray(rotation, jnp.float32))

    zero_sigma_mask = jnp.zeros(flat_world.shape[0], bool)
    warped = flat_world
    warped_dirs = viewdirs

    if kind == EditKind.DELETE:
        inside = points_in_oriented_box(flat_world, extent, position, orientation)
        zero_sigma_mask = inside
    elif kind == EditKind.EXTRACT:
        inside = points_in_oriented_box(flat_world, extent, position, orientation)
        zero_sigma_mask = ~inside
    elif kind == EditKind.DUPLICATE:
        target_pos = rotation @ position + translation
        target_orient = rotation @ orientation
        moved = points_in_oriented_box(flat_world, extent, target_pos, target_orient)
        inv_rot = jnp.linalg.inv(rotation)
        back = (flat_world - translation)
        warped = jnp.where(moved[:, None], back, flat_world)
        warped_dirs = jnp.where(moved[:, None], viewdirs @ inv_rot.T, viewdirs)
    elif kind == EditKind.MANIPULATE:
        target_pos = position + translation
        target_orient = rotation @ orientation
        moved = points_in_oriented_box(flat_world, extent, target_pos, target_orient)
        source = points_in_oriented_box(flat_world, extent, position, orientation)
        inv_rot = jnp.linalg.inv(rotation)
        back = (flat_world - position) @ rotation.T + position - translation
        warped = jnp.where(moved[:, None], back, flat_world)
        warped_dirs = jnp.where(moved[:, None], viewdirs @ inv_rot.T, viewdirs)
        zero_sigma_mask = source & ~moved
    else:
        raise ValueError(kind)

    xyz_n = normalize_coordinates(state, warped.reshape(R, S, 3))
    flat = xyz_n.reshape(-1, 3)
    sigma = tf.compute_density(params, mcfg, flat).reshape(R, S)
    sigma = jnp.where(in_box, sigma, 0.0)
    sigma = jnp.where(zero_sigma_mask.reshape(R, S), 0.0, sigma)

    dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                             jnp.zeros_like(z_vals[:, :1])], axis=-1)
    alpha, weight, bg_w = raw_to_alpha(sigma, dists * rcfg.distance_scale)

    rgb = tf.render_appearance(params, mcfg, warped_dirs, flat).reshape(R, S, 3)
    distilled = None
    if mcfg.use_distilled:
        distilled = tf.render_distilled(params, mcfg, flat)
    semantics = tf.render_semantics(
        params, mcfg, flat,
        distilled if mcfg.use_distilled_features_semantic else None).reshape(R, S, -1)
    instances = tf.render_instances(
        params, mcfg, flat,
        distilled if mcfg.use_distilled_features_instance else None).reshape(R, S, -1)

    opacity = jnp.sum(weight, -1)
    rgb_map = composite(weight, rgb)
    w = _head_weights(rcfg, weight)
    semantic_map = _semantic_map_postprocess(rcfg, jnp.sum(w * semantics, -2))
    instance_map = jnp.sum(w * instances, -2)
    if white_bg:
        rgb_map = rgb_map + (1.0 - opacity[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
    depth_map = jnp.sum(weight * z_vals, -1)
    return {"rgb": rgb_map, "semantics": semantic_map,
            "instances": instance_map, "depth": depth_map}
