"""Procedural synthetic scene: colored spheres with frame-INCONSISTENT
instance pseudo-labels.

Serves the role of the reference's "overfit smoke mode" (reference:
dataset/panopli.py:45-47) but with analytically known geometry, so the full
train -> render -> cluster -> PQ pipeline can be tested end-to-end without any
dataset download. Semantics: class 0 = background (stuff), classes 1..K =
thing classes. Instance ids are randomly permuted per frame — exactly the
noise regime the slow-fast loss is designed for.
"""
from __future__ import annotations

import numpy as np

from ..utils import geometry as geo
from .base import FrameData, SceneData, SegmentationData


def _look_at(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """cam2world with +z forward (matching ray_directions convention)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(fwd, up)) > 0.95:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


ROOM_RADIUS = 0.9  # enclosing shell: every ray terminates on a surface, like
                   # real indoor scans (otherwise the reference's random
                   # white-bg compositing during training fights the data)


def _render_analytic(rays_o, rays_d, centers, radii, colors, classes):
    """Nearest ray-sphere hit per ray: rgb, semantic, instance(1-based), depth.

    Background = the inside of a big room shell (class 0, instance 0) with a
    smooth color gradient, hit at the ray's far sphere intersection.
    """
    n = rays_o.shape[0]
    # room shell: cameras are inside, so take the far root
    b_room = np.sum(rays_o * rays_d, -1)
    disc_room = b_room * b_room - (np.sum(rays_o * rays_o, -1) - ROOM_RADIUS**2)
    t_room = -b_room + np.sqrt(np.maximum(disc_room, 0.0))
    best_t = t_room.astype(np.float32)
    hit_idx = np.full(n, -1, np.int32)
    for i, (c, r) in enumerate(zip(centers, radii)):
        oc = rays_o - c
        b = np.sum(oc * rays_d, -1)
        cc = np.sum(oc * oc, -1) - r * r
        disc = b * b - cc
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        valid = (disc > 0) & (t > 0.01) & (t < best_t)
        best_t = np.where(valid, t, best_t)
        hit_idx = np.where(valid, i, hit_idx)

    pts = rays_o + best_t[:, None] * rays_d
    light = np.array([0.3, -0.5, 0.8])
    light = light / np.linalg.norm(light)
    # room wall: gentle positional gradient so RGB learning is non-trivial
    rgb = (0.25 + 0.2 * (pts / ROOM_RADIUS + 1.0) / 2.0).astype(np.float32)
    for i, (c, col) in enumerate(zip(centers, colors)):
        m = hit_idx == i
        if not m.any():
            continue
        normal = (pts[m] - c)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        shade = 0.6 + 0.4 * np.clip(normal @ light, 0, 1)
        rgb[m] = col[None, :] * shade[:, None]
    hit = hit_idx >= 0
    semantics = np.where(hit, classes[np.maximum(hit_idx, 0)], 0).astype(np.int32)
    instances = np.where(hit, hit_idx + 1, 0).astype(np.int32)
    depth = best_t.astype(np.float32)
    return rgb, semantics, instances, depth


def make_synthetic_scene(num_spheres: int = 5, num_train: int = 12,
                         num_val: int = 4, image_dim=(48, 64),
                         num_thing_classes: int = 2, seed: int = 0,
                         consistent_labels: bool = False) -> SceneData:
    """Build a full SceneData with all three supervision streams derivable."""
    rng = np.random.default_rng(seed)
    h, w = image_dim
    centers = rng.uniform(-0.3, 0.3, (num_spheres, 3)).astype(np.float32)
    radii = rng.uniform(0.08, 0.14, num_spheres).astype(np.float32)
    colors = rng.uniform(0.3, 1.0, (num_spheres, 3)).astype(np.float32)
    classes = (1 + rng.integers(0, num_thing_classes, num_spheres)).astype(np.int32)
    num_classes = 1 + num_thing_classes

    focal = 0.9 * w
    intr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)

    def make_frame(idx: int, is_val: bool) -> FrameData:
        angle = 2 * np.pi * (idx / (num_train + num_val)) + (0.5 if is_val else 0.0)
        eye = np.array([0.75 * np.cos(angle), 0.75 * np.sin(angle),
                        0.35 + 0.1 * np.sin(3 * angle)], np.float32)
        c2w = _look_at(eye, np.zeros(3, np.float32))
        dirs = np.asarray(geo.ray_directions_from_intrinsics(h, w, intr))
        rays = np.asarray(geo.make_ray_bundle(dirs, c2w))
        rgb, sem, inst, depth = _render_analytic(
            rays[:, 0:3], rays[:, 3:6], centers, radii, colors, classes)
        # frame-inconsistent machine labels: permute instance ids per frame
        if consistent_labels:
            noisy_inst = inst
        else:
            perm = rng.permutation(num_spheres) + 1
            noisy_inst = np.where(inst > 0, perm[np.maximum(inst - 1, 0)], 0)
        probs = np.eye(num_classes, dtype=np.float32)[sem]
        probs = 0.9 * probs + 0.1 / num_classes
        conf = np.full(rays.shape[0], 0.95, np.float32)
        return FrameData(
            name=f"{idx:04d}", rays=rays.astype(np.float32), rgbs=rgb,
            semantics=sem, instances=noisy_inst, probabilities=probs,
            confidences=conf, mask=np.ones(rays.shape[0], bool),
            gt_semantics=sem, gt_instances=inst,
            intrinsics=intr, cam2normscene=c2w, depth=depth)

    train = [make_frame(i, False) for i in range(num_train)]
    val = [make_frame(num_train + i, True) for i in range(num_val)]
    seg = SegmentationData(
        fg_classes=sorted(set(classes.tolist())),
        bg_classes=[0],
        num_semantic_classes=num_classes,
        instance_to_semantics={i + 1: int(c) for i, c in enumerate(classes)},
        num_instances=num_spheres)
    return SceneData(train_frames=train, val_frames=val, segmentation=seg,
                     image_dim=image_dim,
                     things_filtered=set(seg.fg_classes),
                     stuff_filtered={0})
