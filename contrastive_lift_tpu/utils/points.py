"""Point-cloud / camera export for debugging (PLY + OBJ).

Covers reference util/points_util.py (savePlyFromPtsRGB), util/misc
visualize_points, dataset/camera_pose_visualizer.py capability.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def save_ply(path, points: np.ndarray, colors=None) -> None:
    """Binary-less ASCII PLY of [N,3] points with optional [N,3] colors in [0,1]."""
    points = np.asarray(points, np.float32)
    n = len(points)
    header = ["ply", "format ascii 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
        rgb = (np.clip(np.asarray(colors), 0, 1) * 255).astype(np.uint8)
    header += ["end_header"]
    lines = header
    for i in range(n):
        row = f"{points[i, 0]} {points[i, 1]} {points[i, 2]}"
        if colors is not None:
            row += f" {rgb[i, 0]} {rgb[i, 1]} {rgb[i, 2]}"
        lines.append(row)
    Path(path).write_text("\n".join(lines) + "\n")


def save_obj_points(path, points: np.ndarray, colors=None) -> None:
    """OBJ vertex cloud (v x y z [r g b])."""
    points = np.asarray(points, np.float32)
    lines = []
    for i in range(len(points)):
        row = f"v {points[i, 0]} {points[i, 1]} {points[i, 2]}"
        if colors is not None:
            c = np.clip(np.asarray(colors)[i], 0, 1)
            row += f" {c[0]} {c[1]} {c[2]}"
        lines.append(row)
    Path(path).write_text("\n".join(lines) + "\n")


def camera_frustum_points(cam2world: np.ndarray, intrinsics: np.ndarray,
                          image_hw, depth: float = 0.2) -> np.ndarray:
    """Five points (center + 4 image corners at given depth) for pose viz."""
    h, w = image_hw
    inv_k = np.linalg.inv(np.asarray(intrinsics))
    corners = np.array([[0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]], np.float64)
    cam_pts = (corners @ inv_k.T) * depth
    pts = np.concatenate([np.zeros((1, 3)), cam_pts])
    r = cam2world[:3, :3]
    t = cam2world[:3, 3]
    return pts @ r.T + t


def export_camera_poses(path, cam2worlds, intrinsics, image_hw) -> None:
    """All camera frustums as one OBJ point cloud."""
    pts = np.concatenate([camera_frustum_points(c2w, intrinsics, image_hw)
                          for c2w in cam2worlds])
    save_obj_points(path, pts)


def export_scene_point_cloud(path, frames, subsample: int = 10,
                             color_by: str = "rgb") -> None:
    """Back-project frames with depth into a world point cloud.

    Reference: dataset/base.py:225-285 (export_point_cloud).
    """
    from ..utils.colors import DistinctColors
    all_pts, all_cols = [], []
    dc = DistinctColors()
    for f in frames:
        if f.depth is None:
            continue
        sel = np.arange(0, f.rays.shape[0], subsample)
        o, d = f.rays[sel, :3], f.rays[sel, 3:6]
        pts = o + f.depth.reshape(-1)[sel, None] * d
        all_pts.append(pts)
        if color_by == "semantics":
            all_cols.append(dc.apply(f.semantics.reshape(-1)[sel]))
        elif color_by == "instances":
            all_cols.append(dc.apply(f.instances.reshape(-1)[sel]))
        else:
            all_cols.append(f.rgbs[sel])
    if not all_pts:
        raise ValueError("no frames with depth to export")
    save_ply(path, np.concatenate(all_pts), np.concatenate(all_cols))
