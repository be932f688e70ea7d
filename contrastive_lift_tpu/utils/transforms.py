"""Homogeneous-transform helpers (reference: util/transforms.py:14-220)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hmg(mat3):
    """3x3 -> 4x4 homogeneous."""
    xp = jnp if isinstance(mat3, jnp.ndarray) else np
    out = xp.eye(4, dtype=jnp.float32 if xp is jnp else np.float32)
    if xp is jnp:
        return out.at[:3, :3].set(mat3)
    out[:3, :3] = mat3
    return out


def trs_comp(translation, rotation, scale):
    """Compose T @ R @ S into one 4x4."""
    t = np.eye(4, dtype=np.float64)
    t[:3, 3] = np.asarray(translation, np.float64)
    r = np.eye(4, dtype=np.float64)
    r[:3, :3] = np.asarray(rotation, np.float64)
    s = np.eye(4, dtype=np.float64)
    s[:3, :3] *= np.asarray(scale, np.float64)
    return (t @ r @ s).astype(np.float32)


def tr_comp(translation, rotation):
    return trs_comp(translation, rotation, 1.0)


def dot(transform, points):
    """Apply a 3x3/3x4/4x4 transform to [N,3] points (jnp or np)."""
    xp = jnp if isinstance(points, jnp.ndarray) or isinstance(transform, jnp.ndarray) else np
    transform = xp.asarray(transform)
    points = xp.asarray(points)
    if transform.shape == (3, 3):
        return points @ transform.T
    pts_h = xp.concatenate([points, xp.ones_like(points[:, :1])], axis=-1)
    out = pts_h @ transform.T
    return out[:, :3]


def inverse_rigid(transform):
    """Fast inverse of a rigid 4x4 (R|t)."""
    xp = jnp if isinstance(transform, jnp.ndarray) else np
    rot = transform[:3, :3]
    t = transform[:3, 3]
    inv = xp.eye(4, dtype=transform.dtype)
    if xp is jnp:
        inv = inv.at[:3, :3].set(rot.T)
        inv = inv.at[:3, 3].set(-rot.T @ t)
        return inv
    inv[:3, :3] = rot.T
    inv[:3, 3] = -rot.T @ t
    return inv
