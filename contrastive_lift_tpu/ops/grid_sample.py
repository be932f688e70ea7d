"""VM-decomposition factor-grid sampling — the inner loop of everything.

The reference samples its 2D plane / 1D line factor grids with
``F.grid_sample(..., align_corners=True)`` (reference:
model/radiance_field/tensoRF.py:114-134). On TPU we express the bilinear
lookup as gather + lerp, which XLA fuses with the plane*line product and
channel reduction. The measured fast path for trained fields is the densified
voxel-grid route in ops/fused_grid.py (one row-gather per sample) — see
PERFORMANCE.md for why a hand-written Pallas kernel does not beat these XLA
gathers in this toolchain (Mosaic dynamic_gather is sublane-only).

Conventions (all matching torch ``grid_sample`` with ``align_corners=True``
and ``padding_mode='zeros'``):
  * plane: [C, H, W]; a sample coordinate (x, y) in [-1, 1] maps to pixel
    (px, py) = ((x+1)/2*(W-1), (y+1)/2*(H-1)); x indexes W, y indexes H.
  * line: [C, L]; coordinate z in [-1, 1] maps to pz = (z+1)/2*(L-1).
  * out-of-range corners contribute zero.

Axis bookkeeping for the VM split (reference: tensoRF.py:61-62,108-112):
  matrix_mode = [[0,1],[0,2],[1,2]]; vector_mode = [2,1,0]. Plane i of a
  branch has shape [C, grid[m1], grid[m0]] and is sampled at
  (x=xyz[m0], y=xyz[m1]); line i has shape [C, grid[v]] sampled at xyz[v].
"""
from __future__ import annotations

import jax.numpy as jnp

MATRIX_MODE = ((0, 1), (0, 2), (1, 2))
VECTOR_MODE = (2, 1, 0)


def plane_sample(plane: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a [C, H, W] plane at [P, 2] coords in [-1, 1].

    Returns [P, C]. Zero padding outside the grid.
    """
    C, H, W = plane.shape
    px = (xy[:, 0] + 1.0) * 0.5 * (W - 1)
    py = (xy[:, 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = plane.reshape(C, H * W).T  # [H*W, C] — gather rows

    def corner(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=0)  # [P, C]
        return jnp.where(valid[:, None], vals, 0.0)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)
    fx = fx[:, None]
    fy = fy[:, None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def line_sample(line: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Linear sample of a [C, L] line at [P] coords in [-1, 1]. Returns [P, C]."""
    C, L = line.shape
    pz = (z + 1.0) * 0.5 * (L - 1)
    z0 = jnp.floor(pz)
    fz = pz - z0
    z0i = z0.astype(jnp.int32)
    flat = line.T  # [L, C]

    def corner(zi):
        valid = (zi >= 0) & (zi < L)
        vals = jnp.take(flat, jnp.clip(zi, 0, L - 1), axis=0)
        return jnp.where(valid[:, None], vals, 0.0)

    v0 = corner(z0i)
    v1 = corner(z0i + 1)
    return v0 * (1 - fz[:, None]) + v1 * fz[:, None]


def vm_density(planes, lines, xyz: jnp.ndarray) -> jnp.ndarray:
    """Density feature: sum over the 3 VM axes of sum_c(plane_c * line_c).

    planes/lines: tuples of 3 arrays ([C,H,W] / [C,L]); xyz: [P, 3] in [-1,1].
    Returns [P]. Reference: tensoRF.py:114-122 (shift/softplus applied by caller).
    """
    total = jnp.zeros(xyz.shape[0], xyz.dtype)
    for i in range(3):
        m0, m1 = MATRIX_MODE[i]
        v = VECTOR_MODE[i]
        p = plane_sample(planes[i], xyz[:, (m0, m1)])
        l = line_sample(lines[i], xyz[:, v])
        total = total + jnp.sum(p * l, axis=-1)
    return total


def vm_feature(planes, lines, xyz: jnp.ndarray) -> jnp.ndarray:
    """Concatenated plane*line features over the 3 axes: [P, sum(C_i)].

    The caller applies the (bias-free) basis matmul. Reference: tensoRF.py:127-134.
    """
    feats = []
    for i in range(3):
        m0, m1 = MATRIX_MODE[i]
        v = VECTOR_MODE[i]
        p = plane_sample(planes[i], xyz[:, (m0, m1)])
        l = line_sample(lines[i], xyz[:, v])
        feats.append(p * l)
    return jnp.concatenate(feats, axis=-1)


def upsample_plane(plane: jnp.ndarray, new_hw) -> jnp.ndarray:
    """Bilinear (align_corners=True) resize of a [C, H, W] plane.

    Matches torch F.interpolate(mode='bilinear', align_corners=True)
    (reference: tensoRF.py:190-197) by sampling the plane at the target's
    align-corners lattice.
    """
    C, H, W = plane.shape
    nh, nw = int(new_hw[0]), int(new_hw[1])
    ys = jnp.linspace(-1.0, 1.0, nh) if nh > 1 else jnp.zeros((1,))
    xs = jnp.linspace(-1.0, 1.0, nw) if nw > 1 else jnp.zeros((1,))
    gx, gy = jnp.meshgrid(xs, ys)  # [nh, nw]
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    out = plane_sample(plane, coords)  # [nh*nw, C]
    return out.T.reshape(C, nh, nw)


def upsample_line(line: jnp.ndarray, new_l: int) -> jnp.ndarray:
    """Linear (align_corners=True) resize of a [C, L] line."""
    C, L = line.shape
    nl = int(new_l)
    zs = jnp.linspace(-1.0, 1.0, nl) if nl > 1 else jnp.zeros((1,))
    out = line_sample(line, zs)  # [nl, C]
    return out.T
