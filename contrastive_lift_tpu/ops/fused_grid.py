"""Fused dense-grid sampling — the TPU-native fast path for VM fields.

Insight: trilinear interpolation is multilinear and separable, so for every VM
term  bilinear(plane)(x,y) * linear(line)(z)  ==  trilinear(plane x line) —
i.e. the whole factorized field equals the trilinear interpolation of a dense
voxel grid precomputed from the factors (exact up to float rounding; verified
in tests against ops.grid_sample in f64). Linear maps (the branch basis
matmul) commute with interpolation too, so projected feature fields densify
the same way.

Why this wins on TPU: a random row-gather costs one (8,128) memory tile
(~4KB) of HBM traffic no matter how few bytes the row holds. The direct VM
path needs 18 row-gathers per sample (4 corners x 3 planes + 2 x 3 lines);
the dense path needs:
  * density: ONE gather from a cell-corner-redundant [cells, 8] grid;
  * features: 8 gathers from a dense [g^3, out_dim] grid.
Building the dense grids costs a few einsums per stage (192^3 x comps ~ 0.3
GFLOP) and is amortized over every chunk rendered with the same parameters.
Gradients flow through build + gather, so the path also works for training.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class FusedGrids(NamedTuple):
    """Dense grids for the hot branches (built per stage / per checkpoint)."""
    density_cells: jnp.ndarray          # [(gx-1)(gy-1)(gz-1), 8] f32
    grid_dim: Tuple[int, int, int]
    features: Dict[str, jnp.ndarray]    # name -> [gx*gy*gz, out_dim]
    # optional cell-corner-redundant feature grids [cells, 8*out_dim]: one
    # row-gather per sample instead of 8, at 8x the memory (bf16 recommended)
    feature_cells: Dict[str, jnp.ndarray] = {}
    # conservative coarse occupancy: max raw density over supervoxel blocks,
    # dilated by one supervoxel (for two-level empty-space skipping)
    coarse_occ: Optional[jnp.ndarray] = None      # [Cx*Cy*Cz] f32 (raw max)
    coarse_dim: Optional[Tuple[int, int, int]] = None
    supervoxel: int = 4


def build_dense_density(params: dict) -> jnp.ndarray:
    """[gx, gy, gz] pre-activation density grid (without the softplus shift)."""
    planes = params["density"]["planes"]
    lines = params["density"]["lines"]
    d = jnp.einsum("cyx,cz->xyz", planes[0], lines[0], precision=_HI)
    d = d + jnp.einsum("czx,cy->xyz", planes[1], lines[1], precision=_HI)
    d = d + jnp.einsum("czy,cx->xyz", planes[2], lines[2], precision=_HI)
    return d


def _cell_corner_grid(dense: jnp.ndarray) -> jnp.ndarray:
    """[gx,gy,gz] -> [(gx-1)(gy-1)(gz-1), 8]: all 8 corners of each cell in
    one row, so a trilinear sample is a single row-gather."""
    gx, gy, gz = dense.shape
    corners = [dense[dx:gx - 1 + dx, dy:gy - 1 + dy, dz:gz - 1 + dz]
               for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    return jnp.stack(corners, axis=-1).reshape(-1, 8)


def build_dense_feature(params: dict, name: str,
                        dtype=jnp.float32) -> jnp.ndarray:
    """[gx*gy*gz, out_dim] dense projected feature grid for a VM branch.

    dense[v] = concat_axis(plane (.) line)[v] @ basis — the basis matmul is
    folded in per axis (block rows of the basis matrix).
    """
    planes = params[name]["planes"]
    lines = params[name]["lines"]
    basis = params[f"{name}_basis"]["w"]  # [sum(C_i), out]
    offs = 0
    total = None
    einsums = ("cyx,cz->xyzc", "czx,cy->xyzc", "czy,cx->xyzc")
    for i in range(3):
        c = planes[i].shape[0]
        prod = jnp.einsum(einsums[i], planes[i], lines[i], precision=_HI)
        contrib = jnp.einsum("xyzc,cf->xyzf", prod, basis[offs:offs + c],
                             precision=_HI)
        total = contrib if total is None else total + contrib
        offs += c
    gx, gy, gz, f = total.shape
    return total.reshape(gx * gy * gz, f).astype(dtype)


def _cell_corner_feature(dense_flat: jnp.ndarray, grid_dim) -> jnp.ndarray:
    """[g^3, F] -> [(gx-1)(gy-1)(gz-1), 8*F] corner-redundant feature rows."""
    gx, gy, gz = grid_dim
    dense = dense_flat.reshape(gx, gy, gz, -1)
    corners = [dense[dx:gx - 1 + dx, dy:gy - 1 + dy, dz:gz - 1 + dz]
               for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    out = jnp.concatenate(corners, axis=-1)
    return out.reshape((gx - 1) * (gy - 1) * (gz - 1), -1)


def _build_coarse_occ(dense: jnp.ndarray, supervoxel: int):
    """Max raw density per supervoxel block, dilated by one block (conservative:
    every fine trilinear value inside a block's neighborhood is <= this max)."""
    gx, gy, gz = dense.shape
    sv = supervoxel
    pad = [(0, (-s) % sv) for s in dense.shape]
    padded = jnp.pad(dense, pad, constant_values=-jnp.inf)
    coarse = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(sv, sv, sv), window_strides=(sv, sv, sv),
        padding="VALID")
    dilated = jax.lax.reduce_window(
        coarse, -jnp.inf, jax.lax.max,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding=((1, 1),) * 3)
    cdim = dilated.shape
    return dilated.reshape(-1), cdim


def build_fused_grids(params: dict, mcfg, feature_dtype=jnp.float32,
                      corner_features=(), with_occupancy: bool = False,
                      supervoxel: int = 4) -> FusedGrids:
    """Densify every grid branch present (density always; appearance/semantic/
    instance/feature when they are VM branches rather than xyz-MLPs).

    Branches listed in ``corner_features`` additionally get cell-corner-
    redundant rows (single-gather sampling; 8x memory — use bf16).
    ``with_occupancy`` adds the coarse grid for two-level empty-space skipping.
    """
    dense = build_dense_density(params)
    grid_dim = dense.shape
    features = {}
    feature_cells = {}
    for name in ("appearance", "semantic", "instance", "feature"):
        if name in params:
            grid = build_dense_feature(params, name, feature_dtype)
            if name in corner_features:
                feature_cells[name] = _cell_corner_feature(grid, grid_dim)
            else:
                features[name] = grid
    coarse_occ, coarse_dim = (None, None)
    if with_occupancy:
        coarse_occ, coarse_dim = _build_coarse_occ(dense, supervoxel)
    return FusedGrids(_cell_corner_grid(dense), grid_dim, features,
                      feature_cells, coarse_occ, coarse_dim, supervoxel)


def build_density_only(params: dict) -> FusedGrids:
    """Density-only fused grids (for the training passes whose density is
    stop-gradient: instance + segment renders). Cheap enough to rebuild every
    step (~10-40 ms of einsums + slicing)."""
    dense = build_dense_density(params)
    return FusedGrids(_cell_corner_grid(dense), dense.shape, {}, {})


def sample_coarse_occ(fused: FusedGrids, xyz: jnp.ndarray) -> jnp.ndarray:
    """Raw-density upper bound at [P,3] coords in [-1,1] (nearest supervoxel)."""
    gx, gy, gz = fused.grid_dim
    cx, cy, cz = fused.coarse_dim
    sv = fused.supervoxel
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(p.astype(jnp.int32) // sv, 0,
                 jnp.asarray((cx - 1, cy - 1, cz - 1), jnp.int32))
    flat = (i[:, 0] * cy + i[:, 1]) * cz + i[:, 2]
    return jnp.take(fused.coarse_occ, flat)


def _cell_coords(grid_dim, xyz: jnp.ndarray):
    g = jnp.asarray(grid_dim, jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(jnp.floor(p), 0.0, g - 2.0)
    f = p - i
    return i.astype(jnp.int32), f


def sample_density_fused(fused: FusedGrids, xyz: jnp.ndarray,
                         splus_shift: float) -> jnp.ndarray:
    """Pre-activation density + shift at [P,3] coords in [-1,1]; one gather."""
    gx, gy, gz = fused.grid_dim
    i, f = _cell_coords(fused.grid_dim, xyz)
    flat_idx = (i[:, 0] * (gy - 1) + i[:, 1]) * (gz - 1) + i[:, 2]
    rows = jnp.take(fused.density_cells, flat_idx, axis=0)  # [P, 8]
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    w = jnp.concatenate([
        (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
        (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
        fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
        fx * fy * (1 - fz), fx * fy * fz], axis=-1)
    return jnp.sum(rows * w, axis=-1) + splus_shift


def sample_feature_fused(fused: FusedGrids, name: str,
                         xyz: jnp.ndarray) -> jnp.ndarray:
    """Projected branch features at [P,3] coords in [-1,1].

    Uses the single-gather cell-corner grid when present, else 8 row-gathers
    on the dense grid.
    """
    gx, gy, gz = fused.grid_dim
    i, f = _cell_coords(fused.grid_dim, xyz)
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    if name in fused.feature_cells:
        cells = fused.feature_cells[name]
        flat_idx = (i[:, 0] * (gy - 1) + i[:, 1]) * (gz - 1) + i[:, 2]
        rows = jnp.take(cells, flat_idx, axis=0).astype(jnp.float32)
        fdim = rows.shape[-1] // 8
        rows = rows.reshape(-1, 8, fdim)
        w = jnp.stack([
            (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
            (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
            fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
            fx * fy * (1 - fz), fx * fy * fz], axis=1)  # [P, 8, 1]
        return jnp.sum(rows * w, axis=1)

    grid = fused.features[name]
    base = (i[:, 0] * gy + i[:, 1]) * gz + i[:, 2]
    out = 0.0
    for dx in (0, 1):
        wx = fx if dx else (1 - fx)
        for dy in (0, 1):
            wy = fy if dy else (1 - fy)
            for dz in (0, 1):
                wz = fz if dz else (1 - fz)
                idx = base + (dx * gy + dy) * gz + dz
                out = out + jnp.take(grid, idx, axis=0).astype(jnp.float32) \
                    * (wx * wy * wz)
    return out
