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

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class FusedGrids(NamedTuple):
    """Dense grids for the hot branches (built per stage / per checkpoint)."""
    density_cells: jnp.ndarray          # [(gx-1)(gy-1)(gz-1), 8] f32
    grid_dim: Tuple[int, int, int]
    features: Dict[str, jnp.ndarray]    # name -> [gx*gy*gz, out_dim]
    # optional cell-corner-redundant feature grids [cells, 8*pad(out_dim)]:
    # one row-gather per sample instead of 8, at 8x the memory (bf16
    # recommended). Each corner's features are lane-padded so the row is a
    # whole number of 128-lane tiles — a 216-lane bf16 row gathers at ~35M
    # rows/s on v5e while the 256-lane padded row reaches ~62M (measured).
    feature_cells: Dict[str, jnp.ndarray] = {}
    # conservative coarse occupancy: max raw density over supervoxel blocks,
    # dilated by one supervoxel (for two-level empty-space skipping). Stored
    # width-8 (value replicated across lanes): sub-row scalar gathers run at
    # ~123M rows/s on v5e, (N,8) row gathers at ~267M (measured).
    coarse_occ: Optional[jnp.ndarray] = None      # [Cx*Cy*Cz, 8] f32 (raw max)
    coarse_dim: Optional[Tuple[int, int, int]] = None
    supervoxel: int = 4
    # mid-level occupancy for the third ESS level: supervoxel max with a
    # two-voxel margin instead of a one-BLOCK dilation — conservative for
    # sub-segment midpoint tests (incl. interpolation corners) while smearing
    # surfaces by only ~2 voxels (see _build_tight_occ)
    coarse_occ_tight: Optional[jnp.ndarray] = None  # [Cx*Cy*Cz, 8] f32
    # grouped-occupancy neighborhood rows: row b holds the occupancy maxima
    # of the 5^3 block neighborhood [b, b+4]^3 (lane dx*25+dy*5+dz, 3 pad
    # lanes), so ONE row gather serves a GROUP of consecutive ray-ordered
    # occupancy tests (their block coords span <= 5 per axis by the
    # step-geometry gate in renderer.occ_grouping_for). Cuts the coarse-pass
    # gather count ~GROUP x; values are identical to coarse_occ /
    # coarse_occ_tight so the selected segments match the ungrouped path
    # bit-for-bit.
    occ_group: Optional[jnp.ndarray] = None        # [Cx*Cy*Cz, 128] f32
    occ_group_tight: Optional[jnp.ndarray] = None  # [Cx*Cy*Cz, 128] f32
    # bit-packed grouped occupancy: the alpha test is STATIC (threshold, step
    # size, distance scale are all build-time constants), so the neighborhood
    # rows can carry pre-thresholded BITS instead of f32 maxima — 125
    # neighborhood bits in 4 uint32 words (padded to 8 lanes). The per-test
    # select collapses from a 128-lane f32 compare+max to a 4-lane word pick
    # plus shift/mask (~32x less VPU work; measured L1 select 4.8 -> ~1.5 ms
    # at the bench point), and the tables are 16x smaller (3.5 MB vs 56 MB at
    # 192^3). Built only by build_render_grids, which knows the threshold;
    # occ_bits_thres records it so a mismatched rcfg can't silently reuse
    # stale bits (build_render_grids re-keys its cache on the threshold).
    occ_bits_group: Optional[jnp.ndarray] = None        # [Cx*Cy*Cz, 8] uint32
    occ_bits_group_tight: Optional[jnp.ndarray] = None  # [Cx*Cy*Cz, 8] uint32
    # -- brick atlas: the fine-density fast path ---------------------------
    # v5e random row-gather throughput cliffs with table ROW COUNT: ~260-327M
    # rows/s for <=110k-row tables vs ~66-90M for multi-million-row tables
    # (measured, PERFORMANCE.md). Row b = the 5x5x5 corner lattice of a
    # 4-voxel brick (lane a*25+b*5+c; 3 pad lanes), so the atlas has
    # ceil((g-1)/4)^3 rows REGARDLESS of scene occupancy and one gather +
    # an in-VMEM Pallas reduction (ops/pallas_interp.py) yields the exact
    # trilinear density of any sample in the brick.
    brick_atlas: Optional[jnp.ndarray] = None     # [Bx*By*Bz, 128]
    # -- occupancy-compacted corner-feature tables -------------------------
    # feature corner rows are too wide to benefit from the atlas trick;
    # keeping rows only for cells inside occupied supervoxel bricks instead
    # shrinks them by the scene's occupancy factor (2-20%). slot_map maps a
    # brick to its slot (0 = empty -> zero sentinel rows).
    slot_map: Optional[jnp.ndarray] = None        # [Cx*Cy*Cz, 8] int32
    compact_feature_cells: Dict[str, jnp.ndarray] = {}
    # gather map behind the compact tables: cell index (into the (g-1)^3 cell
    # grid) of every compact row past the sentinel brick — lets later passes
    # (e.g. renderer/bake.py head baking) compact NEW corner tables into the
    # same slot layout with one take()
    compact_cells: Optional[jnp.ndarray] = None   # [capacity * sv^3] int32


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


def _corner_pad(fdim: int) -> int:
    """Per-corner lane padding so 8*pad is a whole number of 128-lane tiles."""
    return -(-fdim // 16) * 16


def _cell_corner_feature(dense_flat: jnp.ndarray, grid_dim) -> jnp.ndarray:
    """[g^3, F] -> [(gx-1)(gy-1)(gz-1), 8*pad(F)] corner-redundant rows.

    Each corner's F features are zero-padded to a multiple of 16 lanes so the
    full row is tile-aligned (see FusedGrids.feature_cells note)."""
    gx, gy, gz = grid_dim
    dense = dense_flat.reshape(gx, gy, gz, -1)
    fdim = dense.shape[-1]
    pad = _corner_pad(fdim)
    if pad != fdim:
        dense = jnp.pad(dense, ((0, 0),) * 3 + ((0, pad - fdim),))
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
    # width-8 replication: row gathers beat sub-row scalar gathers ~2x (v5e)
    return jnp.repeat(dilated.reshape(-1, 1), 8, axis=1), cdim, dilated, coarse


def _block_node_max(dense: jnp.ndarray, sv: int) -> jnp.ndarray:
    """Per-supervoxel-block max over the FULL (sv+1)^3 node lattice the
    block's cells interpolate from — window sv+1, stride sv, so the boundary
    node layer shared with the next block IS included (cells [sv*b, sv*b+sv-1]
    interpolate nodes [sv*b, sv*b+sv]). This is the correct undilated bound
    for per-cell feature compaction: _build_coarse_occ's stride-sv window
    excludes node sv*b+sv, so a surface rising out of an otherwise-empty
    block across the boundary would wrongly drop the block there. Output
    dims match _build_coarse_occ's block grid."""
    cdims = tuple(-(-s // sv) for s in dense.shape)
    pad = [(0, sv * c + 1 - s) for c, s in zip(cdims, dense.shape)]
    padded = jnp.pad(dense, pad, constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(sv + 1,) * 3, window_strides=(sv,) * 3,
        padding="VALID")


def _build_occ_group(vals3d: jnp.ndarray) -> jnp.ndarray:
    """[cx,cy,cz] per-block occupancy maxima -> [cx*cy*cz, 128] neighborhood
    rows: row b holds vals3d over blocks [b, b+4]^3 at lane dx*25+dy*5+dz
    (out-of-grid neighbors = -inf, never selected; 3 pad lanes)."""
    cx, cy, cz = vals3d.shape
    padded = jnp.pad(vals3d, ((0, 4),) * 3, constant_values=-jnp.inf)
    rows = [padded[dx:dx + cx, dy:dy + cy, dz:dz + cz]
            for dx in range(5) for dy in range(5) for dz in range(5)]
    out = jnp.stack(rows, axis=-1).reshape(cx * cy * cz, 125)
    return jnp.pad(out, ((0, 0), (0, 3)), constant_values=-jnp.inf)


def _pack_neighborhood_bits(bits3d: jnp.ndarray) -> jnp.ndarray:
    """[cx,cy,cz] occupancy BOOLS -> [cx*cy*cz, 8] uint32 neighborhood rows.

    Row b packs occupancy of blocks [b, b+4]^3 at bit dx*25+dy*5+dz into
    words bit//32 (out-of-grid neighbors = 0, never occupied). Same lane
    layout as _build_occ_group so sample_occ_bits_grouped shares its index
    math; 8 uint32 lanes keep the row at the width-8 gather sweet spot."""
    cx, cy, cz = bits3d.shape
    padded = jnp.pad(bits3d, ((0, 4),) * 3, constant_values=False)
    rows = [padded[dx:dx + cx, dy:dy + cy, dz:dz + cz]
            for dx in range(5) for dy in range(5) for dz in range(5)]
    bits = jnp.stack(rows, axis=-1).reshape(cx * cy * cz, 125)
    bits = jnp.pad(bits, ((0, 0), (0, 3)), constant_values=False)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(
        bits.reshape(-1, 4, 32).astype(jnp.uint32) << shifts[None, None, :],
        axis=-1, dtype=jnp.uint32)
    return jnp.pad(words, ((0, 0), (0, 4)))


def sample_occ_bits_grouped(fused: "FusedGrids", xyz: jnp.ndarray, group: int,
                            tight: bool = False) -> jnp.ndarray:
    """Occupancy TEST RESULT (bool) at [R, T, 3] normalized coords, one
    bit-packed neighborhood-row gather per ``group`` consecutive tests.

    Same grouping contract as sample_occ_grouped (T % group == 0, group span
    <= 5 blocks per axis — renderer.occ_grouping_for); results equal
    ``_occ_alpha_test(sample_coarse_occ(...))`` because the bits were packed
    at the equivalent raw threshold (raw_occupancy_threshold)."""
    R, T, _ = xyz.shape
    gx, gy, gz = fused.grid_dim
    cx, cy, cz = fused.coarse_dim
    sv = fused.supervoxel
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(p.astype(jnp.int32) // sv, 0,
                 jnp.asarray((cx - 1, cy - 1, cz - 1), jnp.int32))  # [R,T,3]
    ig = i.reshape(R, T // group, group, 3)
    origin = jnp.min(ig, axis=2)                                   # [R,nG,3]
    flat = (origin[..., 0] * cy + origin[..., 1]) * cz + origin[..., 2]
    table = fused.occ_bits_group_tight if tight else fused.occ_bits_group
    rows = jnp.take(table, flat.reshape(-1), axis=0)
    words = rows.reshape(R, T // group, 8)[:, :, :4]               # [R,nG,4]
    off = ig - origin[:, :, None, :]                               # [R,nG,G,3]
    lane = off[..., 0] * 25 + off[..., 1] * 5 + off[..., 2]        # [R,nG,G]
    widx = lane >> 5
    sel = widx[..., None] == jnp.arange(4, dtype=jnp.int32)
    wval = jnp.max(jnp.where(sel, words[:, :, None, :], jnp.uint32(0)),
                   axis=-1)                                        # [R,nG,G]
    bit = (wval >> (lane & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return (bit > 0).reshape(R, T)


def sample_occ_grouped(fused: "FusedGrids", xyz: jnp.ndarray, group: int,
                       tight: bool = False) -> jnp.ndarray:
    """Occupancy upper bound at [R, T, 3] normalized coords, one neighborhood
    row gather per ``group`` consecutive tests (T % group == 0).

    Each group's block coords must span <= 5 blocks per axis — guaranteed
    when consecutive tests advance <= (4/(group-1)) supervoxels per axis
    (renderer.occ_grouping_for derives the feasible group size from the
    step/voxel geometry host-side). Values match sample_coarse_occ exactly:
    the lane select uses the same clipped block index."""
    R, T, _ = xyz.shape
    gx, gy, gz = fused.grid_dim
    cx, cy, cz = fused.coarse_dim
    sv = fused.supervoxel
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(p.astype(jnp.int32) // sv, 0,
                 jnp.asarray((cx - 1, cy - 1, cz - 1), jnp.int32))  # [R,T,3]
    ig = i.reshape(R, T // group, group, 3)
    origin = jnp.min(ig, axis=2)                                   # [R,nG,3]
    flat = (origin[..., 0] * cy + origin[..., 1]) * cz + origin[..., 2]
    table = fused.occ_group_tight if tight else fused.occ_group
    rows = jnp.take(table, flat.reshape(-1), axis=0)
    rows = rows.reshape(R, T // group, 128)
    off = ig - origin[:, :, None, :]                               # [R,nG,G,3]
    lane = off[..., 0] * 25 + off[..., 1] * 5 + off[..., 2]        # [R,nG,G]
    # iota-compare lane select (fuses with the gather like the brick interp;
    # no materialized [.,G,128] intermediate)
    lane_iota = jnp.arange(128, dtype=jnp.int32)
    sel = lane[..., None] == lane_iota
    vals = jnp.max(jnp.where(sel, rows[:, :, None, :], -jnp.inf), axis=-1)
    return vals.reshape(R, T)


def tight_occ_pads(sub_stride: int, step_size: float, min_unit: float,
                   supervoxel: int = 4) -> Tuple[int, int]:
    """Node margins the tight-occupancy window needs around a block so every
    fine sample of a sub-segment whose MIDPOINT falls in the block keeps its
    interpolation corners inside the window.

    Worst-axis extents in voxels around the midpoint: -(sub/2)*sr backward,
    +(sub/2 - 1)*sr forward (sr = step in voxels of the smallest-unit axis),
    plus one node for the upper interp corner / floor for the lower. The
    advisor's round-2 finding was exactly the forward margin at the 0.5
    training ratio (pad 2 is one node short there); computing the pads from
    the measured step geometry keeps the window minimal at the 0.25
    inference ratio (pads (2,2)) and safe at any other."""
    sr = step_size / max(min_unit, 1e-12)
    left = int(np.ceil(sub_stride / 2 * sr + 1 - 1e-6))
    right = int(np.ceil((sub_stride / 2 - 1) * sr + 1 - 1e-6))
    return max(2, left), max(2, right)


def _build_tight_occ(dense: jnp.ndarray, supervoxel: int,
                     pads: Tuple[int, int] = (3, 3)):
    """Max raw density per supervoxel block with a margin (window
    sv + pads[0] + pads[1], stride sv) — the mid-level occupancy for
    sub-segment tests.

    Window covers nodes [sv*b - pads[0], sv*b + sv + pads[1]] around block
    b; ``tight_occ_pads`` derives the minimal conservative pads from the
    step geometry (= (2,2) at the 0.25 inference ratio). The (3,3) default
    is what ``tight_occ_pads(8, ...)`` returns at sub_stride * step_ratio
    = 4 (the 0.5 training ratio) — safe for BOTH standard ratios at the
    cost of ~1 voxel extra smear; production builders pass the computed
    minimal pads. (A (2,3) default was one node short on the backward side
    at the training ratio: the lowest fine sample of a sub-segment centered
    in the block's first half-voxel interpolates from node sv*b - 3.)"""
    sv = supervoxel
    lo, hi = pads
    cdims = tuple(-(-g // sv) for g in dense.shape)
    win = sv + lo + hi
    jpads = [(lo, sv * (c - 1) + win - lo - g)
             for c, g in zip(cdims, dense.shape)]
    padded = jnp.pad(dense, jpads, constant_values=-jnp.inf)
    tight = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(win,) * 3, window_strides=(sv,) * 3,
        padding="VALID")
    return jnp.repeat(tight.reshape(-1, 1), 8, axis=1), tight


def build_fused_grids(params: dict, mcfg, feature_dtype=jnp.float32,
                      corner_features=(), with_occupancy: bool = False,
                      supervoxel: int = 4,
                      compact_capacity: Optional[int] = None,
                      occ_raw_thres: Optional[float] = None,
                      dense_override: Optional[jnp.ndarray] = None,
                      with_atlas: bool = False,
                      atlas_dtype=jnp.float32,
                      with_occ_groups: bool = False,
                      tight_pads: Tuple[int, int] = (3, 3),
                      feat_raw_thres: Optional[float] = None,
                      occ_bits_thres: Optional[float] = None,
                      feature_cells_per_row: int = 1,
                      multibranch: Tuple[str, ...] = ()) -> FusedGrids:
    """Densify every grid branch present (density always; appearance/semantic/
    instance/feature when they are VM branches rather than xyz-MLPs).

    Branches listed in ``corner_features`` additionally get cell-corner-
    redundant rows (single-gather sampling; 8x memory — use bf16).
    ``with_occupancy`` adds the coarse grid for two-level empty-space skipping.
    With ``compact_capacity`` (static; >= the occupied-brick count, see
    ``count_occupied_bricks``) + ``occ_raw_thres``, additionally builds the
    occupancy-compacted fast tables and drops the full-size corner tables.

    ``dense_override`` substitutes an arbitrary pre-activation density grid
    for the VM-densified one (benchmarks / tests with analytic fields).

    ``multibranch`` fuses the listed branches (all must be VM branches) into
    ONE corner table keyed "a+b": their projected grids are concatenated
    along the feature axis BEFORE corner-row construction, so one row gather
    serves every member branch at a sample. The v5e gather cost is dominated
    by per-row issue (PERFORMANCE.md round-4 microbench: separate
    197k@256 + 2x98k@256 lanes = 5.08 ms vs appearance + fused sem/ins
    512-lane rows = 4.28 ms at the same row count), so co-sampled branches —
    semantic+instance always evaluate at the SAME top-k2 points — fuse with
    zero wasted bandwidth. Member branches get no individual tables;
    sample the combo key with out_dim = sum of member dims and slice.
    """
    dense = (build_dense_density(params) if dense_override is None
             else dense_override)
    grid_dim = dense.shape
    features = {}
    feature_cells = {}
    mb = tuple(n for n in multibranch if n in params)
    if len(mb) < 2:
        mb = ()
    for name in ("appearance", "semantic", "instance", "feature"):
        if name in params and name not in mb:
            grid = build_dense_feature(params, name, feature_dtype)
            if name in corner_features:
                feature_cells[name] = _cell_corner_feature(grid, grid_dim)
            else:
                features[name] = grid
    if mb:
        combo = jnp.concatenate(
            [build_dense_feature(params, n, feature_dtype) for n in mb],
            axis=-1)
        feature_cells["+".join(mb)] = _cell_corner_feature(combo, grid_dim)
    coarse_occ, coarse_dim, occ_tight = (None, None, None)
    occ_group, occ_group_tight = (None, None)
    occ_bits, occ_bits_tight = (None, None)
    if with_occupancy:
        coarse_occ, coarse_dim, dilated3d, _ = _build_coarse_occ(
            dense, supervoxel)
        occ_tight, tight3d = _build_tight_occ(dense, supervoxel, tight_pads)
        if with_occ_groups:
            if occ_bits_thres is not None:
                # the alpha test is static, so bake it: bit-packed rows make
                # the grouped select ~32x cheaper and the tables 16x smaller
                # (see FusedGrids.occ_bits_group); the f32 rows are skipped
                occ_bits = _pack_neighborhood_bits(dilated3d > occ_bits_thres)
                occ_bits_tight = _pack_neighborhood_bits(
                    tight3d > occ_bits_thres)
            else:
                occ_group = _build_occ_group(dilated3d)
                occ_group_tight = _build_occ_group(tight3d)
    atlas = _build_brick_atlas(dense, atlas_dtype) if with_atlas else None
    fused = FusedGrids(_cell_corner_grid(dense), grid_dim, features,
                       feature_cells, coarse_occ, coarse_dim, supervoxel,
                       coarse_occ_tight=occ_tight, brick_atlas=atlas,
                       occ_group=occ_group, occ_group_tight=occ_group_tight,
                       occ_bits_group=occ_bits,
                       occ_bits_group_tight=occ_bits_tight)
    if compact_capacity is not None:
        if occ_raw_thres is None or coarse_occ is None:
            raise ValueError("compaction needs with_occupancy + occ_raw_thres")
        # feature rows compact against the UNDILATED per-block NODE max at
        # the (higher) feat_raw_thres when given: exact for composited maps —
        # a cell's 8 interp corners all lie in its block's (sv+1)^3 node
        # lattice (_block_node_max — includes the boundary layer shared with
        # the next block), so any sample whose weight clears the raymarch
        # threshold finds its block kept, and samples in dropped blocks are
        # below it and masked anyway (2-3x fewer rows -> faster head-feature
        # gathers; see PERFORMANCE.md gather model)
        mask = None
        if feat_raw_thres is not None:
            mask = _block_node_max(dense, supervoxel).reshape(-1) > feat_raw_thres
        fused = build_compact_tables(fused, occ_raw_thres, compact_capacity,
                                     mask=mask,
                                     cells_per_row=feature_cells_per_row)
    return fused


def raw_occupancy_threshold(splus_shift: float, step_size: float,
                            distance_scale: float,
                            occ_alpha_thres: float) -> float:
    """Pre-activation density value whose per-sample alpha equals
    ``occ_alpha_thres`` — the host-side mirror of the occupancy test in
    renderer/_two_level_density (alpha = 1-exp(-softplus(raw+shift)*step*ds)).
    """
    v = -np.log1p(-occ_alpha_thres) / (float(step_size) * distance_scale)
    raw = float(np.log(np.expm1(v))) if v < 30 else v
    return raw - splus_shift


def count_occupied_bricks(fused: FusedGrids, occ_raw_thres: float) -> int:
    """Host-side count of supervoxel bricks passing the occupancy test (the
    required ``compact_capacity``). One tiny device->host sync."""
    return int(jnp.sum(fused.coarse_occ[:, 0] > occ_raw_thres))


def compact_capacity_bucket(n_occ: int) -> int:
    """Round the occupied-brick count up to a ~12.5%-headroom bucket so jit
    caches of the compacted-build / render survive small occupancy drift
    without doubling the table footprint."""
    cap = 1024
    while cap < n_occ * 9 // 8:
        cap = cap * 5 // 4 // 256 * 256 + 256
    return cap


def _build_brick_atlas(dense: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[gx,gy,gz] pre-activation density -> [Bx*By*Bz, 128] brick rows.

    Brick (i,j,k) covers voxels [4i,4i+4]x[4j,..]x[4k,..]; its row holds the
    5^3 corner lattice at lane a*25+b*5+c (edge-clamped at grid boundaries),
    zero-padded to 128 lanes.
    """
    gx, gy, gz = dense.shape
    bdims = tuple(-(-(g - 1) // 4) for g in dense.shape)
    padded = jnp.pad(dense, [(0, 4 * b + 1 - g) for b, g in zip(bdims, dense.shape)],
                     mode="edge")
    bx, by, bz = bdims
    corners = [padded[a:a + 4 * bx - 3:4, b:b + 4 * by - 3:4, c:c + 4 * bz - 3:4]
               for a in range(5) for b in range(5) for c in range(5)]
    atlas = jnp.stack(corners, axis=-1).reshape(bx * by * bz, 125)
    return jnp.pad(atlas, ((0, 0), (0, 3))).astype(dtype)


def brick_atlas_dims(grid_dim) -> Tuple[int, int, int]:
    return tuple(-(-(int(g) - 1) // 4) for g in grid_dim)


def _brick_coords(fused: "FusedGrids", xyz: jnp.ndarray):
    """[..., 3] coords in [-1,1] -> (brickflat [...], frac [..., 3]): the
    flat brick-atlas row of each sample's cell and the sample's position
    inside the brick's 5^3 corner lattice (hat-weight argument)."""
    gx, gy, gz = fused.grid_dim
    by = -(-(gy - 1) // 4)
    bz = -(-(gz - 1) // 4)
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    cell = jnp.clip(jnp.floor(p), 0.0, g - 2.0).astype(jnp.int32)
    brick = cell // 4
    brickflat = (brick[..., 0] * by + brick[..., 1]) * bz + brick[..., 2]
    frac = p - 4.0 * brick.astype(jnp.float32)
    return brickflat, frac


def _hat_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] in-brick positions -> [..., 128] trilinear hat weights over
    the 5^3 corner lattice (lane a*25+b*5+c; 3 dead pad lanes get weight 0).

    Per-LANE constants (iota decode) against [..., 1] broadcasts — XLA fuses
    this with the row gather and the reduction into one pass."""
    lane = jnp.arange(128)
    a = (lane // 25).astype(jnp.float32)
    b = ((lane // 5) % 5).astype(jnp.float32)
    c = (lane % 5).astype(jnp.float32)
    shape = (1,) * (frac.ndim - 1) + (128,)
    a, b, c = (x.reshape(shape) for x in (a, b, c))
    return (jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 0:1] - a))
            * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 1:2] - b))
            * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 2:3] - c)))


def sample_density_brick(fused: FusedGrids, xyz: jnp.ndarray,
                         splus_shift: float) -> jnp.ndarray:
    """Pre-activation density + shift at [P,3] coords in [-1,1] via one
    brick-atlas gather + a dense 125-lane hat-product reduction. Exact
    (identical arithmetic to the 8-corner cell interpolation: the hat
    weights are nonzero exactly at the sample's 8 cell corners).

    The weight build uses per-LANE constants (iota decode of the a*25+b*5+c
    layout) against [P,1] broadcasts, which XLA fuses with the gather and the
    reduction into one pass — measured 15.8 ms for 3.1M samples on v5e vs
    ~34 ms for the [P,5]-outer-product formulation (materialized [P,125]
    intermediates) and ~31 ms for gather + a Pallas reduction kernel
    (ops/pallas_interp.py, kept as the measured-slower alternative)."""
    brickflat, frac = _brick_coords(fused, xyz)
    rows = jnp.take(fused.brick_atlas, brickflat, axis=0)
    w = _hat_weights(frac)
    return jnp.sum(rows.astype(jnp.float32) * w, axis=1) + splus_shift


def span_rows_required(state_units, step_size: float,
                       span_len: int) -> int:
    """Worst-case distinct bricks visited by ``span_len`` consecutive ray
    samples spaced ``step_size`` (world units): 1 + per-axis brick-boundary
    crossings, assuming |d_a| = 1 in every axis simultaneously (conservative
    — a unit direction cannot, so this upper-bounds the true maximum).

    ``state_units``: per-axis world size of one voxel ((aabb1-aabb0)/(g-1)).
    All arguments host-concrete — call before tracing to validate
    ``RenderConfig.fine_span_rows`` (see sample_density_brick_span)."""
    import numpy as _np
    units = _np.asarray(state_units, dtype=_np.float64)
    span_vox = float(step_size) * max(span_len - 1, 0) / units
    return 1 + int(_np.sum(_np.floor(span_vox / 4.0) + 1))


def sample_density_brick_span(fused: FusedGrids, xyz: jnp.ndarray,
                              splus_shift: float,
                              rows_per_span: int) -> jnp.ndarray:
    """Pre-activation density + shift at [R, K, T, 3] coords in [-1,1] where
    the T samples of each (ray, span) are CONSECUTIVE along the ray —
    ``rows_per_span`` brick-atlas gathers per span instead of T.

    Along a straight line each axis's brick index is monotone, so the spans'
    samples visit a staircase of at most 1 + (#boundary crossings) distinct
    bricks; at the production spacing (sub_stride 8 samples at step_ratio
    0.25 => 1.75-voxel span per axis vs 4-voxel bricks) that is <= 4, vs 8
    per-sample gathers. Each sample indexes its run (cumsum of brick
    transitions, clamped to rows_per_span-1) and the interp selects among
    the gathered rows with a W-way masked accumulate that XLA fuses with the
    hat reduction — row values and hat weights are bit-identical to
    sample_density_brick, so the result is too (adding exact zeros).

    EXACTNESS CONTRACT: requires the true per-span transition count to fit
    in rows_per_span - 1; callers must validate with span_rows_required
    (render.validate_fine_span does) — the clamp would otherwise silently
    evaluate tail samples in a wrong (earlier) brick. Gather traffic: the
    random row-gather rate depends on ROW COUNT (PERFORMANCE.md), so
    K*rows_per_span rows/ray vs K*T is the whole win."""
    R, K, T, _ = xyz.shape
    W = rows_per_span
    brickflat, frac = _brick_coords(fused, xyz)               # [R,K,T](,3)
    tr = brickflat[..., 1:] != brickflat[..., :-1]            # [R,K,T-1]
    run = jnp.cumsum(tr.astype(jnp.int32), axis=-1)
    run = jnp.pad(run, ((0, 0), (0, 0), (1, 0)))              # [R,K,T]
    run = jnp.minimum(run, W - 1)
    eq = run[..., None] == jnp.arange(W, dtype=jnp.int32)     # [R,K,T,W]
    # run r's brick id: all samples in a run share it, so any masked reduce
    # works; empty runs (fewer transitions than W-1) fall back to row 0 of
    # the atlas, which no sample indexes
    rowbrick = jnp.max(jnp.where(eq, brickflat[..., None], -1), axis=2)
    rows = jnp.take(fused.brick_atlas, jnp.maximum(rowbrick, 0).reshape(-1),
                    axis=0).reshape(R, K, W, 128).astype(jnp.float32)
    # W-way masked row select (adding exact zeros), then ONE hat reduce —
    # W+1 fused passes over [R,K,T,128] instead of W multiply-reduces
    sel = jnp.zeros((R, K, T, 128), jnp.float32)
    for r in range(W):
        sel = sel + jnp.where(eq[..., r, None], rows[:, :, r][:, :, None, :],
                              0.0)
    w = _hat_weights(frac)                                    # [R,K,T,128]
    return jnp.sum(sel * w, axis=-1) + splus_shift


def build_compact_tables(fused: FusedGrids, occ_raw_thres: float,
                         capacity: int,
                         mask: Optional[jnp.ndarray] = None,
                         cells_per_row: int = 1) -> FusedGrids:
    """Compact the corner-feature tables down to cells inside occupied bricks.

    Layout: brick (supervoxel block) with slot s>0 owns rows
    [s*sv^3, (s+1)*sv^3) of each compact table, cell-major within the brick;
    slot 0 is the zero sentinel brick — samples in unoccupied bricks read
    zero features, which the renderer's weight mask already discards (their
    per-sample alpha is below occ_alpha_thres by construction).
    Jittable with static ``capacity``; occupied bricks beyond capacity would
    be silently dropped, so callers must size it via count_occupied_bricks.

    ``cells_per_row`` > 1 packs that many consecutive compact cells (z-
    adjacent within a brick) into one wider row: the table drops to 1/c the
    rows at c x the lanes, and sample_feature_fused gathers the shared row
    and selects the owning segment. The v5e random-gather rate cliffs on
    table ROW COUNT (PERFORMANCE.md), so fewer, wider rows gather faster
    when the select stays fused. Must divide sv^3.
    """
    occ0 = fused.coarse_occ[:, 0]
    C = occ0.shape[0]
    cx, cy, cz = fused.coarse_dim
    gx, gy, gz = fused.grid_dim
    sv = fused.supervoxel
    B = sv ** 3
    if mask is None:
        mask = occ0 > occ_raw_thres
    (ids,) = jnp.nonzero(mask, size=capacity, fill_value=C)
    slots = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    slot0 = jnp.zeros((C,), jnp.int32).at[ids].set(slots, mode="drop")
    slot_map = jnp.repeat(slot0[:, None], 8, axis=1)

    bx = ids // (cy * cz)
    by = (ids // cz) % cy
    bz = ids % cz
    off = jnp.arange(sv, dtype=jnp.int32)
    lx, ly, lz = jnp.meshgrid(off, off, off, indexing="ij")
    cxi = jnp.clip(bx[:, None] * sv + lx.reshape(-1)[None, :], 0, gx - 2)
    cyi = jnp.clip(by[:, None] * sv + ly.reshape(-1)[None, :], 0, gy - 2)
    czi = jnp.clip(bz[:, None] * sv + lz.reshape(-1)[None, :], 0, gz - 2)
    cell_flat = ((cxi * (gy - 1) + cyi) * (gz - 1) + czi).reshape(-1)

    if cells_per_row < 1 or B % cells_per_row:
        raise ValueError(f"cells_per_row={cells_per_row} must divide sv^3={B}")
    compact_fc = {}
    for name, tab in fused.feature_cells.items():
        rows = jnp.take(tab, cell_flat, axis=0)
        packed = jnp.concatenate(
            [jnp.zeros((B, rows.shape[-1]), rows.dtype), rows])
        if cells_per_row > 1:
            packed = packed.reshape(packed.shape[0] // cells_per_row,
                                    cells_per_row * packed.shape[-1])
        compact_fc[name] = packed
    return fused._replace(feature_cells={}, slot_map=slot_map,
                          compact_feature_cells=compact_fc,
                          compact_cells=cell_flat)


def build_render_grids(params: dict, mcfg, rcfg, state_r,
                       compact: bool = True,
                       feature_dtype=jnp.bfloat16,
                       dense_override=None,
                       feature_cells_per_row: int = 1,
                       atlas_dtype=jnp.float32) -> FusedGrids:
    """Host-side driver for the full inference fast path: corner appearance
    rows (bf16), coarse occupancy for two-level empty-space skipping, and —
    when ``compact`` — occupancy-compacted tables sized to the scene.

    Capacity is bucketed in ~25% steps snapped to multiples of 256
    (``compact_capacity_bucket``) so the jitted builder/render recompile only
    when occupancy crosses a bucket boundary, and the one host sync per build
    is a 4-byte scalar.
    """
    corner = ("appearance",) if "appearance" in params else ()
    # grid-variant models (semantic/instance as VM branches rather than
    # xyz-MLPs): fuse the two co-sampled branches into one corner table
    # (see build_fused_grids multibranch)
    mb = (("semantic", "instance")
          if "semantic" in params and "instance" in params else ())
    dtype_name = jnp.dtype(feature_dtype).name
    atlas_dtype_name = jnp.dtype(atlas_dtype).name
    has_dense = dense_override is not None
    # minimal conservative tight-occupancy window for the ACTUAL step
    # geometry (advisor r2: validate the precondition instead of assuming it)
    pads = (3, 3)
    if rcfg.sub_stride:
        pads = tight_occ_pads(rcfg.sub_stride, float(state_r.step_size),
                              float(jnp.min(state_r.units)))
    if not compact:
        return _cached_builder(mcfg, corner, dtype_name, None, None,
                               has_dense, pads, multibranch=mb,
                               atlas_dtype_name=atlas_dtype_name)(
                                   params, dense_override)
    thres = raw_occupancy_threshold(
        mcfg.splus_density_shift, float(state_r.step_size),
        rcfg.distance_scale, rcfg.occ_alpha_thres)
    # feature rows compact at the (higher) raymarch weight threshold against
    # the UNDILATED brick max — exact for composited maps (see
    # build_fused_grids) and 2-3x fewer rows than the dilated occupancy set
    feat_thres = raw_occupancy_threshold(
        mcfg.splus_density_shift, float(state_r.step_size),
        rcfg.distance_scale, rcfg.raymarch_weight_thres)
    n_feat = int(_cached_counter(feat_thres, has_dense,
                                 undilated=True)(params, dense_override))
    cap = compact_capacity_bucket(n_feat)
    return _cached_builder(mcfg, corner, dtype_name, cap, thres,
                           has_dense, pads, feat_thres,
                           feature_cells_per_row,
                           multibranch=mb,
                           atlas_dtype_name=atlas_dtype_name)(
                               params, dense_override)


@functools.lru_cache(maxsize=16)
def _cached_counter(thres: float, has_dense: bool = False,
                    undilated: bool = False):
    def _count(p, dense_override):
        dense = dense_override if has_dense else build_dense_density(p)
        if undilated:
            # must mirror the feature-compaction mask (_block_node_max):
            # the counter sizes the capacity for exactly that mask
            vals = _block_node_max(dense, 4).reshape(-1)
        else:
            vals = _build_coarse_occ(dense, 4)[0][:, 0]
        return jnp.sum(vals > thres)
    return jax.jit(_count)


@functools.lru_cache(maxsize=16)
def _cached_builder(mcfg, corner, dtype_name, cap, thres, has_dense=False,
                    tight_pads=(3, 3), feat_raw_thres=None,
                    feature_cells_per_row=1, multibranch=(),
                    atlas_dtype_name="float32"):
    # thres keys the cache, so the baked occupancy bits can never be reused
    # with a different alpha test (same contract as the compact slot tables)
    return jax.jit(lambda p, dense_override: build_fused_grids(
        p, mcfg, feature_dtype=jnp.dtype(dtype_name), corner_features=corner,
        with_occupancy=True, compact_capacity=cap, occ_raw_thres=thres,
        dense_override=dense_override if has_dense else None,
        with_atlas=True, atlas_dtype=jnp.dtype(atlas_dtype_name),
        with_occ_groups=True, tight_pads=tight_pads,
        feat_raw_thres=feat_raw_thres, occ_bits_thres=thres,
        feature_cells_per_row=feature_cells_per_row,
        multibranch=multibranch))


def build_density_only(params: dict, with_atlas: bool = False,
                       with_occupancy: bool = False) -> FusedGrids:
    """Density-only fused grids (for the training passes whose density is
    stop-gradient: instance + segment renders). Cheap enough to rebuild every
    step (~10-40 ms of einsums + slicing). ``with_atlas`` is OFF here:
    measured on v5e, the per-step atlas build (125 lane-strided slices =
    Mosaic relayouts) costs more than the faster gathers save at training
    sample counts (full step 0.85 -> 0.80 steps/s); the atlas pays off only
    when amortized across an inference render. ``with_occupancy`` adds the
    block-dilated coarse grid for train-time empty-space skipping (two
    reduce_windows — cheap per step; the grouped/neighborhood tables are
    deliberately NOT built here for the same relayout-cost reason as the
    atlas)."""
    dense = build_dense_density(params)
    atlas = _build_brick_atlas(dense) if with_atlas else None
    coarse_occ, coarse_dim = (None, None)
    if with_occupancy:
        coarse_occ, coarse_dim, _, _ = _build_coarse_occ(dense, 4)
    return FusedGrids(_cell_corner_grid(dense), dense.shape, {}, {},
                      coarse_occ=coarse_occ, coarse_dim=coarse_dim,
                      brick_atlas=atlas)


def sample_coarse_occ(fused: FusedGrids, xyz: jnp.ndarray,
                      tight: bool = False) -> jnp.ndarray:
    """Raw-density upper bound at [P,3] coords in [-1,1] (nearest supervoxel).

    ``tight`` samples the one-voxel-margin grid (sub-segment tests) instead
    of the block-dilated one (segment tests)."""
    gx, gy, gz = fused.grid_dim
    cx, cy, cz = fused.coarse_dim
    sv = fused.supervoxel
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(p.astype(jnp.int32) // sv, 0,
                 jnp.asarray((cx - 1, cy - 1, cz - 1), jnp.int32))
    flat = (i[:, 0] * cy + i[:, 1]) * cz + i[:, 2]
    table = fused.coarse_occ_tight if tight else fused.coarse_occ
    return jnp.take(table, flat, axis=0)[:, 0]


def _cell_coords(grid_dim, xyz: jnp.ndarray):
    g = jnp.asarray(grid_dim, jnp.float32)
    p = (xyz + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(jnp.floor(p), 0.0, g - 2.0)
    f = p - i
    return i.astype(jnp.int32), f


def _corner_weights(f: jnp.ndarray) -> jnp.ndarray:
    """Trilinear corner weights [P, 8] from in-cell fractions [P, 3]."""
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]
    return jnp.concatenate([
        (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
        (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
        fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
        fx * fy * (1 - fz), fx * fy * fz], axis=-1)


def _compact_row_index(fused: FusedGrids, i: jnp.ndarray) -> jnp.ndarray:
    """Cell coords [P,3] -> row index into the compact tables (slot gather +
    in-brick offset arithmetic). Empty bricks land in sentinel rows [0, sv^3)."""
    cx, cy, cz = fused.coarse_dim
    sv = fused.supervoxel
    brick = jnp.minimum(i // sv, jnp.asarray((cx - 1, cy - 1, cz - 1)))
    brickflat = (brick[:, 0] * cy + brick[:, 1]) * cz + brick[:, 2]
    slot = jnp.take(fused.slot_map, brickflat, axis=0)[:, 0]
    local = i - brick * sv
    localflat = (local[:, 0] * sv + local[:, 1]) * sv + local[:, 2]
    return slot * (sv ** 3) + localflat


def sample_density_fused(fused: FusedGrids, xyz: jnp.ndarray,
                         splus_shift: float) -> jnp.ndarray:
    """Pre-activation density + shift at [P,3] coords in [-1,1]; one gather."""
    gx, gy, gz = fused.grid_dim
    i, f = _cell_coords(fused.grid_dim, xyz)
    flat_idx = (i[:, 0] * (gy - 1) + i[:, 1]) * (gz - 1) + i[:, 2]
    rows = jnp.take(fused.density_cells, flat_idx, axis=0)  # [P, 8]
    return jnp.sum(rows * _corner_weights(f), axis=-1) + splus_shift


def sample_feature_fused(fused: FusedGrids, name: str, xyz: jnp.ndarray,
                         out_dim: Optional[int] = None) -> jnp.ndarray:
    """Projected branch features at [P,3] coords in [-1,1].

    Uses the single-gather cell-corner grid (compacted variant when present),
    else 8 row-gathers on the dense grid. Corner rows are per-corner
    lane-padded, so ``out_dim`` (static) is required to slice the true width
    when the corner path is taken with a padded table.
    """
    gx, gy, gz = fused.grid_dim
    i, f = _cell_coords(fused.grid_dim, xyz)
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    cells = fused.compact_feature_cells.get(name)
    if cells is not None:
        if out_dim is None:
            # without the true width the packing factor (cells_per_row) is
            # unrecoverable: a packed table would be row-indexed in the
            # UNpacked layout and jnp.take would clamp silently
            raise ValueError(
                "sample_feature_fused requires out_dim with a compact table")
        pos = _compact_row_index(fused, i)
        base = 8 * _corner_pad(out_dim)
        cpr = cells.shape[1] // base
        if cpr > 1:
            # packed table (build_compact_tables cells_per_row): gather the
            # shared wide row, select the owning cell segment — a (cpr-1)-
            # deep where chain XLA fuses into the hat-product consumer
            g = jnp.take(cells, pos // cpr, axis=0).reshape(-1, cpr, base)
            sub = pos % cpr
            rows = g[:, 0]
            for s in range(1, cpr):
                rows = jnp.where((sub == s)[:, None], g[:, s], rows)
        else:
            rows = jnp.take(cells, pos, axis=0)
    elif name in fused.feature_cells:
        flat_idx = (i[:, 0] * (gy - 1) + i[:, 1]) * (gz - 1) + i[:, 2]
        rows = jnp.take(fused.feature_cells[name], flat_idx, axis=0)
    else:
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

    rows = rows.astype(jnp.float32).reshape(rows.shape[0], 8, -1)
    w = _corner_weights(f)[..., None]                       # [P, 8, 1]
    out = jnp.sum(rows * w, axis=1)                         # [P, pad(F)]
    return out if out_dim is None else out[:, :out_dim]


def _fresh_runs(fused: FusedGrids, xyz_n: jnp.ndarray, live: jnp.ndarray):
    """Shared run detection for the head-gather dedup: flat cell key per
    sample and the first-occurrence flag of each live unique-cell RUN along
    the time axis (cell indices are monotone per axis, so no sort needed).
    Both the slot builder and the calibration probe MUST use the same run
    definition — keep them on this helper."""
    R, S, _ = xyz_n.shape
    gx, gy, gz = fused.grid_dim
    i, _ = _cell_coords(fused.grid_dim, xyz_n.reshape(-1, 3))
    key = ((i[:, 0] * (gy - 1) + i[:, 1]) * (gz - 1) + i[:, 2]).reshape(R, S)
    prev_key = jnp.pad(key[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    prev_live = jnp.pad(live[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    fresh = live & ((key != prev_key) | ~prev_live)
    return key, fresh


def head_dedup_slots(fused: FusedGrids, xyz_n: jnp.ndarray, live: jnp.ndarray,
                     cap: int):
    """Per-ray unique-CELL slots for the head feature gathers.

    The top-k head samples of a ray cluster around surfaces at a fraction of
    a voxel per step, so several samples share one interpolation cell (~2.5x
    redundancy measured at the bench point). Along the time axis each axis'
    cell index is monotone, so equal-cell LIVE samples form contiguous runs —
    first-occurrence flags need no sort.

    xyz_n [R,S,3] time-ordered samples, live [R,S] (weight above the head
    mask threshold) -> (slot [R,S] int32 in [0,cap), uid [R,cap] flat cell
    key per unique run, tail = fraction of live samples whose run index
    overflowed cap — 0 means the dedup is EXACT this batch)."""
    key, fresh = _fresh_runs(fused, xyz_n, live)
    slotc = jnp.cumsum(fresh.astype(jnp.int32), axis=1) - 1
    n_live = jnp.maximum(jnp.sum(live), 1)
    tail = jnp.sum(live & (slotc >= cap)) / n_live.astype(jnp.float32)
    slot = jnp.clip(slotc, 0, cap - 1)
    hot = fresh[:, :, None] & (slotc[:, :, None]
                               == jnp.arange(cap, dtype=jnp.int32))
    uid = jnp.sum(jnp.where(hot, key[:, :, None], 0), axis=1)      # [R,cap]
    return slot, uid, tail


def head_dedup_run_counts(fused: FusedGrids, xyz_n: jnp.ndarray,
                          live: jnp.ndarray) -> jnp.ndarray:
    """Per-ray count of live unique-cell RUNS (the budget head_dedup_slots
    needs) — the calibration probe for RenderConfig.head_dedup_cells."""
    _, fresh = _fresh_runs(fused, xyz_n, live)
    return jnp.sum(fresh, axis=1)


def sample_feature_dedup(fused: FusedGrids, name: str, uid: jnp.ndarray,
                         slot_k: jnp.ndarray, xyz_k: jnp.ndarray,
                         out_dim: int) -> jnp.ndarray:
    """Head features at the top-k samples via one gather per UNIQUE cell.

    uid [R,cap] flat cell keys (head_dedup_slots), slot_k [R,k] each sample's
    unique-run index, xyz_k [R,k,3] the sample coords (for the in-cell
    fractions). The expensive wide-row gather runs R*cap times instead of
    R*k; samples then pick their row from the small per-ray block (a gather
    on an R*cap-row table, much faster per row). Exact whenever
    head_dedup_slots reported tail == 0."""
    R, cap = uid.shape
    k = slot_k.shape[1]
    gx, gy, gz = fused.grid_dim
    uid_f = uid.reshape(-1)
    iz = uid_f % (gz - 1)
    iy = (uid_f // (gz - 1)) % (gy - 1)
    ix = uid_f // ((gz - 1) * (gy - 1))
    i_u = jnp.stack([ix, iy, iz], axis=-1)                      # [R*cap, 3]
    cells = fused.compact_feature_cells.get(name)
    if cells is not None:
        if cells.shape[1] // (8 * _corner_pad(out_dim)) > 1:
            raise ValueError(
                "head_dedup_cells does not support packed compact tables "
                "(build_compact_tables cells_per_row > 1) — the per-unique-"
                "cell gather gains nothing from packing")
        rows_u = jnp.take(cells, _compact_row_index(fused, i_u), axis=0)
    else:
        rows_u = jnp.take(fused.feature_cells[name], uid_f, axis=0)
    W = rows_u.shape[-1]
    # redistribute unique rows to samples as a one-hot batched matmul — a
    # take_along_axis over the 256-lane axis lowers to a per-lane gather on
    # TPU (measured +5 ms at the bench point); the [k, cap] x [cap, W] dot
    # rides the MXU instead (~0.8 GFlop per chunk, negligible)
    hot = (slot_k[..., None]
           == jnp.arange(cap, dtype=jnp.int32)).astype(rows_u.dtype)
    rows_k = jnp.einsum("rkc,rcw->rkw", hot, rows_u.reshape(R, cap, W))
    _, f = _cell_coords(fused.grid_dim, xyz_k.reshape(-1, 3))
    rows = rows_k.reshape(R * k, 8, -1).astype(jnp.float32)
    w = _corner_weights(f)[..., None]
    out = jnp.sum(rows * w, axis=1)
    return out[:, :out_dim]
