"""Volume renderer for the TensoRF panoptic field — static-shape, TPU-first.

Replaces the reference ``TensoRFRenderer`` (reference:
model/renderer/panopli_tensoRF_renderer.py:37-816). Key differences from the
CUDA/torch design, dictated by XLA:

  * every ray carries a fixed ``n_samples`` (AABB-clipped uniform stepping);
    out-of-box samples are masked, not dropped — boolean fancy-indexing
    becomes dense compute + ``where`` masks;
  * the reference skips head evaluation where ``weight <= raymarch_weight_thres``;
    we evaluate densely and zero the outputs with the same mask, so composited
    maps are numerically identical while the compute stays static-shape;
  * the whole pass (density -> transmittance -> heads -> composite) is one
    jitted function; "chunking" is handled by the caller slicing the ray axis
    (train) or by pjit-sharding rays across chips (scale-out).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tensorf as tf
from ..ops.compositing import composite, distortion_loss, raw_to_alpha
from ..ops.fused_grid import (FusedGrids, head_dedup_slots,
                              sample_coarse_occ, sample_density_brick,
                              sample_density_brick_span, sample_density_fused,
                              sample_feature_dedup, sample_feature_fused,
                              sample_occ_bits_grouped, sample_occ_grouped,
                              span_rows_required)


@dataclass(frozen=True)
class RenderConfig:
    """Static renderer knobs (hashable; safe as a jit static arg)."""
    n_samples: int
    num_semantic_classes: int
    dim_feature_instance: int
    semantic_weight_mode: str = "softmax"   # none|softmax|argmax
    stop_semantic_grad: bool = True
    feature_stop_grad: bool = False
    distance_scale: float = 25.0
    raymarch_weight_thres: float = 1e-4
    alpha_mask_threshold: float = 0.0075
    perturb: float = 1.0
    white_bg: bool = False
    # TPU perf knobs (no reference equivalent):
    # head_topk: evaluate the expensive heads only on the top-k samples per
    # ray by compositing weight — the static-shape answer to the reference's
    # boolean-indexing sparsity (weight > raymarch_weight_thres skips ~95% of
    # samples, panopli_tensoRF_renderer.py:103). Exact whenever <= k samples
    # per ray clear the threshold. None = dense evaluation.
    head_topk: Optional[int] = None
    # optional smaller budget for the semantic/instance MLPs (they are the
    # FLOP-heavy heads; their outputs feed argmax/clustering and tolerate a
    # tighter cut than rgb). Uses the first k2 of the weight-sorted top-k
    # samples, so it costs nothing extra. None = same as head_topk.
    head_topk_semins: Optional[int] = None
    # bf16 for head MLP matmuls (grids + transmittance stay fp32)
    head_dtype: str = "float32"
    # brick-atlas storage dtype for the fine density pass ("float32" |
    # "bfloat16"). The interp accumulates in f32 either way; bf16 halves the
    # atlas HBM footprint and read bytes but NOT the row count (the gather
    # is row-rate-bound, so it measured neutral-to-−1.4% across rounds 4-5).
    # A fidelity-affecting knob: adopt only behind the PQ gate
    # (tools/pq_fidelity_gate.py --atlas_dtype bfloat16), like head_dtype.
    atlas_dtype: str = "float32"
    # two-level empty-space skipping (inference): test coarse segments of
    # ``coarse_stride`` samples against a conservative occupancy grid, keep the
    # ``max_segments`` nearest occupied segments and evaluate density only
    # there. A segment is occupied when its density upper bound yields
    # per-sample alpha > occ_alpha_thres; skipped samples at the empty-space
    # floor alpha≈3e-6 perturb transmittance by <0.5% over 1324 samples.
    coarse_stride: Optional[int] = None
    max_segments: int = 48
    occ_alpha_thres: float = 1e-5
    # third ESS level: within the chosen coarse segments, test sub-segments
    # of ``sub_stride`` samples against the one-voxel-margin occupancy
    # (coarse_occ_tight) and keep only the nearest ``max_subsegments``
    # occupied ones. Same conservative contract as level two; cuts the fine
    # density budget ~2.5x on surface fields. None = off.
    sub_stride: Optional[int] = None
    max_subsegments: int = 24
    # heavy/light ray bucketing: a static per-chunk budget must cover the
    # p99.9 ray, but ~90% of rays cross far fewer occupied sub-segments.
    # With max_subsegments_light > 0, rays are ranked by occupied-sub-segment
    # count; the top ``heavy_fraction`` get the full ``max_subsegments``
    # budget and the rest evaluate only ``max_subsegments_light`` — two
    # static-shape fine passes instead of one worst-case one (~2x fewer fine
    # gathers; the gather wall is the render's dominant cost). Calibrated by
    # ``calibrate_budgets``; 0 disables. A light ray needing more than the
    # light budget (out-of-probe views) surfaces in ``budget_tail``.
    max_subsegments_light: int = 0
    heavy_fraction: float = 0.125
    # grouped occupancy tests: one 5^3-neighborhood row gather serves
    # occ_group_l1 consecutive L1 segment tests (resp. all n_sub L2 tests of
    # one segment). Sizes are step-geometry-dependent — derive them with
    # ``occ_grouping_for`` (host-side) rather than setting by hand; 0/False =
    # per-test gathers. Selected segments are identical either way.
    occ_group_l1: int = 0
    occ_group_l2: bool = False
    # L2-only selection: with use_l1=False the segment level is skipped and
    # the tight-occupancy bit test runs over ALL sub-segment candidates of
    # the ray (contiguous, so one bit-row gather serves l2_flat_group
    # consecutive tests — bigger groups than the per-segment n_sub). Strictly
    # MORE accurate than the cascade (no segment-budget truncation) and
    # drops the L1 gather + top_k + inter-level glue; whether it is faster
    # depends on the bit-test vs cascade overhead balance — measure. Requires
    # sub_stride; l2_flat_group comes from occ_grouping_for.
    use_l1: bool = True
    l2_flat_group: int = 0
    # two-phase early termination (alternative to heavy/light bucketing):
    # pass A evaluates the nearest ``term_first`` occupied sub-segments for
    # EVERY ray; rays whose residual transmittance after pass A stays above
    # the calibration eps continue — the ``term_fraction`` highest-residual
    # rays evaluate the remaining budget in pass B (weights spliced by
    # T_B *= T_A_residual, exact: transmittance is multiplicative across
    # contiguous rank blocks). This buckets by MEASURED absorption instead
    # of occupied-sub counts, so opaque-surface rays stop at the first
    # crossing. A non-continued ray's missing weight is bounded by its
    # residual, which feeds budget_tail. Calibrated by calibrate_budgets;
    # 0 disables. Requires sub_stride; supersedes max_subsegments_light.
    term_first: int = 0
    term_fraction: float = 0.25
    # two-phase head evaluation (the head analog of term_first): heads run
    # on the ``head_term_first`` highest-weight samples for EVERY ray; only
    # the ``head_term_fraction`` rays whose DROPPED WEIGHT MASS
    # (sum of w_k[:, head_term_first:], the compositing weight pass B would
    # add back) is greatest evaluate the remaining head_topk -
    # head_term_first samples, and their contributions are added back per
    # ray (head maps are weighted SUMS, so the splice is exact addition).
    # Error contract: a non-survivor ray's map error is bounded per channel
    # by its dropped mass times the head output range (rgb/softmax outputs
    # are in [0,1]); the head_tail guardrail reports the max dropped mass
    # over non-survivors. Calibrated by calibrate_budgets(head_term=True)
    # to keep that mass below head_tail_eps on probe rays; 0 disables.
    # Requires head_topk; inference only.
    head_term_first: int = 0
    head_term_fraction: float = 0.25
    # tail completion for the top-k head compaction (inference only): the
    # FULL weight vector is computed before the top-k cut, so the exact
    # above-threshold mass the cut drops is free. Completion renormalizes
    # rgb_map and instance_map by (full masked mass / kept masked mass),
    # i.e. it credits the dropped tail with the kept samples' weighted-mean
    # value — on trained fields the tail samples are deeper samples of the
    # SAME surface, so the residual error drops from O(tail_mass * value
    # range) to O(tail_mass * within-surface value spread). Exactly a no-op
    # (ratio == 1) whenever the top-k captures every above-threshold sample,
    # so the exactness contract of head_topk is preserved. semantic_map is
    # NOT completed: its argmax is invariant to a positive per-ray scalar and
    # the softmax postprocess renormalizes anyway. In semantic_weight_mode
    # "argmax" the instance composite is a one-hot pick (top-1 is always in
    # top-k) and is skipped too. The head_tail guardrail keeps reporting the
    # raw dropped mass (an upper bound on the REMAINING error after
    # completion). Measured (round 4, trained e2e field, k=24 vs dense):
    # rgb p99 err 0.058 -> ~1e-3-level; adjudicated by the PQ^scene gate.
    head_tail_complete: bool = False
    # unique-cell dedup for the head feature gathers: gather the wide corner
    # rows once per live unique-cell RUN per ray (equal-cell samples are
    # contiguous in time — no sort) and redistribute per sample. EXACT while
    # per-ray run counts stay <= cap (dedup_tail output guards it). OPT-IN
    # and measured SLOWER at the bench point (8.7 vs 4.8 ms: dead-gap
    # splitting pushes the exact cap to ~head_topk, and the one-hot
    # redistribution costs 3.8 ms — tools/microbench_dedup.py); only worth
    # trying on fields whose run counts sit far below k. None = per-sample
    # gathers (default). Requires head_topk.
    head_dedup_cells: Optional[int] = None
    # how the k head samples are picked per ray (the [R, S] weight sort was
    # a measurable block once everything else shrank — the same lesson as
    # the round-5 ESS rank-select):
    #  * "sort": lax.top_k — the k heaviest samples, XLA lowers to a full
    #    [R, S] sort.
    #  * "iter": EXACT top-k via k argmax+mask passes (lax.scan) — the same
    #    set, order, and tie-breaking (lowest index first) as lax.top_k but
    #    O(S*k) VPU reduces instead of the sort; a pure implementation swap
    #    with no fidelity contract change, worthwhile when k is small.
    #  * "rank": the k NEAREST above-threshold samples (first k set bits of
    #    weight > raymarch_weight_thres via _first_k_set). Whenever <= k
    #    samples clear the threshold this keeps the IDENTICAL set as top-k
    #    (below-threshold entries are masked to zero in every head
    #    composite); beyond that it keeps the nearest mass instead of the
    #    heaviest — on sharp trained fields those coincide, but on THICK
    #    fields the nearest above-threshold samples can be rising-edge dust
    #    while the real surface mass sits deeper (measured: dropped-mass
    #    0.998 on the smoke shell field), so "rank" must be adjudicated by
    #    the PQ gate per field class. head_tail under "rank" reports the max
    #    per-ray DROPPED above-threshold MASS (the completion residual
    #    bound) instead of the k-th kept weight; "rank" falls back to "sort"
    #    in semantic_weight_mode "argmax", whose one-hot pick needs the
    #    globally heaviest sample. All modes apply to the inference head
    #    compaction and the train-side _aux_topk alike.
    head_select: str = "sort"
    # fine-pass brick-atlas gather granularity: None = one atlas-row gather
    # per fine sample (default); an int W = W gathers per SUB-SEGMENT shared
    # by its sub_stride consecutive samples (their bricks form a monotone
    # staircase along the ray — see ops.fused_grid.sample_density_brick_span).
    # EXACT only when every span's brick-transition count fits in W-1:
    # callers must check validate_fine_span(rcfg, state) (render_frames and
    # calibrate_budgets do). W=4 covers any span shorter than 4 voxels per
    # axis (production: 8 samples x 0.25 voxel = 1.75). Measured SLOWER on
    # v5e at the production point (+2.3 ms: the W-way select breaks the
    # gather-fused reduction, re-streaming the selected rows through HBM) —
    # kept as a tested opt-in; see PERFORMANCE.md round-5 span adjudication.
    fine_span_rows: Optional[int] = None

    def __post_init__(self):
        if self.head_topk_semins is not None and self.head_topk is None:
            raise ValueError(
                "head_topk_semins compacts a prefix of the head_topk sort; "
                "set head_topk too (advisor round-2: silently ignored before)")
        # sub_stride >= coarse_stride disables the third level (use_sub);
        # only an ACTIVE non-divisible sub level silently drops samples
        if (self.sub_stride is not None and self.coarse_stride is not None
                and self.sub_stride < self.coarse_stride
                and self.coarse_stride % self.sub_stride != 0):
            raise ValueError(
                f"coarse_stride ({self.coarse_stride}) must be a multiple of "
                f"sub_stride ({self.sub_stride}): the trailing "
                "coarse_stride % sub_stride samples of each segment would "
                "never be covered by any sub-segment candidate")
        if not self.use_l1 and self.sub_stride is None:
            raise ValueError("use_l1=False (L2-only selection) requires "
                             "sub_stride — without it no level tests remain")
        if self.head_dedup_cells is not None and self.head_topk is None:
            raise ValueError(
                "head_dedup_cells dedups the top-k head gather stream; "
                "set head_topk too (same contract as head_topk_semins)")
        if self.head_term_first and self.head_topk is None:
            raise ValueError(
                "head_term_first splits the top-k head sample budget; "
                "set head_topk too (same contract as head_topk_semins)")
        if self.head_select not in ("sort", "iter", "rank"):
            raise ValueError(
                f"head_select must be 'sort', 'iter', or 'rank', got "
                f"{self.head_select!r}")
        if self.fine_span_rows is not None and self.fine_span_rows < 2:
            raise ValueError(
                "fine_span_rows must be >= 2 (1 row cannot cover a span "
                "crossing any brick boundary); None disables span gathers")
        if self.atlas_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"atlas_dtype must be 'float32' or 'bfloat16', got "
                f"{self.atlas_dtype!r}")


class RenderState(NamedTuple):
    """Dynamic renderer state (arrays; changes on AABB shrink)."""
    bbox_aabb: jnp.ndarray   # [2, 3]
    inv_box_extent: jnp.ndarray  # [3] = 2/extent
    units: jnp.ndarray       # [3] voxel size
    step_size: jnp.ndarray   # scalar


def make_render_state(bbox_aabb, grid_dim, step_ratio: float = 0.5) -> RenderState:
    """Derive step size from AABB + grid resolution.

    Reference: panopli_tensoRF_renderer.py:59-71.
    """
    bbox_aabb = jnp.asarray(bbox_aabb, jnp.float32)
    grid_dim = jnp.asarray(grid_dim, jnp.float32)
    extent = bbox_aabb[1] - bbox_aabb[0]
    units = extent / (grid_dim - 1 + 1e-3)
    step_size = jnp.mean(units) * step_ratio
    return RenderState(bbox_aabb, 2.0 / extent, units, step_size)


def compute_n_samples(bbox_aabb, grid_dim, step_ratio: float = 0.5) -> int:
    """Host-side static sample count: box_diag/step + 1 (reference :69-71)."""
    bbox_aabb = np.asarray(bbox_aabb, np.float32)
    grid_dim = np.asarray(grid_dim, np.float32)
    extent = bbox_aabb[1] - bbox_aabb[0]
    units = extent / (grid_dim - 1 + 1e-3)
    step = float(np.mean(units) * step_ratio)
    diag = float(np.sqrt(np.sum(extent**2)))
    return int(diag / step) + 1


def normalize_coordinates(state: RenderState, xyz: jnp.ndarray) -> jnp.ndarray:
    return (xyz - state.bbox_aabb[0]) * state.inv_box_extent - 1.0


def sample_points_in_box(rays, state: RenderState, n_samples: int,
                         perturb: float, rng: Optional[jax.Array], is_train: bool):
    """AABB-clipped uniform samples along each ray.

    rays [R, 8] = [o, d, near, far]. Returns (xyz [R,S,3], z_vals [R,S],
    in_box mask [R,S]). Reference: panopli_tensoRF_renderer.py:800-816.
    """
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    nears, fars = rays[:, 6], rays[:, 7]
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (state.bbox_aabb[1] - rays_o) / vec
    rate_b = (state.bbox_aabb[0] - rays_o) / vec
    t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), nears, fars)

    steps = jnp.arange(n_samples, dtype=jnp.float32)[None, :]  # [1, S]
    if is_train and perturb != 0 and rng is not None:
        jitter = perturb * jax.random.uniform(rng, (rays.shape[0], 1))
        steps = steps + jitter
    z_vals = t_min[:, None] + steps * state.step_size          # [R, S]
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    in_box = jnp.all((xyz >= state.bbox_aabb[0]) & (xyz <= state.bbox_aabb[1]), axis=-1)
    return xyz, z_vals, in_box


def _intervals(z_vals):
    dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                             jnp.zeros_like(z_vals[:, :1])], axis=-1)
    mids = jnp.concatenate([(z_vals[:, 1:] + z_vals[:, :-1]) / 2,
                            z_vals[:, -2:-1]], axis=-1)
    return dists, mids


def _density_weights(params, mcfg, rcfg, state, rays, rng, is_train,
                     stop_grad: bool, fused: Optional[FusedGrids] = None):
    xyz, z_vals, in_box = sample_points_in_box(
        rays, state, rcfg.n_samples, rcfg.perturb, rng, is_train)
    dists, mids = _intervals(z_vals)
    xyz_n = normalize_coordinates(state, xyz)
    flat = xyz_n.reshape(-1, 3)

    def density_fn(p, f):
        if f is not None and f.brick_atlas is not None:
            raw = sample_density_brick(f, flat, mcfg.splus_density_shift)
            sigma = jax.nn.softplus(raw).reshape(xyz.shape[:2])
        elif f is not None:
            raw = sample_density_fused(f, flat, mcfg.splus_density_shift)
            sigma = jax.nn.softplus(raw).reshape(xyz.shape[:2])
        else:
            sigma = tf.compute_density(p, mcfg, flat).reshape(xyz.shape[:2])
        return jnp.where(in_box, sigma, 0.0)

    if stop_grad:
        sigma = density_fn(jax.lax.stop_gradient(params),
                           jax.lax.stop_gradient(fused) if fused is not None else None)
    else:
        sigma = density_fn(params, fused)
    alpha, weight, bg_weight = raw_to_alpha(sigma, dists * rcfg.distance_scale)
    return xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_weight


def occ_grouping_for(rcfg: RenderConfig, state: RenderState,
                     supervoxel: int = 4) -> RenderConfig:
    """Derive feasible grouped-occupancy-test sizes from the step geometry.

    A 5^3-neighborhood row covers block offsets [0, 4] per axis, so a group
    of G consecutive tests is servable by one gather when its total per-axis
    advance (G-1) * stride * step_size stays within 4 supervoxels of the
    WORST axis (units differ per axis on non-cubic boxes). Host-side: reads
    concrete floats from ``state``; call before jitting the render."""
    from dataclasses import replace
    if rcfg.coarse_stride is None:
        return rcfg
    min_unit = float(np.min(np.asarray(state.units)))
    step = float(np.asarray(state.step_size))
    # tolerance must SHRINK the admitted span (err conservative): inflating
    # it could admit a group whose last test advances past the 5-block
    # neighborhood by a float sliver, reading a zero pad lane (false-empty)
    margin = 4 * supervoxel * min_unit * (1 - 1e-6)
    adv1 = rcfg.coarse_stride * step
    g1 = min(8, int(margin / adv1) + 1) if adv1 > 0 else 0
    # L2 grouping (one row per segment serving its n_sub sub-tests) was
    # SLOWER with f32 neighborhood rows (the 128-lane select cost more than
    # the halved gathers saved); with the BIT-PACKED rows the select is a
    # 4-lane word pick, so it wins — the renderer gates on the bit tables
    # being present and falls back to per-test gathers otherwise. Feasible
    # when one segment's sub-midpoint span fits the 5-block neighborhood.
    g2_ok = (rcfg.sub_stride is not None
             and (rcfg.coarse_stride - rcfg.sub_stride) * step <= margin)
    # flat L2 group size (use_l1=False): candidates are contiguous, so the
    # L1-style span bound applies at the sub stride
    adv2 = (rcfg.sub_stride or 0) * step
    g2f = min(8, int(margin / adv2) + 1) if adv2 > 0 else 0
    return replace(rcfg, occ_group_l1=g1 if g1 >= 2 else 0, occ_group_l2=g2_ok,
                   l2_flat_group=g2f if g2f >= 2 else 0)


def _ray_tmin(state: RenderState, rays: jnp.ndarray):
    """AABB entry parameter per ray (slab test, clipped to [near, far])."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    nears, fars = rays[:, 6], rays[:, 7]
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (state.bbox_aabb[1] - rays_o) / vec
    rate_b = (state.bbox_aabb[0] - rays_o) / vec
    t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), nears, fars)
    return rays_o, rays_d, t_min


def _occ_alpha_test(mcfg, rcfg: RenderConfig, state: RenderState, raw_up):
    """occupied = per-sample alpha of the density upper bound > threshold."""
    sigma_up = jax.nn.softplus(raw_up + mcfg.splus_density_shift)
    alpha_up = 1.0 - jnp.exp(-sigma_up * state.step_size * rcfg.distance_scale)
    return alpha_up > rcfg.occ_alpha_thres


def _first_k_set(mask: jnp.ndarray, k: int):
    """Per-row indices of the first ``k`` True entries, in order.

    mask [R, C] -> (idx [R, k] int32 clamped to C-1, valid [R, k] bool).
    Equivalent to the previous ``lax.top_k`` over descending-position scores
    (ESS candidates are time-ordered, so "k highest scores" = "first k set
    bits, nearest-first") but WITHOUT the [R, C] sort: rank-select via a
    cumsum and a comparison-reduce, O(C*k) fused VPU work. The sort was the
    single largest block of the production selection stage (profiled r5:
    prod_select_l2flat 5.3 ms of a 17.2 ms full pass at 8192 rays).
    """
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1)            # [R, C]
    targets = jnp.arange(1, k + 1, dtype=pos.dtype)             # [k]
    # idx of the j-th set bit = #candidates whose running rank is < j
    idx = jnp.sum((pos[:, :, None] < targets[None, None, :]).astype(jnp.int32),
                  axis=1)                                       # [R, k]
    valid = targets[None, :] <= pos[:, -1:]
    return jnp.minimum(idx, mask.shape[1] - 1).astype(jnp.int32), valid


def _select_segments(mcfg, rcfg: RenderConfig, state: RenderState,
                     rays_o, rays_d, t_min, fused: FusedGrids):
    """Level 1: coarse-segment midpoints vs the block-dilated occupancy.

    Returns (seg_idx [R, k_seg] nearest-first, seg_valid [R, k_seg])."""
    cs = rcfg.coarse_stride
    S_c = -(-rcfg.n_samples // cs)
    k_seg = min(rcfg.max_segments, S_c)
    R = rays_o.shape[0]
    has_group = (fused.occ_group is not None
                 or fused.occ_bits_group is not None)
    group = rcfg.occ_group_l1 if has_group else 0
    S_cp = -(-S_c // group) * group if group >= 2 else S_c
    steps_c = (jnp.arange(S_cp, dtype=jnp.float32) * cs + 0.5 * cs) * state.step_size
    z_c = t_min[:, None] + steps_c[None, :]
    xyz_c = rays_o[:, None, :] + rays_d[:, None, :] * z_c[..., None]
    xyz_cn = normalize_coordinates(state, xyz_c)
    if group >= 2 and fused.occ_bits_group is not None:
        # bit-packed rows carry the TEST RESULT (the alpha threshold is
        # baked at build); pad midpoints are just further along the ray
        occupied = sample_occ_bits_grouped(fused, xyz_cn, group)[:, :S_c]
    elif group >= 2:
        # pad midpoints are just further along the ray (same spacing, so the
        # group-span guarantee holds); their occupancy is sliced away
        raw_up = sample_occ_grouped(fused, xyz_cn, group)[:, :S_c]
        occupied = _occ_alpha_test(mcfg, rcfg, state, raw_up)
    else:
        raw_up = sample_coarse_occ(fused, xyz_cn.reshape(-1, 3)).reshape(R, S_cp)
        occupied = _occ_alpha_test(mcfg, rcfg, state, raw_up)
    # nearest occupied segments first (candidates ascend in t, so rank-select
    # replaces the descending-score top_k sort — see _first_k_set)
    seg_idx, seg_valid = _first_k_set(occupied, k_seg)      # [R, k_seg]
    return seg_idx, seg_valid


def _select_subsegments(mcfg, rcfg: RenderConfig, state: RenderState,
                        rays_o, rays_d, t_min, fused: FusedGrids,
                        seg_idx, seg_valid):
    """Level 2: sub-segment midpoints vs the tight-margin occupancy.

    With seg_idx=None (use_l1=False) the candidates are ALL sub-segments of
    the ray in time order — contiguous, so the bit test groups
    ``l2_flat_group`` consecutive candidates per neighborhood-row gather
    (L1-style grouping, larger than the per-segment n_sub).

    Returns (fine_steps [R, k_sub, sub], sample_valid [R, k_sub, sub])."""
    cs = rcfg.coarse_stride
    S = rcfg.n_samples
    sub = rcfg.sub_stride
    n_sub = cs // sub
    R = rays_o.shape[0]
    if seg_idx is None:
        cand = -(-S // sub)
        g = rcfg.l2_flat_group if fused.occ_bits_group_tight is not None else 0
        candp = -(-cand // g) * g if g >= 2 else cand
        # pad candidates are just further along the ray (same spacing, so
        # the group-span guarantee holds); their occupancy is sliced away
        sub_steps_p = (jnp.arange(candp, dtype=jnp.float32) * sub + 0.5 * sub)
        sub_steps = jnp.broadcast_to(sub_steps_p[None, :cand], (R, cand))
        z_s = t_min[:, None] + sub_steps_p[None, :] * state.step_size
        xyz_s = rays_o[:, None, :] + rays_d[:, None, :] * z_s[..., None]
        xyz_sn = normalize_coordinates(state, xyz_s)
        if g >= 2:
            occ2 = sample_occ_bits_grouped(fused, xyz_sn, g,
                                           tight=True)[:, :cand]
        else:
            raw_up2 = sample_coarse_occ(fused, xyz_sn.reshape(-1, 3),
                                        tight=True).reshape(R, candp)[:, :cand]
            occ2 = _occ_alpha_test(mcfg, rcfg, state, raw_up2)
        occ2 = occ2 & (sub_steps < S)
    else:
        k_seg = seg_idx.shape[1]
        cand = k_seg * n_sub
        sub_j = jnp.arange(n_sub, dtype=jnp.float32)
        sub_steps = (seg_idx[..., None].astype(jnp.float32) * cs
                     + sub_j[None, None, :] * sub + 0.5 * sub)  # [R,k,n_sub]
        sub_steps = sub_steps.reshape(R, cand)
        z_s = t_min[:, None] + sub_steps * state.step_size
        xyz_s = rays_o[:, None, :] + rays_d[:, None, :] * z_s[..., None]
        xyz_sn = normalize_coordinates(state, xyz_s)
        if rcfg.occ_group_l2 and fused.occ_bits_group_tight is not None:
            # one bit-packed neighborhood row per SEGMENT serves its n_sub
            # sub-tests (they span <= one segment = a few voxels; gated by
            # occ_grouping_for); the alpha threshold is baked into the bits
            occ2 = sample_occ_bits_grouped(fused, xyz_sn, n_sub, tight=True)
        elif rcfg.occ_group_l2 and fused.occ_group_tight is not None:
            raw_up2 = sample_occ_grouped(fused, xyz_sn, n_sub, tight=True)
            occ2 = _occ_alpha_test(mcfg, rcfg, state, raw_up2)
        else:
            raw_up2 = sample_coarse_occ(fused, xyz_sn.reshape(-1, 3),
                                        tight=True).reshape(R, cand)
            occ2 = _occ_alpha_test(mcfg, rcfg, state, raw_up2)
        occ2 = (occ2
                & jnp.repeat(seg_valid, n_sub, axis=1)
                & (sub_steps < S))
    # candidates are already time-ordered (segments ascend in t, subs
    # ascend within a segment), so the k nearest occupied = the first k set
    # bits — rank-select, no sort (see _first_k_set)
    k_sub = min(rcfg.max_subsegments, cand)
    sub_idx, sub_valid = _first_k_set(occ2, k_sub)      # [R, k_sub]
    if seg_idx is None:
        # L2-flat: candidate j starts at step j*sub — pure index arithmetic.
        # A take_along_axis here lowers to one scalar TPU gather per (ray,
        # slot) = ~230k gathers ≈ 2.4 ms/chunk at the production point
        # (measured, /tmp-microbench round 5) — HALF the selection stage —
        # for values that are a multiply away.
        sub_start = sub_idx.astype(jnp.float32) * sub
    else:
        sub_start = jnp.take_along_axis(sub_steps - 0.5 * sub, sub_idx,
                                        axis=1)
    offs = jnp.arange(sub, dtype=jnp.float32)
    fine_steps = sub_start[..., None] + offs[None, None, :]
    sample_valid = (fine_steps < S) & sub_valid[..., None]
    needed = jnp.sum(occ2, axis=1)                      # occupied subs per ray
    return fine_steps, sample_valid, needed


def _fine_density(mcfg, rcfg: RenderConfig, state: RenderState,
                  rays_o, rays_d, t_min, fused: FusedGrids,
                  fine_steps, sample_valid):
    """Level 3: exact density at the selected fine samples; composite-ready."""
    R = rays_o.shape[0]
    z_vals = (t_min[:, None, None] + fine_steps * state.step_size).reshape(R, -1)
    valid = sample_valid.reshape(R, -1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    in_box = jnp.all((xyz >= state.bbox_aabb[0]) & (xyz <= state.bbox_aabb[1]),
                     axis=-1) & valid
    xyz_n = normalize_coordinates(state, xyz)

    if fused.brick_atlas is not None and rcfg.fine_span_rows is not None:
        # span gathers: fine_span_rows atlas rows per sub-segment instead of
        # one per sample — exactness contract checked host-side by
        # validate_fine_span (samples within a span are consecutive along
        # the ray, which _select_subsegments/_two_level_density guarantee)
        K, T = fine_steps.shape[1], fine_steps.shape[2]
        raw = sample_density_brick_span(fused, xyz_n.reshape(R, K, T, 3),
                                        mcfg.splus_density_shift,
                                        rcfg.fine_span_rows).reshape(-1)
    elif fused.brick_atlas is not None:
        raw = sample_density_brick(fused, xyz_n.reshape(-1, 3),
                                   mcfg.splus_density_shift)
    else:
        raw = sample_density_fused(fused, xyz_n.reshape(-1, 3),
                                   mcfg.splus_density_shift)
    sigma = jax.nn.softplus(raw).reshape(R, -1)
    sigma = jnp.where(in_box, sigma, 0.0)

    # per-sample interval = step (uniform marching), matching the dense path
    dists = jnp.full_like(z_vals, state.step_size)
    mids = z_vals + 0.5 * state.step_size
    alpha, weight, bg_weight = raw_to_alpha(sigma, dists * rcfg.distance_scale)
    return xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_weight


def validate_fine_span(rcfg: RenderConfig, state: RenderState) -> None:
    """Host-side exactness check for ``RenderConfig.fine_span_rows``: the
    span-gather interp (ops.fused_grid.sample_density_brick_span) is exact
    only when every span's brick-transition count fits in fine_span_rows-1;
    span_rows_required upper-bounds it from the CONCRETE voxel size and step
    (both in RenderState), so callers that build jitted renders — the
    render_frames pipeline, calibrate_budgets, bench/profile harnesses —
    call this once before tracing."""
    if rcfg.fine_span_rows is None:
        return
    use_sub = rcfg.sub_stride is not None and rcfg.sub_stride < rcfg.coarse_stride
    span_len = rcfg.sub_stride if use_sub else rcfg.coarse_stride
    need = span_rows_required(np.asarray(state.units),
                              float(state.step_size), int(span_len))
    if need > rcfg.fine_span_rows:
        raise ValueError(
            f"fine_span_rows={rcfg.fine_span_rows} cannot cover the "
            f"worst-case {need} distinct bricks of a {span_len}-sample span "
            f"at this step size ({float(state.step_size):.4g} world units, "
            f"voxels {np.asarray(state.units)}) — raise fine_span_rows to "
            f"{need} or disable span gathers (None)")


def _tail_weight(weight: jnp.ndarray, group: int) -> jnp.ndarray:
    """Max over rays of the compositing weight in the DEEPEST kept group —
    the budget-truncation guardrail signal (0 on a well-calibrated scene)."""
    return jnp.max(jnp.sum(weight[:, -group:], axis=-1))


def _two_level_density(mcfg, rcfg: RenderConfig, state: RenderState,
                       rays: jnp.ndarray, fused: FusedGrids,
                       rng: Optional[jax.Array] = None,
                       is_train: bool = False):
    """Coarse/fine density evaluation with empty-space skipping.

    Returns the _density_weights tuple PLUS a ``budget_tail`` scalar, with
    K = max_segments * coarse_stride (or max_subsegments * sub_stride)
    samples per ray (the nearest occupied segments, in order). With
    ``is_train`` + ``rng`` the whole per-ray sample ladder is jittered by
    perturb * U[0,1) steps (identical to sample_points_in_box — shifting
    t_min shifts every midpoint/sample together, so the conservative
    occupancy margins hold unchanged).

    With ``max_subsegments_light`` set, rays are split into heavy/light
    populations by occupied-sub-segment count and the fine evaluation runs
    as two static-shape passes (see RenderConfig); light outputs are
    column-padded to the heavy width and rows are unsorted back, so callers
    see one [R, S] layout whose padded columns carry zero weight."""
    cs = rcfg.coarse_stride
    R = rays.shape[0]
    rays_o, rays_d, t_min = _ray_tmin(state, rays)
    if is_train and rcfg.perturb != 0 and rng is not None:
        jitter = rcfg.perturb * jax.random.uniform(rng, (R,))
        t_min = t_min + jitter * state.step_size
    use_sub = (rcfg.sub_stride is not None and rcfg.sub_stride < cs
               and fused.coarse_occ_tight is not None)
    if use_sub and not rcfg.use_l1:
        # L2-only selection: every sub-segment is a candidate (no segment
        # cascade, no L1 gather/top_k) — see RenderConfig.use_l1
        seg_idx, seg_valid = None, None
    else:
        seg_idx, seg_valid = _select_segments(mcfg, rcfg, state, rays_o,
                                              rays_d, t_min, fused)
    if use_sub:
        fine_steps, sample_valid, needed = _select_subsegments(
            mcfg, rcfg, state, rays_o, rays_d, t_min, fused, seg_idx, seg_valid)
        group = rcfg.sub_stride
    else:
        # fine samples inside the selected segments
        offs = jnp.arange(cs, dtype=jnp.float32)
        fine_steps = seg_idx[..., None].astype(jnp.float32) * cs + offs[None, None, :]
        sample_valid = (fine_steps < rcfg.n_samples) & seg_valid[..., None]
        needed = None
        group = cs

    hn = int(round(R * rcfg.heavy_fraction))
    k_sub = fine_steps.shape[1]
    k_l = rcfg.max_subsegments_light
    kA = rcfg.term_first
    if use_sub and 0 < kA < k_sub:
        # two-phase early termination (RenderConfig.term_first): pass A for
        # every ray, pass B only for the rays still carrying transmittance
        n_s = max(1, min(R, int(round(R * rcfg.term_fraction))))
        out_a = _fine_density(mcfg, rcfg, state, rays_o, rays_d, t_min,
                              fused, fine_steps[:, :kA],
                              sample_valid[:, :kA])
        T_res = out_a[7][:, 0]                # residual transmittance [R]
        # survivors = largest residuals AMONG rays that still have occupied
        # candidates: a ray that missed all geometry has T_res = 1 but an
        # empty tail — evaluating it is wasted and it would crowd real
        # surface rays out of the survivor slots (and a truncated empty ray
        # loses nothing, so it must not trip the guardrail either)
        has_tail = jnp.any(sample_valid[:, kA:], axis=(1, 2))      # [R]
        T_live = jnp.where(has_tail, T_res, -1.0)
        order = jnp.argsort(T_live)           # survivors = largest residuals
        inv = jnp.argsort(order)
        surv = order[R - n_s:]
        fsB = jnp.take(fine_steps[:, kA:], surv, axis=0)
        svB = jnp.take(sample_valid[:, kA:], surv, axis=0)
        roB = jnp.take(rays_o, surv, axis=0)
        rdB = jnp.take(rays_d, surv, axis=0)
        tmB = jnp.take(t_min, surv, axis=0)
        out_b = list(_fine_density(mcfg, rcfg, state, roB, rdB, tmB, fused,
                                   fsB, svB))
        Tsurv = jnp.take(T_res, surv)[:, None]
        # splice: transmittance is multiplicative across contiguous rank
        # blocks, so pass-B weights/background start at pass-A's residual
        out_b[6] = out_b[6] * Tsurv
        out_b[7] = out_b[7] * Tsurv

        def expand(b):
            # rows of b are rays order[R-n_s:]; zero rows for the rest,
            # then unsort back to input ray order
            pad = jnp.zeros((R - n_s,) + b.shape[1:], b.dtype)
            return jnp.take(jnp.concatenate([pad, b]), inv, axis=0)

        merged = []
        for i in range(8):
            if i == 7:
                continue
            merged.append(jnp.concatenate(
                [out_a[i], expand(out_b[i])], axis=1))
        # background: survivors spliced; a terminated ray's residual goes to
        # background exactly as if its tail were empty (truncation semantics)
        survived = jnp.zeros((R,), bool).at[surv].set(True)
        bg = jnp.where(survived[:, None], expand(out_b[7]), T_res[:, None])
        merged.insert(7, bg)
        # guardrail: a terminated ray's missing weight is bounded by its
        # residual transmittance IF it still had occupied candidates (an
        # empty tail loses nothing); survivors guard their deepest group
        tail = _tail_weight(out_b[6], group)
        if n_s < R:
            tail = jnp.maximum(
                tail, jnp.max(jnp.maximum(jnp.take(T_live, order[:R - n_s]),
                                          0.0)))
        return tuple(merged) + (tail,)
    if use_sub and 0 < k_l < k_sub and 0 < hn < R:
        order = jnp.argsort(needed)                   # light first, heavy last
        inv = jnp.argsort(order)
        fs = jnp.take(fine_steps, order, axis=0)
        sv = jnp.take(sample_valid, order, axis=0)
        ro = jnp.take(rays_o, order, axis=0)
        rd = jnp.take(rays_d, order, axis=0)
        tm = jnp.take(t_min, order, axis=0)
        nl = R - hn
        out_l = _fine_density(mcfg, rcfg, state, ro[:nl], rd[:nl], tm[:nl],
                              fused, fs[:nl, :k_l], sv[:nl, :k_l])
        out_h = _fine_density(mcfg, rcfg, state, ro[nl:], rd[nl:], tm[nl:],
                              fused, fs[nl:], sv[nl:])
        tail = jnp.maximum(_tail_weight(out_l[6], group),
                           _tail_weight(out_h[6], group))
        pad_cols = (k_sub - k_l) * group

        def merge(a, b):
            # pad the per-SAMPLE axis only (bg_weight is [R, 1] — leave it)
            if a.ndim >= 2 and a.shape[1] == k_l * group:
                spec = [(0, 0), (0, pad_cols)] + [(0, 0)] * (a.ndim - 2)
                a = jnp.pad(a, spec)
            return jnp.take(jnp.concatenate([a, b]), inv, axis=0)

        merged = tuple(merge(a, b) for a, b in zip(out_l, out_h))
        return merged + (tail,)

    out = _fine_density(mcfg, rcfg, state, rays_o, rays_d, t_min, fused,
                        fine_steps, sample_valid)
    return out + (_tail_weight(out[6], group),)


def _needed_budget(weight: jnp.ndarray, group: int, eps: float) -> jnp.ndarray:
    """Per-ray smallest prefix of (nearest-first) segment ranks carrying all
    weight above ``eps``: weight [R, K*group] -> [R] rank counts."""
    w_rank = weight.reshape(weight.shape[0], -1, group).sum(-1)   # [R, K]
    ranks = jnp.arange(1, w_rank.shape[1] + 1)
    return jnp.max(jnp.where(w_rank > eps, ranks, 0), axis=1)


def _needed_budget_bounded(weight: jnp.ndarray, group: int,
                           tail_eps: float) -> jnp.ndarray:
    """Per-ray smallest prefix K of (nearest-first) segment ranks whose
    truncation residual stays below ``tail_eps``: the total compositing
    weight in ranks > K is < tail_eps.

    Unlike _needed_budget ("deepest rank with per-segment weight > eps",
    which neither proves a residual bound nor exploits that many small
    contributions may be jointly negligible), this is the PROVEN per-ray
    bound the termination guardrail uses (see _two_level_density: dropping
    ranks > K removes exactly their summed weight, which also bounds the
    rgb/semantic map error since head outputs are in [0,1] after the
    sigmoid/softmax). Sizing budgets at the probe MAX then guarantees every
    probe ray's truncation error < tail_eps; drift beyond the probe
    surfaces in budget_tail at render time."""
    w_rank = weight.reshape(weight.shape[0], -1, group).sum(-1)   # [R, K]
    cum = jnp.cumsum(w_rank, axis=1)
    resid_after = cum[:, -1:] - cum                               # [R, K]
    return jnp.sum(resid_after >= tail_eps, axis=1) + 1


def calibrate_budgets(mcfg, rcfg: RenderConfig, state: RenderState,
                      probe_rays, fused: FusedGrids,
                      quantile: float = 0.999, margin: int = 2,
                      round_to: int = 4,
                      weight_eps: float = 1e-3,
                      termination: bool = False,
                      tail_eps: float = 0.0,
                      head_term: bool = False,
                      head_tail_eps: float = 2e-3) -> RenderConfig:
    """Transmittance-aware scene-adaptive segment budgets.

    Occupied-segment COUNTS overestimate the needed budget badly (on a shell
    field the p99 ray crosses ~70 occupied segments, but occlusion makes all
    but the first ~15 carry no compositing weight). Instead, render the
    probe rays' DENSITY at full budget (no heads — cheap) and take, per ray,
    the deepest nearest-first segment rank whose compositing weight exceeds
    ``weight_eps``; size ``max_segments`` at the ``quantile`` of that (plus
    ``margin``, rounded). Repeat at the chosen segment budget for the
    sub-segment level. Truncation error on a calibrated scene is then
    bounded by the skipped weight (< eps per segment) outside the quantile
    tail. May shrink OR grow the configured defaults; two probe compiles
    per scene. TPU-perf design — the reference samples densely and needs no
    budgets.

    With ``tail_eps`` > 0 the per-ray need uses the PROVEN residual bound
    instead (_needed_budget_bounded, sized at the probe max): per-ray
    truncation error < tail_eps on every probe ray — tighter budgets than
    the per-segment-eps rank (many jointly-negligible tail segments no
    longer inflate the need), with the guarantee the hand-tuned fixed
    budgets lack (VERDICT r3 #6)."""
    from dataclasses import replace
    validate_fine_span(rcfg, state)  # fail before the probe compiles
    if rcfg.coarse_stride is None or fused.coarse_occ is None:
        return rcfg
    probe = jnp.asarray(probe_rays, jnp.float32)
    cs = rcfg.coarse_stride
    S_c = -(-rcfg.n_samples // cs)

    def need_of(w, group):
        if tail_eps > 0:
            return _needed_budget_bounded(w, group, tail_eps)
        return _needed_budget(w, group, weight_eps)

    def pick_q(needed, cap, q):
        need = int(np.quantile(np.asarray(needed), q)) + margin
        need = -(-need // round_to) * round_to
        return max(8, min(cap, need))

    def pick(needed, cap):
        # the bounded-residual need is a per-ray PROOF — honor its max so
        # the guarantee covers every probe ray, not a quantile of them
        return pick_q(needed, cap, 1.0 if tail_eps > 0 else quantile)

    if not rcfg.use_l1:
        # L2-only mode: no segment budget to calibrate (every segment is a
        # candidate); keep max_segments at the full count so cand spans S
        out = replace(rcfg, max_segments=S_c)
    else:
        full = replace(rcfg, max_segments=S_c, sub_stride=None,
                       use_l1=True)
        w = jax.jit(lambda r: _two_level_density(
            mcfg, full, state, r, fused)[6])(probe)
        out = replace(rcfg, max_segments=pick(need_of(w, cs), S_c))
    if rcfg.sub_stride is not None and fused.coarse_occ_tight is not None:
        sub = rcfg.sub_stride
        cand = out.max_segments * (cs // sub)
        full2 = replace(out, max_subsegments=cand, max_subsegments_light=0,
                        term_first=0)
        w2 = jax.jit(lambda r: _two_level_density(
            mcfg, full2, state, r, fused)[6])(probe)
        needed2 = need_of(w2, sub)
        out = replace(out, max_subsegments=pick(needed2, cand))
        if termination:
            # two-phase early termination: pick the pass-A budget kA that
            # minimizes expected sub evaluations kA + P(weight-needed > kA)
            # * margin * (k_sub - kA); the survivor fraction gets a 1.5x
            # margin (plus a floor) for drift beyond the probe, and the
            # term path's budget_tail guards residual-transmittance leaks
            need = np.asarray(needed2)
            k_sub = out.max_subsegments
            best = None
            for q in (0.5, 0.625, 0.75, 0.875):
                kA = max(4, min(k_sub - round_to,
                                -(-int(np.quantile(need, q)) // round_to)
                                * round_to))
                frac = min(1.0, float((need > kA).mean()) * 1.5 + 1 / 64)
                cost = kA + frac * (k_sub - kA)
                if best is None or cost < best[0]:
                    best = (cost, kA, frac)
            if best is not None and best[1] < k_sub:
                out = replace(out, term_first=best[1],
                              term_fraction=best[2],
                              max_subsegments_light=0)
        # heavy/light bucketing: only rays ABOVE the light budget must land
        # in the heavy bucket (top heavy_fraction by occupied count), so the
        # light quantile sits at 1 - heavy_fraction/2 — half the heavy
        # capacity is margin for distribution drift beyond the probe
        elif out.heavy_fraction > 0:
            light = pick_q(needed2, cand, 1.0 - out.heavy_fraction / 2)
            if light < out.max_subsegments:
                out = replace(out, max_subsegments_light=light)
        if head_term and out.head_topk is not None:
            # two-phase head evaluation (RenderConfig.head_term_first): pick
            # the pass-A budget kA minimizing expected head samples
            # kA + P(dropped mass > head_tail_eps) * margin * (head_topk -
            # kA). The contract is MASS-based: a non-survivor ray's map
            # error is bounded per channel by the compositing weight its
            # skipped samples carry, so the survivor fraction covers the
            # probe rays whose top-k tail mass exceeds head_tail_eps, with
            # the same 1.5x + 1/64 drift margin as termination; drift
            # beyond the probe surfaces in head_tail at render time.
            k = min(out.head_topk, w2.shape[1])
            if _head_select_mode(out) == "rank":
                # mirror the render-time selection: the kA-prefix/tail split
                # happens over the k NEAREST above-threshold samples, so the
                # calibration must rank tail mass in time order, not weight
                # order (a heavy far sample lands in the rank-select tail)
                wp = np.asarray(w2)
                m = wp > out.raymarch_weight_thres
                rank = np.cumsum(m, axis=1) - 1
                sel = m & (rank < k)
                w_kp = np.zeros((wp.shape[0], k), wp.dtype)
                rr, cc = np.nonzero(sel)
                w_kp[rr, rank[rr, cc]] = wp[rr, cc]
            else:
                w_kp = np.asarray(jax.lax.top_k(w2, k)[0])  # [R,k] desc
                # below-threshold samples are zeroed by the head composite,
                # so only above-threshold tail mass counts (matches the
                # render-time drop_key masking in _heads_two_phase)
                w_kp = np.where(w_kp > out.raymarch_weight_thres, w_kp, 0.0)
            tail_mass = np.cumsum(w_kp[:, ::-1], axis=1)[:, ::-1]
            best_h = None
            for kA in (4, 6, 8, 12, 16):
                if kA >= k:
                    continue
                over = tail_mass[:, kA] > head_tail_eps
                frac = min(1.0, float(over.mean()) * 1.5 + 1 / 64)
                cost = kA + frac * (k - kA)
                if best_h is None or cost < best_h[0]:
                    best_h = (cost, kA, frac)
            # fire only on a REAL expected win: a marginal split still pays
            # the two-pass gather/MLP launch overhead (measured −0.6% when
            # frac ≈ 1 on the analytic bench field), so require ≥15%
            # expected head-sample saving before adopting
            if best_h is not None and best_h[0] < 0.85 * k:
                out = replace(out, head_term_first=best_h[1],
                              head_term_fraction=best_h[2])
    # head_topk is deliberately NOT calibrated from above-threshold sample
    # counts: grazing rays clear the 1e-4 weight threshold on dozens of
    # near-weightless samples, inflating k well past what map fidelity needs
    # (measured: count-picked k drops throughput 365k -> 286k with no
    # measurable fidelity gain over the direct-fidelity-tuned default).
    # head_dedup_cells is deliberately NOT auto-enabled: on the bench field
    # the calibrated live-RUN cap lands at 22 vs head_topk=24 (dead-gap
    # splitting inflates runs ~2x past the 9.6-mean sorted-unique cell
    # count), and the one-hot row redistribution alone measures 3.8 ms —
    # the full dedup path ran 8.7 ms vs 4.8 ms for per-sample gathers
    # (tools/microbench_dedup.py). Kept as an opt-in for fields whose
    # surfaces are axis-aligned enough that runs stay far below k.
    return out


_BRANCH_DIMS = {"appearance": "dim_appearance", "semantic": "dim_semantics",
                "instance": "dim_instances"}


def _branch_feats(params, mcfg, fused: Optional[FusedGrids], name: str, flat):
    """Precomputed dense-grid features for a branch if available, else None
    (the head falls back to direct VM sampling or xyz input)."""
    if fused is not None and (name in fused.features
                              or name in fused.feature_cells
                              or name in fused.compact_feature_cells):
        dim = 96 if name == "feature" else getattr(mcfg, _BRANCH_DIMS[name])
        return sample_feature_fused(fused, name, flat, out_dim=dim)
    return None


_SEMINS_KEY = "semantic+instance"


def _semins_feats(params, mcfg, fused, flat):
    """Semantic + instance grid features with ONE row gather when the fused
    multibranch corner table is present (build_fused_grids ``multibranch``:
    the two branches always evaluate at the same top-k2 samples, so their
    projected grids concatenate into one 512-lane corner row with zero
    wasted bandwidth — PERFORMANCE.md round-4 gather microbench, 16% fewer
    head-gather ms than separate 256-lane tables). Falls back to per-branch
    fetch (table / dense grid / direct VM) otherwise."""
    if fused is not None and (_SEMINS_KEY in fused.compact_feature_cells
                              or _SEMINS_KEY in fused.feature_cells):
        ds = mcfg.dim_semantics
        both = sample_feature_fused(fused, _SEMINS_KEY, flat,
                                    out_dim=ds + mcfg.dim_instances)
        return both[:, :ds], both[:, ds:]
    return (_branch_feats(params, mcfg, fused, "semantic", flat),
            _branch_feats(params, mcfg, fused, "instance", flat))


def _semins_feats_dedup(params, mcfg, fused, flat, dedup, k_lim):
    """_semins_feats through the unique-cell dedup gather when active."""
    if dedup is not None and fused is not None and (
            _SEMINS_KEY in fused.compact_feature_cells
            or _SEMINS_KEY in fused.feature_cells):
        uid, slot_k, xyz_k = dedup
        ds = mcfg.dim_semantics
        both = sample_feature_dedup(fused, _SEMINS_KEY, uid,
                                    slot_k[:, :k_lim], xyz_k[:, :k_lim],
                                    ds + mcfg.dim_instances)
        return both[:, :ds], both[:, ds:]
    if dedup is None:
        return _semins_feats(params, mcfg, fused, flat)
    return (_branch_feats_dedup(params, mcfg, fused, "semantic", flat,
                                dedup, k_lim),
            _branch_feats_dedup(params, mcfg, fused, "instance", flat,
                                dedup, k_lim))


def _branch_feats_dedup(params, mcfg, fused, name, flat, dedup, k_lim):
    """_branch_feats, but through the unique-cell dedup gather when active
    and the branch has corner tables (RenderConfig.head_dedup_cells)."""
    if dedup is not None and fused is not None and (
            name in fused.compact_feature_cells or name in fused.feature_cells):
        uid, slot_k, xyz_k = dedup
        dim = 96 if name == "feature" else getattr(mcfg, _BRANCH_DIMS[name])
        return sample_feature_dedup(fused, name, uid, slot_k[:, :k_lim],
                                    xyz_k[:, :k_lim], dim)
    return _branch_feats(params, mcfg, fused, name, flat)


def _semantic_map_postprocess(rcfg, semantic_map):
    if rcfg.semantic_weight_mode == "softmax":
        semantic_map = semantic_map / (jnp.sum(semantic_map, -1, keepdims=True) + 1e-8)
        semantic_map = jnp.log(semantic_map + 1e-8)
    return semantic_map


def _tail_ratio(m_full, m_kept):
    """Per-ray completion ratio full/kept, 1.0 on empty rays ([R] -> [R]).

    m_full >= m_kept by construction (kept masses sum a masked subset of the
    same weights), so the ratio is >= 1; it exceeds 1 only by the
    above-threshold mass the head compaction dropped."""
    return jnp.where(m_kept > 1e-12, m_full / jnp.maximum(m_kept, 1e-12), 1.0)


def _head_select_mode(rcfg) -> str:
    """Resolved head selection mode (see RenderConfig.head_select): "rank"
    falls back to "sort" in argmax weight mode, which needs the globally
    heaviest sample in the kept set."""
    mode = getattr(rcfg, "head_select", "sort")
    if mode == "rank" and rcfg.semantic_weight_mode == "argmax":
        return "sort"
    return mode


def _topk_iter(weight: jnp.ndarray, k: int):
    """Exact top-k over axis 1 without the [R, S] sort: k argmax+mask passes
    under lax.scan — O(S*k) VPU reduces. Same values, descending order, and
    tie-breaking (lowest index first) as lax.top_k."""
    S = weight.shape[1]
    neg = jnp.finfo(weight.dtype).min
    cols = jnp.arange(S, dtype=jnp.int32)

    def body(w, _):
        i = jnp.argmax(w, axis=1).astype(jnp.int32)               # [R]
        v = jnp.take_along_axis(w, i[:, None], axis=1)[:, 0]
        w = jnp.where(cols[None, :] == i[:, None], neg, w)
        return w, (v, i)

    _, (vals, idxs) = jax.lax.scan(body, weight, None, length=k)
    return vals.T, idxs.T                                         # [R, k]


def _head_select(rcfg, weight, k):
    """Pick the k head samples per ray: (w_k [R,k], idx [R,k], head_tail).

    "sort"/"iter" modes: the k heaviest (sorted desc); head_tail = max k-th
    kept weight (should sit below raymarch_weight_thres when compaction is
    exact). "rank" mode: the k NEAREST above-threshold samples, no sort;
    invalid slots carry weight 0 (below threshold, so every downstream
    app_mask/composite treats them as dead); head_tail = max per-ray dropped
    above-threshold MASS (the completion residual bound)."""
    mode = _head_select_mode(rcfg)
    if mode == "rank":
        live = weight > rcfg.raymarch_weight_thres
        idx, valid = _first_k_set(live, k)
        w_k = jnp.where(valid, jnp.take_along_axis(weight, idx, axis=1), 0.0)
        m_above = jnp.sum(weight * live, -1)
        head_tail = jnp.max(m_above - jnp.sum(w_k, -1))
        return w_k, idx, head_tail
    if mode == "iter":
        w_k, idx = _topk_iter(weight, k)
    else:
        w_k, idx = jax.lax.top_k(weight, k)
    return w_k, idx, jnp.max(w_k[:, -1])


def _head_weights(rcfg, weight):
    """The per-sample compositing weights used for semantic/instance heads."""
    w = weight[..., None]
    if rcfg.semantic_weight_mode == "argmax":
        hot = jax.nn.one_hot(jnp.argmax(weight, axis=1), weight.shape[1], dtype=weight.dtype)
        w = hot[..., None]
    if rcfg.stop_semantic_grad:
        w = jax.lax.stop_gradient(w)
    return w


def _heads_two_phase(params, mcfg, rcfg: RenderConfig, fused, rays, xyz_k,
                     w_k, app_mask, k2: int, compute_dtype, head_tail,
                     m_full=None):
    """Two-phase head evaluation (RenderConfig.head_term_first).

    Pass A evaluates every ray's ``kA = head_term_first`` highest-weight
    samples; pass B re-evaluates only the ``head_term_fraction`` rays whose
    DROPPED WEIGHT MASS (sum of w_k[:, kA:] — columns are weight-sorted;
    exactly the compositing weight pass B would add back) is greatest, on
    the remaining head_topk - kA samples, and scatter-adds their
    contributions per ray (head maps are weighted SUMS over samples, so
    the splice is exact addition; the smaller sem/ins budget k2 splits the
    same way). Error contract: a non-survivor ray's map error is bounded
    per channel by its dropped mass times the head output range (rgb and
    softmax outputs live in [0,1] — same bounding style as the reference's
    raymarch_weight_thres mask, panopli_tensoRF_renderer.py:103);
    ``head_tail`` reports the max dropped mass over non-survivors, which
    calibrate_budgets(head_term=True) keeps below head_tail_eps on probe
    rays."""
    R, k = w_k.shape
    kA = rcfg.head_term_first
    k2A = min(kA, k2)
    n_s = max(1, min(R, int(round(R * rcfg.head_term_fraction))))
    # mask the tail with app_mask: below-threshold weights are zeroed by the
    # head blocks anyway, so survivor selection and the reported head_tail
    # count only mass the composite would actually add back (advisor r4 —
    # unmasked dust wasted survivor slots and overstated the dropped mass)
    drop_key = jnp.sum(w_k[:, kA:] * app_mask[:, kA:].astype(w_k.dtype),
                       axis=1)
    order = jnp.argsort(drop_key)
    surv = order[R - n_s:]
    if n_s < R:
        head_tail = jnp.maximum(head_tail,
                                jnp.max(drop_key[order[:R - n_s]]))

    w_h = _head_weights(rcfg, w_k)                      # [R, k, 1]
    viewdirs = rays[:, 3:6]

    def app_block(xyz_s, view_r, mask_s):
        Rn, Ks = xyz_s.shape[:2]
        flat_s = xyz_s.reshape(-1, 3)
        vd = jnp.broadcast_to(view_r[:, None, :], (Rn, Ks, 3)).reshape(-1, 3)
        mf = mask_s.reshape(-1, 1)
        rgb_s = tf.render_appearance(
            params, mcfg, vd, flat_s, compute_dtype,
            feats=_branch_feats(params, mcfg, fused, "appearance", flat_s))
        rgb_s = jnp.where(mf, rgb_s, 0.0).reshape(Rn, Ks, 3)
        dist_s = None
        if mcfg.use_distilled:
            d = tf.render_distilled(
                params, mcfg, flat_s,
                feats=_branch_feats(params, mcfg, fused, "feature", flat_s))
            dist_s = jnp.where(mf, d, 0.0).reshape(Rn, Ks, -1)
        return rgb_s, dist_s

    def semins_block(xyz_s, dist_s, mask_s):
        Rn, Ks = xyz_s.shape[:2]
        flat_s = xyz_s.reshape(-1, 3)
        mf = mask_s.reshape(-1, 1)
        dfh = None
        if dist_s is not None:
            dfh = dist_s.reshape(Rn * Ks, -1)
            if rcfg.feature_stop_grad:
                dfh = jax.lax.stop_gradient(dfh)
        f_sem, f_ins = _semins_feats(params, mcfg, fused, flat_s)
        sem = tf.render_semantics(params, mcfg, flat_s, dfh, compute_dtype,
                                  feats=f_sem)
        ins = tf.render_instances(params, mcfg, flat_s, dfh, compute_dtype,
                                  feats=f_ins)
        sem = jnp.where(mf, sem, 0.0).reshape(Rn, Ks, -1)
        ins = jnp.where(mf, ins, 0.0).reshape(Rn, Ks, -1)
        return sem, ins

    # pass A: every ray, its kA highest-weight samples
    rgbA, distA = app_block(xyz_k[:, :kA], viewdirs, app_mask[:, :kA])
    semA, insA = semins_block(xyz_k[:, :k2A],
                              None if distA is None else distA[:, :k2A],
                              app_mask[:, :k2A])
    rgb_map = jnp.sum(w_k[:, :kA, None] * rgbA, axis=-2)
    semantic_map = jnp.sum(w_h[:, :k2A] * semA, axis=-2)
    instance_map = jnp.sum(w_h[:, :k2A] * insA, axis=-2)
    distilled_map = None
    if distA is not None:
        distilled_map = jnp.sum(w_h[:, :kA] * distA, axis=-2)

    # pass B: survivors only, on the remaining samples; additive splice
    xyzB = jnp.take(xyz_k[:, kA:], surv, axis=0)
    maskB = jnp.take(app_mask[:, kA:], surv, axis=0)
    rgbB, distB = app_block(xyzB, jnp.take(viewdirs, surv, axis=0), maskB)
    w_kB = jnp.take(w_k[:, kA:], surv, axis=0)
    w_hB = jnp.take(w_h[:, kA:], surv, axis=0)
    rgb_map = rgb_map.at[surv].add(jnp.sum(w_kB[..., None] * rgbB, axis=-2))
    if distB is not None:
        distilled_map = distilled_map.at[surv].add(
            jnp.sum(w_hB * distB, axis=-2))
    if k2A < k2:
        nB2 = k2 - k2A
        semB, insB = semins_block(
            xyzB[:, :nB2], None if distB is None else distB[:, :nB2],
            maskB[:, :nB2])
        semantic_map = semantic_map.at[surv].add(
            jnp.sum(w_hB[:, :nB2] * semB, axis=-2))
        instance_map = instance_map.at[surv].add(
            jnp.sum(w_hB[:, :nB2] * insB, axis=-2))

    if m_full is not None:
        # tail completion (RenderConfig.head_tail_complete): kept masses
        # accumulate in exactly the pass-A + survivor-splice pattern the map
        # sums used, so ratio == 1 whenever nothing above threshold was
        # dropped (distilled_map is unit-normalized below — scale cancels;
        # semantic_map's argmax/softmax postprocess is scale-invariant)
        mask_f = app_mask.astype(w_k.dtype)
        maskB_f = maskB.astype(w_k.dtype)
        m_rgb = jnp.sum(w_k[:, :kA] * mask_f[:, :kA], -1)
        m_rgb = m_rgb.at[surv].add(jnp.sum(w_kB * maskB_f, -1))
        rgb_map = rgb_map * _tail_ratio(m_full, m_rgb)[:, None]
        if rcfg.semantic_weight_mode != "argmax":
            m_ins = jnp.sum(w_k[:, :k2A] * mask_f[:, :k2A], -1)
            if k2A < k2:
                nB2 = k2 - k2A
                m_ins = m_ins.at[surv].add(
                    jnp.sum(w_kB[:, :nB2] * maskB_f[:, :nB2], -1))
            instance_map = instance_map * _tail_ratio(m_full, m_ins)[:, None]
    if distilled_map is not None:
        distilled_map = distilled_map / (
            jnp.linalg.norm(distilled_map, axis=-1, keepdims=True) + 1e-12)
    else:
        distilled_map = jnp.zeros((1, 1), jnp.float32)
    return rgb_map, semantic_map, instance_map, distilled_map, head_tail


def render_rays(params, mcfg: tf.TensoRFConfig, rcfg: RenderConfig,
                state: RenderState, rays: jnp.ndarray,
                rng: Optional[jax.Array] = None, is_train: bool = False,
                fused: Optional[FusedGrids] = None):
    """Full render pass: rgb / semantics / instances / depth / distilled / dist-reg.

    Reference: panopli_tensoRF_renderer.py:80-176. Returns a dict of maps.
    With rcfg.head_topk set, heads run only on the k highest-weight samples
    per ray (gather -> evaluate -> composite; no dense scatter-back). With
    ``fused`` grids the density is one row-gather per sample and grid-branch
    head features come from dense projected grids (see ops/fused_grid.py).
    """
    rng_pts, rng_bg = (None, None)
    if rng is not None:
        rng_pts, rng_bg = jax.random.split(rng)

    use_two_level = (rcfg.coarse_stride is not None and fused is not None
                     and fused.coarse_occ is not None and not is_train)
    if use_two_level:
        # budget_tail: budget-truncation guardrail — with ESS the DEEPEST
        # kept group should carry ~no compositing weight on a calibrated
        # scene (render_frames warns when it exceeds the calibration eps)
        (xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_w,
         budget_tail) = _two_level_density(mcfg, rcfg, state, rays, fused)
    else:
        xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_w = _density_weights(
            params, mcfg, rcfg, state, rays, rng_pts, is_train, stop_grad=False,
            fused=fused)
        budget_tail = jnp.zeros(())
    R, S = weight.shape

    dist_reg = distortion_loss(weight, mids, dists)
    compute_dtype = jnp.bfloat16 if rcfg.head_dtype == "bfloat16" else jnp.float32

    head_tail = jnp.zeros(())
    dedup_tail = jnp.zeros(())
    dedup = None  # (uid, slot_k, xyz_k) when unique-cell dedup is active
    if rcfg.head_topk is not None and rcfg.head_topk < S:
        k = rcfg.head_topk
        # guardrail semantics per mode — see _head_select: k-th kept weight
        # (top_k) or dropped above-threshold mass (rank-select); both surface
        # under-budgeted compaction like budget_tail
        w_k, idx, head_tail = _head_select(rcfg, weight, k)       # [R, k]
        xyz_k = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
        head_weight = w_k
        flat = xyz_k.reshape(-1, 3)
        Sh = k
        # smaller budget for the flop-heavy sem/ins MLPs: a k2-prefix of the
        # k columns applies the SAME selection rule at the smaller budget
        # (weight-sorted -> the top-k2 samples; rank-select -> the nearest
        # k2 above threshold)
        k2 = Sh if rcfg.head_topk_semins is None else min(rcfg.head_topk_semins, Sh)
        flat2 = xyz_k[:, :k2].reshape(-1, 3)
        if (rcfg.head_dedup_cells is not None and fused is not None
                and rcfg.head_dedup_cells < k and not is_train):
            live = weight > rcfg.raymarch_weight_thres
            slot, uid, dedup_tail = head_dedup_slots(
                fused, xyz_n, live, rcfg.head_dedup_cells)
            slot_k = jnp.take_along_axis(slot, idx, axis=1)
            dedup = (uid, slot_k, xyz_k)
    else:
        head_weight = weight
        flat = xyz_n.reshape(-1, 3)
        Sh = S
        k2 = Sh
        flat2 = flat

    app_mask = head_weight > rcfg.raymarch_weight_thres         # [R, Sh]

    use_hterm = (0 < rcfg.head_term_first < Sh and not is_train
                 and dedup is None
                 and rcfg.head_topk is not None and rcfg.head_topk < S
                 and not (fused is not None
                          and "baked" in fused.compact_feature_cells))
    if use_hterm:
        m_full = (jnp.sum(weight * (weight > rcfg.raymarch_weight_thres), -1)
                  if rcfg.head_tail_complete else None)
        (rgb_map, semantic_map, instance_map, distilled_map,
         head_tail) = _heads_two_phase(params, mcfg, rcfg, fused, rays,
                                       xyz_k, head_weight, app_mask, k2,
                                       compute_dtype, head_tail,
                                       m_full=m_full)
        opacity = jnp.sum(weight, -1)
        semantic_map = _semantic_map_postprocess(rcfg, semantic_map)
        return _finish_maps(rcfg, rng_bg, is_train, weight, z_vals, opacity,
                            rgb_map, semantic_map, instance_map,
                            distilled_map, dist_reg, budget_tail, head_tail,
                            dedup_tail)

    mask_flat = app_mask.reshape(-1, 1)
    mask_flat2 = app_mask[:, :k2].reshape(-1, 1)

    viewdirs = jnp.broadcast_to(rays[:, None, 3:6], (R, Sh, 3)).reshape(-1, 3)
    rgb = tf.render_appearance(params, mcfg, viewdirs, flat, compute_dtype,
                               feats=_branch_feats_dedup(params, mcfg, fused,
                                                         "appearance", flat,
                                                         dedup, Sh))
    rgb = jnp.where(mask_flat, rgb, 0.0).reshape(R, Sh, 3)

    distilled = None
    distilled_for_heads = None
    if mcfg.use_distilled:
        distilled = tf.render_distilled(
            params, mcfg, flat,
            feats=_branch_feats_dedup(params, mcfg, fused, "feature", flat,
                                      dedup, Sh))
        distilled = jnp.where(mask_flat, distilled, 0.0)
        distilled_for_heads = (jax.lax.stop_gradient(distilled)
                               if rcfg.feature_stop_grad else distilled)
    dfh2 = distilled_for_heads
    if dfh2 is not None and k2 != Sh:
        dfh2 = dfh2.reshape(R, Sh, -1)[:, :k2].reshape(R * k2, -1)

    use_baked = (fused is not None and not is_train
                 and "baked" in fused.compact_feature_cells)
    if use_baked:
        # baked heads (renderer/bake.py): one 256-lane row gather replaces
        # the sem + fast/slow-ins MLP stacks; payload = [logits, instances]
        C = rcfg.num_semantic_classes
        D = rcfg.dim_feature_instance
        bk = sample_feature_fused(fused, "baked", flat2, out_dim=C + D)
        semantics = bk[:, :C]
        if mcfg.semantic_output_softmax:
            semantics = jax.nn.softmax(semantics, axis=-1)
        instances = bk[:, C:]
    else:
        f_sem, f_ins = _semins_feats_dedup(params, mcfg, fused, flat2,
                                           dedup, k2)
        semantics = tf.render_semantics(params, mcfg, flat2, dfh2,
                                        compute_dtype, feats=f_sem)
        instances = tf.render_instances(params, mcfg, flat2, dfh2,
                                        compute_dtype, feats=f_ins)
    semantics = jnp.where(mask_flat2, semantics, 0.0).reshape(R, k2, -1)
    instances = jnp.where(mask_flat2, instances, 0.0).reshape(R, k2, -1)

    opacity = jnp.sum(weight, -1)
    rgb_map = composite(head_weight, rgb)

    w = _head_weights(rcfg, head_weight)
    semantic_map = jnp.sum(w[:, :k2] * semantics, axis=-2)
    instance_map = jnp.sum(w[:, :k2] * instances, axis=-2)
    if (rcfg.head_tail_complete and not is_train
            and rcfg.head_topk is not None and rcfg.head_topk < S):
        # tail completion (see RenderConfig.head_tail_complete): renormalize
        # by the above-threshold mass the top-k cut dropped; exact no-op when
        # nothing above threshold was dropped
        m_full = jnp.sum(weight * (weight > rcfg.raymarch_weight_thres), -1)
        mask_f = app_mask.astype(weight.dtype)
        rgb_map = rgb_map * _tail_ratio(
            m_full, jnp.sum(head_weight * mask_f, -1))[:, None]
        if rcfg.semantic_weight_mode != "argmax":
            instance_map = instance_map * _tail_ratio(
                m_full, jnp.sum(head_weight[:, :k2] * mask_f[:, :k2], -1)
            )[:, None]
    distilled_map = jnp.zeros((1, 1), jnp.float32)
    if mcfg.use_distilled:
        distilled_map = jnp.sum(w * distilled.reshape(R, Sh, -1), axis=-2)
        distilled_map = distilled_map / (
            jnp.linalg.norm(distilled_map, axis=-1, keepdims=True) + 1e-12)

    semantic_map = _semantic_map_postprocess(rcfg, semantic_map)

    return _finish_maps(rcfg, rng_bg, is_train, weight, z_vals, opacity,
                        rgb_map, semantic_map, instance_map, distilled_map,
                        dist_reg, budget_tail, head_tail, dedup_tail)


def _finish_maps(rcfg, rng_bg, is_train, weight, z_vals, opacity, rgb_map,
                 semantic_map, instance_map, distilled_map, dist_reg,
                 budget_tail, head_tail, dedup_tail):
    """Shared map finishing: white-background compositing (+train-time coin,
    reference trainer :101), depth, output dict."""
    white = rcfg.white_bg
    if is_train and rng_bg is not None:
        coin = jax.random.uniform(rng_bg, ()) < 0.5
        rgb_map = jnp.where(white | coin, rgb_map + (1.0 - opacity[..., None]), rgb_map)
    elif white:
        rgb_map = rgb_map + (1.0 - opacity[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

    # differentiable (the reference computes it under no_grad because it never
    # supervises depth; the optional lambda_depth loss here does)
    depth_map = jnp.sum(weight * z_vals, -1)

    return {
        "rgb": rgb_map, "semantics": semantic_map, "instances": instance_map,
        "depth": depth_map, "distilled": distilled_map, "dist_reg": dist_reg,
        "opacity": opacity, "budget_tail": budget_tail, "head_tail": head_tail,
        "dedup_tail": dedup_tail,
    }


def _aux_topk(rcfg: RenderConfig, weight, xyz_n, z_vals, live=None):
    """Weight-sorted top-k compaction for the stop-grad aux passes.

    Exact whenever <= k samples per ray clear raymarch_weight_thres: the
    reference only evaluates heads on above-threshold samples
    (panopli_tensoRF_renderer.py:103, boolean indexing), so dropping
    below-threshold samples from the composite changes nothing. Enabled
    either explicitly (Config.head_topk_train) or by the Trainer's per-stage
    auto-calibration (Config.head_topk_train_auto), which sizes k from a
    probe of the above-threshold counts with margin. Returns the guardrail
    ``tail`` = fraction of rays whose above-threshold count exceeds k (0 ⇒
    this batch was compacted exactly).
    """
    R, S = weight.shape
    if rcfg.head_topk is None or rcfg.head_topk >= S:
        return weight, xyz_n, z_vals, jnp.zeros((), jnp.float32)
    k = rcfg.head_topk
    count = jnp.sum(weight > rcfg.raymarch_weight_thres, axis=-1)
    over = count > k
    if live is not None:
        # zero-padded stream rays (sampler/chunk padding, masked in the
        # losses) must not trip the guardrail
        over = over & live
    tail = jnp.mean(over.astype(jnp.float32))
    mode = _head_select_mode(rcfg)
    if mode == "rank":
        # nearest-k above-threshold, no sort (RenderConfig.head_select):
        # identical kept set whenever count <= k — exactly the regime the
        # auto-calibration + ``tail`` guardrail maintain — since the aux
        # composites mask below-threshold samples to zero anyway
        idx, valid = _first_k_set(weight > rcfg.raymarch_weight_thres, k)
        w_k = jnp.where(valid, jnp.take_along_axis(weight, idx, axis=1), 0.0)
    elif mode == "iter":
        w_k, idx = _topk_iter(weight, k)
    else:
        w_k, idx = jax.lax.top_k(weight, k)
    xyz_k = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
    z_k = jnp.take_along_axis(z_vals, idx, axis=1)
    return w_k, xyz_k, z_k, tail


def aux_density_weights(params, mcfg: tf.TensoRFConfig, rcfg: RenderConfig,
                        state: RenderState, rays, rng, is_train: bool,
                        fused: Optional[FusedGrids]):
    """Stop-grad density/weights for the aux passes (train-time ESS when the
    fused grids carry occupancy). Returns (xyz_n, z_vals, weight,
    budget_tail) — budget_tail is the live-ray-masked ESS truncation
    guardrail (max compositing weight in the deepest kept segment; 0 with
    ESS off), the train-side analog of render_rays' budget_tail."""
    if (fused is not None and fused.coarse_occ is not None
            and rcfg.coarse_stride is not None):
        # train-time empty-space skipping (Config.ess_train_stride): density
        # is stop-gradient here, so the inference occupancy contract applies
        xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_w = \
            _two_level_density(mcfg, rcfg, state, rays, fused, rng,
                               is_train)[:8]
        # recompute the tail with zero-padded stream rays masked out (they
        # degenerate to one in-box point and would false-trip the guardrail)
        live = jnp.any(rays[:, 3:6] != 0, axis=-1)
        group = rcfg.sub_stride or rcfg.coarse_stride
        budget_tail = jnp.max(jnp.where(
            live, jnp.sum(weight[:, -group:], axis=-1), 0.0))
    else:
        xyz_n, z_vals, in_box, dists, mids, alpha, weight, bg_w = _density_weights(
            params, mcfg, rcfg, state, rays, rng, is_train, stop_grad=True,
            fused=fused)
        budget_tail = jnp.zeros(())
    return xyz_n, z_vals, jax.lax.stop_gradient(weight), budget_tail


def render_instance_features(params, mcfg: tf.TensoRFConfig, rcfg: RenderConfig,
                             state: RenderState, rays: jnp.ndarray,
                             rng: Optional[jax.Array] = None, is_train: bool = True,
                             fused: Optional[FusedGrids] = None,
                             return_tail: bool = False):
    """Instance-embedding pass with no-grad density/weights.

    Returns (instance_map [R, D], surface points_xyz [R, 3]); with
    ``return_tail`` also the _aux_topk and ESS-budget guardrail scalars.
    Reference: panopli_tensoRF_renderer.py:178-217.
    """
    xyz_n, z_vals, weight, budget_tail = aux_density_weights(
        params, mcfg, rcfg, state, rays, rng, is_train, fused)
    distance_map = jnp.sum(weight * z_vals, -1)
    live = jnp.any(rays[:, 3:6] != 0, axis=-1)
    weight, xyz_n, z_vals, tail = _aux_topk(rcfg, weight, xyz_n, z_vals, live)
    R, S = weight.shape
    flat = xyz_n.reshape(-1, 3)
    app_mask = (weight > rcfg.raymarch_weight_thres).reshape(-1, 1)

    # head MLPs honor head_dtype (Config.precision) in the aux passes too —
    # this phase is MLP-bound and the v5e MXU is bf16-native; the composite's
    # weight multiply promotes back to f32, so the loss reduction over
    # samples stays fp32 (same mixed-precision contract as the main phase,
    # render_rays:1059)
    compute_dtype = (jnp.bfloat16 if rcfg.head_dtype == "bfloat16"
                     else jnp.float32)

    distilled_for_heads = None
    if mcfg.use_distilled:
        distilled = tf.render_distilled(params, mcfg, flat)
        distilled = jnp.where(app_mask, distilled, 0.0)
        distilled_for_heads = (jax.lax.stop_gradient(distilled)
                               if rcfg.feature_stop_grad else distilled)

    instances = tf.render_instances(params, mcfg, flat, distilled_for_heads,
                                    compute_dtype)
    instances = jnp.where(app_mask, instances, 0.0).reshape(R, S, -1)
    instance_map = composite(weight, instances)

    points_xyz = rays[:, 0:3] + distance_map[:, None] * rays[:, 3:6]
    points_xyz = jax.lax.stop_gradient(points_xyz)
    if return_tail:
        return instance_map, points_xyz, tail, budget_tail
    return instance_map, points_xyz


def render_segment_features(params, mcfg: tf.TensoRFConfig, rcfg: RenderConfig,
                            state: RenderState, rays: jnp.ndarray,
                            rng: Optional[jax.Array] = None, is_train: bool = True,
                            fused: Optional[FusedGrids] = None,
                            return_tail: bool = False):
    """Semantic-logit pass with detached weights for the segment-grouping loss.

    Reference: panopli_tensoRF_renderer.py:259-300.
    """
    xyz_n, z_vals, weight, budget_tail = aux_density_weights(
        params, mcfg, rcfg, state, rays, rng, is_train, fused)
    live = jnp.any(rays[:, 3:6] != 0, axis=-1)
    weight, xyz_n, z_vals, tail = _aux_topk(rcfg, weight, xyz_n, z_vals, live)
    R, S = weight.shape
    flat = xyz_n.reshape(-1, 3)
    app_mask = (weight > rcfg.raymarch_weight_thres).reshape(-1, 1)

    # bf16 MLP compute under Config.precision (see render_instance_features)
    compute_dtype = (jnp.bfloat16 if rcfg.head_dtype == "bfloat16"
                     else jnp.float32)

    distilled_for_heads = None
    if mcfg.use_distilled:
        distilled = tf.render_distilled(params, mcfg, flat)
        distilled = jnp.where(app_mask, distilled, 0.0)
        distilled_for_heads = (jax.lax.stop_gradient(distilled)
                               if rcfg.feature_stop_grad else distilled)

    segments = tf.render_semantics(params, mcfg, flat, distilled_for_heads,
                                   compute_dtype)
    segments = jnp.where(app_mask, segments, 0.0).reshape(R, S, -1)
    segment_map = composite(weight, segments)
    segment_map = _semantic_map_postprocess(rcfg, segment_map)
    if return_tail:
        return segment_map, tail, budget_tail
    return segment_map
