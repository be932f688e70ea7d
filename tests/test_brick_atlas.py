"""Brick-atlas fast path: exactness of atlas interpolation, compacted
feature tables, per-head top-k, and the Pallas interp kernel.

These guard the inference fast path introduced for the v5e gather cliffs
(PERFORMANCE.md): gather throughput collapses with table row count, so the
fine density samples one 128-lane brick row (5^3 corner lattice of a 4-voxel
brick) per sample, and corner-feature rows keep only occupied bricks."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.ops import fused_grid as fg
from contrastive_lift_tpu.renderer import render as R


def _model(grid=33, classes=7):
    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    return build_model(cfg, classes, step_ratio=0.25)


def test_atlas_interp_matches_cell_interp():
    """sample_density_brick == sample_density_fused (same trilinear math)."""
    mcfg, params, rcfg, state_r = _model()
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2048, 3)),
                      jnp.float32)
    a = fg.sample_density_brick(fused, xyz, mcfg.splus_density_shift)
    b = fg.sample_density_fused(fused, xyz, mcfg.splus_density_shift)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_atlas_boundary_cells():
    """Edge-clamped atlas rows agree with the dense path at grid boundaries
    (grid dims not divisible by the brick size)."""
    mcfg, params, rcfg, state_r = _model(grid=30)
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True)
    # points hugging every face/corner of the box
    eps = 1e-4
    corners = np.array(np.meshgrid(*[[-1 + eps, 0.0, 1 - eps]] * 3,
                                   indexing="ij")).reshape(3, -1).T
    xyz = jnp.asarray(corners, jnp.float32)
    a = fg.sample_density_brick(fused, xyz, mcfg.splus_density_shift)
    b = fg.sample_density_fused(fused, xyz, mcfg.splus_density_shift)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_compact_features_match_full():
    """Occupancy-compacted corner rows reproduce full-table features inside
    occupied bricks and zero outside (where the weight mask discards them)."""
    mcfg, params, rcfg, state_r = _model()
    rng = np.random.default_rng(1)
    # structured density so some bricks are empty: slab on component 0, all
    # other components zeroed (random init is weakly dense everywhere)
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    slab = (np.abs(lin) < 0.25).astype(np.float32)
    dp = [np.zeros_like(np.array(p)) for p in params["density"]["planes"]]
    dl = [np.zeros_like(np.array(l)) for l in params["density"]["lines"]]
    dp[0][0] = 9.0 * slab[None, :]   # single slab along x only
    dl[0][0] = 1.0
    params = dict(params)
    params["density"] = {"planes": tuple(jnp.asarray(p) for p in dp),
                         "lines": tuple(jnp.asarray(l) for l in dl)}

    # at a 33^3 grid the per-sample step is large enough that even the empty
    # field's alpha (softplus(-10)*step*ds ~ 1.8e-5) clears the production
    # 1e-5 threshold; use a threshold matched to this step size
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale, 1e-4)
    full = fg.build_fused_grids(params, mcfg, corner_features=("appearance",),
                                with_occupancy=True)
    n_occ = fg.count_occupied_bricks(full, thres)
    assert 0 < n_occ < full.coarse_occ.shape[0]
    comp = fg.build_compact_tables(full, thres, fg.compact_capacity_bucket(n_occ))

    xyz = jnp.asarray(rng.uniform(-1, 1, (4096, 3)), jnp.float32)
    f_full = fg.sample_feature_fused(full, "appearance", xyz,
                                     out_dim=mcfg.dim_appearance)
    f_comp = fg.sample_feature_fused(comp, "appearance", xyz,
                                     out_dim=mcfg.dim_appearance)
    occ = np.asarray(fg.sample_coarse_occ(full, xyz)) > thres
    np.testing.assert_allclose(np.asarray(f_comp)[occ],
                               np.asarray(f_full)[occ], rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(f_comp)[~occ] == 0.0)


def test_packed_compact_tables_match_unpacked():
    """cells_per_row packing (2 and 4 cells per wider row) is a pure layout
    change: sample_feature_fused selects the owning segment and reproduces
    the unpacked compact tables bit-for-bit."""
    mcfg, params, rcfg, state_r = _model()
    rng = np.random.default_rng(3)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale, 1e-4)
    full = fg.build_fused_grids(params, mcfg, corner_features=("appearance",),
                                with_occupancy=True)
    cap = fg.compact_capacity_bucket(fg.count_occupied_bricks(full, thres))
    comp1 = fg.build_compact_tables(full, thres, cap)
    xyz = jnp.asarray(rng.uniform(-1, 1, (4096, 3)), jnp.float32)
    base = fg.sample_feature_fused(comp1, "appearance", xyz,
                                   out_dim=mcfg.dim_appearance)
    for cpr in (2, 4):
        compc = fg.build_compact_tables(full, thres, cap, cells_per_row=cpr)
        tab = compc.compact_feature_cells["appearance"]
        assert tab.shape[0] == comp1.compact_feature_cells["appearance"].shape[0] // cpr
        got = fg.sample_feature_fused(compc, "appearance", xyz,
                                      out_dim=mcfg.dim_appearance)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_per_head_topk_prefix():
    """head_topk_semins uses the top-k2 weight samples: when every sample
    above the weight threshold fits in k2, maps are identical."""
    mcfg, params, rcfg, state_r = _model()
    rays = np.zeros((32, 8), np.float32)
    rng = np.random.default_rng(2)
    o = rng.uniform(-0.2, 0.2, (32, 3))
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays[:, 0:3], rays[:, 3:6] = o, d
    rays[:, 6], rays[:, 7] = 0.05, 3.0
    rays = jnp.asarray(rays)

    base = dataclasses.replace(rcfg, head_topk=64, head_topk_semins=None)
    split = dataclasses.replace(rcfg, head_topk=64, head_topk_semins=64)
    out_a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    out_b = R.render_rays(params, mcfg, split, state_r, rays, None, False)
    for key in ("semantics", "instances", "rgb"):
        np.testing.assert_allclose(np.asarray(out_a[key]),
                                   np.asarray(out_b[key]), rtol=1e-6, atol=1e-6)


def test_pallas_interp_kernel_matches():
    """The Pallas brick-interp kernel (interpret mode on CPU) matches the
    fused-XLA lane formulation."""
    from contrastive_lift_tpu.ops.pallas_interp import (brick_interp,
                                                        default_interpret)
    rng = np.random.default_rng(3)
    rows = jnp.asarray(rng.standard_normal((500, 128)), jnp.float32)
    frac = jnp.asarray(rng.uniform(0, 4, (500, 3)), jnp.float32)
    got = np.asarray(brick_interp(rows, frac, interpret=default_interpret()))

    lane = np.arange(128)
    a, b, c = lane // 25, (lane // 5) % 5, lane % 5
    f = np.asarray(frac)
    w = (np.maximum(0, 1 - np.abs(f[:, 0:1] - a))
         * np.maximum(0, 1 - np.abs(f[:, 1:2] - b))
         * np.maximum(0, 1 - np.abs(f[:, 2:3] - c)))
    want = (np.asarray(rows) * w).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_render_grids_driver_buckets():
    """build_render_grids sizes the compact capacity from the scene."""
    mcfg, params, rcfg, state_r = _model()
    rcfg = dataclasses.replace(rcfg, coarse_stride=8, max_segments=12)
    fused = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.float32)
    assert fused.brick_atlas is not None
    assert fused.slot_map is not None
    assert "appearance" in fused.compact_feature_cells
    assert not fused.feature_cells  # full corner tables dropped


def test_three_level_matches_two_level():
    """Third ESS level (sub-segment tests vs the one-voxel-margin occupancy)
    reproduces the two-level maps when the sub-segment budget covers every
    occupied sub-segment (same conservative contract)."""
    mcfg, params, rcfg0, state_r = _model()
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    slab = (np.abs(lin) < 0.3).astype(np.float32)
    dp = [np.array(p) for p in params["density"]["planes"]]
    for i in range(3):
        dp[i][0] = 8.0 * slab[None, :]
    params = dict(params)
    params["density"] = {"planes": tuple(jnp.asarray(p) for p in dp),
                         "lines": params["density"]["lines"]}
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True)
    assert fused.coarse_occ_tight is not None

    rng = np.random.default_rng(4)
    o = rng.uniform(-0.2, 0.2, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((64, 1), 0.01, np.float32),
         np.full((64, 1), 3.0, np.float32)], -1))

    two = dataclasses.replace(rcfg0, coarse_stride=8, max_segments=16,
                              head_topk=16)
    three = dataclasses.replace(two, sub_stride=4,
                                max_subsegments=16 * 2)  # full budget
    out2 = R.render_rays(params, mcfg, two, state_r, rays, None, False,
                         fused=fused)
    out3 = R.render_rays(params, mcfg, three, state_r, rays, None, False,
                         fused=fused)
    for key in ("rgb", "depth", "opacity", "semantics", "instances"):
        np.testing.assert_allclose(np.asarray(out3[key]),
                                   np.asarray(out2[key]), atol=5e-3,
                                   err_msg=key)

    # a tighter sub-budget still renders the surfaces (bounded drift)
    tight = dataclasses.replace(two, sub_stride=4, max_subsegments=12)
    out_t = R.render_rays(params, mcfg, tight, state_r, rays, None, False,
                          fused=fused)
    np.testing.assert_allclose(np.asarray(out_t["opacity"]),
                               np.asarray(out2["opacity"]), atol=0.1)


def test_grouped_occupancy_matches_ungrouped():
    """Grouped occupancy tests (one 5^3-neighborhood row per group of
    consecutive tests) select byte-identical samples to per-test gathers,
    at every level — the contract of sample_occ_grouped / occ_grouping_for."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True, with_occ_groups=True,
                                 dense_override=dense)
    assert fused.occ_group is not None and fused.occ_group_tight is not None

    rng = np.random.default_rng(6)
    o = rng.uniform(-0.2, 0.2, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((128, 1), 0.01, np.float32),
         np.full((128, 1), 3.0, np.float32)], -1))

    base = dataclasses.replace(rcfg0, coarse_stride=16, max_segments=12,
                               sub_stride=8, max_subsegments=16)
    grouped = R.occ_grouping_for(base, state_r)
    assert grouped.occ_group_l1 >= 2
    # exercise the L2 grouped path too (off by default — measured slower on
    # v5e — but its correctness contract is identical)
    grouped = dataclasses.replace(grouped, occ_group_l2=True)
    out_u = R._two_level_density(mcfg, base, state_r, rays, fused)
    out_g = R._two_level_density(mcfg, grouped, state_r, rays, fused)
    for a, b in zip(out_u, out_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # raw grouped values equal per-test values on probe pairs that honor the
    # group-span contract (consecutive tests within ~a block), both grids
    base_p = rng.uniform(-1.05, 1.05, (16, 1, 3))
    probes = jnp.asarray(base_p + rng.uniform(-0.05, 0.05, (16, 10, 3)),
                         jnp.float32)
    for tight in (False, True):
        v_g = fg.sample_occ_grouped(fused, probes, group=2, tight=tight)
        v_u = fg.sample_coarse_occ(fused, probes.reshape(-1, 3), tight=tight)
        np.testing.assert_array_equal(np.asarray(v_g).ravel(), np.asarray(v_u))


def test_head_dedup_matches_per_sample():
    """Unique-cell head dedup (RenderConfig.head_dedup_cells) reproduces the
    per-sample-gather render exactly when the cap covers every live run, and
    reports dedup_tail == 0; an undersized cap raises the tail."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)
    base = dataclasses.replace(rcfg0, coarse_stride=16, max_segments=12,
                               sub_stride=8, max_subsegments=16,
                               head_topk=16, head_topk_semins=8)
    fused = fg.build_render_grids(params, mcfg, base, state_r, compact=True,
                                  dense_override=dense)
    assert "appearance" in fused.compact_feature_cells

    rng = np.random.default_rng(9)
    o = rng.uniform(-0.2, 0.2, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((128, 1), 0.01, np.float32),
         np.full((128, 1), 3.0, np.float32)], -1))

    ref = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                        fused=fused)
    # covering cap: measured live run counts on these rays + slack
    out_d = R._two_level_density(mcfg, base, state_r, rays, fused)
    runs = fg.head_dedup_run_counts(
        fused, out_d[0], out_d[6] > base.raymarch_weight_thres)
    cap = int(np.max(np.asarray(runs))) + 1
    assert cap < 16  # the dedup must actually dedup something here
    ded = dataclasses.replace(base, head_dedup_cells=cap)
    out = R.render_rays(params, mcfg, ded, state_r, rays, None, False,
                        fused=fused)
    assert float(out["dedup_tail"]) == 0.0
    for key in ("rgb", "semantics", "instances", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]), rtol=1e-5,
                                   atol=1e-6, err_msg=key)

    # undersized cap -> guardrail fires (and the render stays finite)
    tiny = dataclasses.replace(base, head_dedup_cells=2)
    out_t = R.render_rays(params, mcfg, tiny, state_r, rays, None, False,
                          fused=fused)
    assert float(out_t["dedup_tail"]) > 0.0
    assert np.all(np.isfinite(np.asarray(out_t["rgb"])))

    # calibrate_budgets picks a cap that keeps the dedup exact on the probe
    cal = R.calibrate_budgets(mcfg, base, state_r, rays, fused)
    if cal.head_dedup_cells is not None:
        out_c = R.render_rays(params, mcfg, cal, state_r, rays, None, False,
                              fused=fused)
        assert float(out_c["dedup_tail"]) == 0.0


def test_bitpacked_occupancy_matches_f32():
    """Bit-packed grouped occupancy (the alpha test baked into uint32
    neighborhood words, fused_grid.sample_occ_bits_grouped) selects
    byte-identical samples to the f32 per-test path at both levels, and the
    full three-level density pass is bit-for-bit unchanged."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)

    base = dataclasses.replace(rcfg0, coarse_stride=16, max_segments=12,
                               sub_stride=8, max_subsegments=16)
    thres = fg.raw_occupancy_threshold(
        mcfg.splus_density_shift, float(state_r.step_size),
        base.distance_scale, base.occ_alpha_thres)
    fused_f32 = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                     with_atlas=True, with_occ_groups=True,
                                     dense_override=dense)
    fused_bits = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                      with_atlas=True, with_occ_groups=True,
                                      dense_override=dense,
                                      occ_bits_thres=thres)
    assert fused_bits.occ_bits_group is not None
    assert fused_bits.occ_group is None  # f32 rows skipped when bits built

    # raw test equality on grouped probes honoring the span contract
    rng = np.random.default_rng(6)
    base_p = rng.uniform(-1.05, 1.05, (16, 1, 3))
    probes = jnp.asarray(base_p + rng.uniform(-0.05, 0.05, (16, 10, 3)),
                         jnp.float32)
    for tight in (False, True):
        bit = fg.sample_occ_bits_grouped(fused_bits, probes, group=2,
                                         tight=tight)
        raw = fg.sample_coarse_occ(fused_f32, probes.reshape(-1, 3),
                                   tight=tight)
        np.testing.assert_array_equal(np.asarray(bit).ravel(),
                                      np.asarray(raw) > thres)

    # full three-level pass: grouped-bits == ungrouped-f32, all outputs
    o = rng.uniform(-0.2, 0.2, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((128, 1), 0.01, np.float32),
         np.full((128, 1), 3.0, np.float32)], -1))
    grouped = R.occ_grouping_for(base, state_r)
    assert grouped.occ_group_l1 >= 2 and grouped.occ_group_l2
    out_u = R._two_level_density(mcfg, base, state_r, rays, fused_f32)
    out_b = R._two_level_density(mcfg, grouped, state_r, rays, fused_bits)
    for a, b in zip(out_u, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tight_feature_compaction_exact():
    """Compacting feature rows against the UNDILATED brick max at the
    raymarch weight threshold keeps maps identical to the loose (dilated,
    occ-threshold) compaction: every sample the weight mask keeps finds its
    features, and dropped bricks only ever hold masked samples."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)
    rcfg = dataclasses.replace(rcfg0, coarse_stride=8, max_segments=24,
                               sub_stride=4, max_subsegments=32, head_topk=16)

    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    loose = fg.build_fused_grids(params, mcfg, corner_features=("appearance",),
                                 with_occupancy=True, with_atlas=True,
                                 dense_override=dense)
    n_occ = fg.count_occupied_bricks(loose, thres)
    loose = fg.build_compact_tables(loose, thres,
                                    fg.compact_capacity_bucket(n_occ))
    tight = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.float32,
                                  dense_override=dense)
    # genuinely fewer rows
    assert (tight.compact_feature_cells["appearance"].shape[0]
            < loose.compact_feature_cells["appearance"].shape[0])

    rng = np.random.default_rng(9)
    o = rng.uniform(-0.2, 0.2, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((256, 1), 0.01, np.float32),
         np.full((256, 1), 3.0, np.float32)], -1))
    out_l = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                          fused=loose)
    out_t = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                          fused=tight)
    np.testing.assert_allclose(np.asarray(out_t["rgb"]),
                               np.asarray(out_l["rgb"]), atol=1e-5)


def test_heavy_light_bucketing_matches():
    """Two static-shape fine passes (heavy/light ray bucketing) reproduce the
    single-budget maps exactly when the light budget covers every non-heavy
    ray — the rows are sorted, evaluated at two widths, padded and unsorted
    (renderer _two_level_density bucketing branch)."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True, dense_override=dense)
    rng = np.random.default_rng(8)
    o = rng.uniform(-0.2, 0.2, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((256, 1), 0.01, np.float32),
         np.full((256, 1), 3.0, np.float32)], -1))

    base = dataclasses.replace(rcfg0, coarse_stride=8, max_segments=24,
                               sub_stride=4, max_subsegments=32, head_topk=16)
    # generous light budget: every ray below the heavy cut fits
    bucketed = dataclasses.replace(base, max_subsegments_light=24,
                                   heavy_fraction=0.25)
    out_a = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                          fused=fused)
    out_b = R.render_rays(params, mcfg, bucketed, state_r, rays, None, False,
                          fused=fused)
    # light rays may legitimately skip deep occupied-but-weightless subsegs
    # the full budget still evaluates — differences sit at the alpha floor
    # (measured max 3e-5), far inside the ESS fidelity envelope
    for key in ("rgb", "opacity", "depth", "semantics", "instances"):
        np.testing.assert_allclose(np.asarray(out_b[key]),
                                   np.asarray(out_a[key]), atol=2e-4,
                                   err_msg=key)
    assert float(out_b["budget_tail"]) < 1e-3

    # a deliberately starved light budget trips the guardrail signal
    starved = dataclasses.replace(base, max_subsegments_light=8,
                                  heavy_fraction=1.0 / 256.0)
    out_s = R.render_rays(params, mcfg, starved, state_r, rays, None, False,
                          fused=fused)
    assert float(out_s["budget_tail"]) > 1e-3


def test_calibrate_budgets():
    """Auto budgets: a sparse slab needs few segments (budget shrinks from
    the config default); the calibrated render matches the full-budget one."""
    mcfg, params, rcfg0, state_r = _model()
    lin = np.linspace(-1, 1, 33, dtype=np.float32)
    slab = (np.abs(lin) < 0.15).astype(np.float32)
    dp = [np.zeros_like(np.array(p)) for p in params["density"]["planes"]]
    dl = [np.zeros_like(np.array(l)) for l in params["density"]["lines"]]
    dp[0][0] = 9.0 * slab[None, :]
    dl[0][0] = 1.0
    params = dict(params)
    params["density"] = {"planes": tuple(jnp.asarray(p) for p in dp),
                         "lines": tuple(jnp.asarray(l) for l in dl)}
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True)

    rng = np.random.default_rng(5)
    o = rng.uniform(-0.9, -0.6, (128, 1))
    rays = np.zeros((128, 8), np.float32)
    rays[:, 0] = o[:, 0]          # origins left of the slab
    rays[:, 3] = 1.0              # marching +x through it
    rays[:, 1] = rng.uniform(-0.5, 0.5, 128)
    rays[:, 2] = rng.uniform(-0.5, 0.5, 128)
    rays[:, 6], rays[:, 7] = 0.01, 3.0

    base = dataclasses.replace(rcfg0, coarse_stride=8, max_segments=32,
                               sub_stride=4, max_subsegments=64, head_topk=16)
    cal = R.calibrate_budgets(mcfg, base, state_r, rays, fused)
    # one thin slab: the x-marching rays cross few occupied segments
    assert cal.max_segments < base.max_segments
    assert cal.max_subsegments <= base.max_subsegments

    out_base = R.render_rays(params, mcfg, base, state_r, jnp.asarray(rays),
                             None, False, fused=fused)
    out_cal = R.render_rays(params, mcfg, cal, state_r, jnp.asarray(rays),
                            None, False, fused=fused)
    np.testing.assert_allclose(np.asarray(out_cal["opacity"]),
                               np.asarray(out_base["opacity"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_cal["rgb"]),
                               np.asarray(out_base["rgb"]), atol=1e-3)


def test_tight_feature_compaction_brick_boundary_edge():
    """Regression: a surface whose density rises out of an otherwise-empty
    block ACROSS the block boundary (only the shared boundary node layer is
    solid) must keep that block's feature rows — the block's last cell layer
    interpolates from node sv*b+sv, which the stride-sv window max excludes
    (_block_node_max includes it). Before the fix, live samples on the rising
    edge read zero sentinel feature rows and rendered wrong colors."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    dense = np.zeros((48, 48, 48), np.float32)
    dense[8, :, :] = 12.0  # solid plane exactly on a block-boundary node
    dense = jnp.asarray(dense)
    rcfg = dataclasses.replace(rcfg0, coarse_stride=8, max_segments=24,
                               sub_stride=4, max_subsegments=32, head_topk=16)

    full = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=False,
                                 feature_dtype=jnp.float32,
                                 dense_override=dense)
    tight = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.float32,
                                  dense_override=dense)

    # rays marching +x into the plane: the last samples before the surface
    # sit in cells 4..7 (block 1, empty nodes) with weight above the raymarch
    # threshold (density rises linearly to 12 across cell 7)
    rng = np.random.default_rng(11)
    o = np.stack([np.full(128, -0.95), rng.uniform(-0.4, 0.4, 128),
                  rng.uniform(-0.4, 0.4, 128)], -1).astype(np.float32)
    d = np.stack([np.ones(128), rng.normal(0, 0.05, 128),
                  rng.normal(0, 0.05, 128)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((128, 1), 0.01, np.float32),
         np.full((128, 1), 3.0, np.float32)], -1))
    out_f = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                          fused=full)
    out_t = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                          fused=tight)
    assert float(jnp.max(out_f["opacity"])) > 0.5  # the plane is actually hit
    np.testing.assert_allclose(np.asarray(out_t["rgb"]),
                               np.asarray(out_f["rgb"]), atol=1e-5)


def _grid_variant_model(grid=33, classes=7):
    """Grid-variant config: semantic/instance as VM branches (all_grid.yaml),
    the configuration the fused multibranch corner table serves."""
    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 use_mlp_for_semantics=False, use_mlp_for_instances=False,
                 seed=0).resolve_epochs()
    return build_model(cfg, classes, step_ratio=0.25)


def test_multibranch_semins_table_built_and_exact():
    """build_render_grids fuses semantic+instance into ONE corner table for
    grid-variant models (one row gather serves both co-sampled branches —
    PERFORMANCE.md round-4 gather microbench); sampling it must reproduce
    the separate dense-grid trilinear interpolation exactly (same bf16
    source values, f32 accumulation)."""
    mcfg, params, rcfg, state_r = _grid_variant_model()
    rcfg = dataclasses.replace(rcfg, coarse_stride=8, max_segments=12)
    fused = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.bfloat16)
    assert "semantic+instance" in fused.compact_feature_cells
    assert "semantic" not in fused.compact_feature_cells
    assert "instance" not in fused.features

    # reference path: per-branch dense grids (8-gather trilinear), same bf16
    plain = fg.build_fused_grids(params, mcfg, feature_dtype=jnp.bfloat16,
                                 with_occupancy=True)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.uniform(-0.95, 0.95, (4096, 3)), jnp.float32)
    ds, di = mcfg.dim_semantics, mcfg.dim_instances
    both = fg.sample_feature_fused(fused, "semantic+instance", xyz,
                                   out_dim=ds + di)
    sem_ref = fg.sample_feature_fused(plain, "semantic", xyz, out_dim=ds)
    ins_ref = fg.sample_feature_fused(plain, "instance", xyz, out_dim=di)
    # compacted table zeroes cells in unoccupied bricks — compare only
    # samples whose brick is occupied (sentinel-slot rows are zero)
    i, _ = fg._cell_coords(fused.grid_dim, xyz)
    pos = fg._compact_row_index(fused, i)
    live = np.asarray(pos >= fused.supervoxel ** 3)
    np.testing.assert_allclose(np.asarray(both[live, :ds]),
                               np.asarray(sem_ref[live]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(both[live, ds:]),
                               np.asarray(ins_ref[live]), atol=1e-4)


def test_multibranch_render_matches_separate():
    """Full render through the fused sem+ins corner table == render through
    per-branch dense grids (head feature path is the only difference)."""
    mcfg, params, rcfg, state_r = _grid_variant_model()
    rcfg = dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                               max_segments=12, max_subsegments=24,
                               head_topk=16)
    rng = np.random.default_rng(5)
    o = rng.uniform(-0.1, 0.1, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((64, 1), 0.01, np.float32),
                           np.full((64, 1), 1.5, np.float32)], axis=-1)
    fused = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.bfloat16)
    rcfg = R.occ_grouping_for(rcfg, state_r)
    out_mb = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                           fused=fused)
    # separate-branch reference: same occupancy/atlas structure, no combo
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    feat_thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                            float(state_r.step_size),
                                            rcfg.distance_scale,
                                            rcfg.raymarch_weight_thres)
    cap = fused.compact_feature_cells["semantic+instance"].shape[0] \
        // fused.supervoxel ** 3 - 1
    sep = fg.build_fused_grids(
        params, mcfg, feature_dtype=jnp.bfloat16,
        corner_features=("appearance",), with_occupancy=True,
        compact_capacity=cap, occ_raw_thres=thres, with_atlas=True,
        with_occ_groups=True, occ_bits_thres=thres,
        feat_raw_thres=feat_thres)
    out_sep = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                            fused=sep)
    for k in ("rgb", "semantics", "instances", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out_mb[k]),
                                   np.asarray(out_sep[k]),
                                   rtol=1e-4, atol=2e-4, err_msg=k)


def test_span_gather_matches_per_sample_unit():
    """sample_density_brick_span == sample_density_brick on consecutive-
    sample spans, byte-identical (the W-way masked select adds exact zeros),
    including worst-case axis-diagonal directions and a coarse spacing that
    needs more than 4 rows (W sized by span_rows_required)."""
    mcfg, params, rcfg0, state_r = _model()
    rng = np.random.default_rng(11)
    dense = jnp.asarray(rng.normal(size=(33, 33, 33)).astype(np.float32))
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True, dense_override=dense)
    g = 33
    units = np.full(3, 2.0 / (g - 1), np.float64)   # normalized-space voxel
    diag = np.float32(1.0 / np.sqrt(3.0))
    for T, step_vox in ((8, 0.25), (8, 1.25), (16, 0.25)):
        W = fg.span_rows_required(units, step_vox * units[0], T)
        Rr, K = 16, 6
        o = rng.uniform(-0.9, 0.4, (Rr, 3)).astype(np.float32)
        d = rng.normal(size=(Rr, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d[:4] = diag                                  # worst-case diagonals
        d[4:6] = np.array([[1, 0, 0], [0, diag * 0, 1]], np.float32)[:, :3]
        start = rng.uniform(0.0, 2.0, (Rr, K, 1)).astype(np.float32)
        t = (start + np.arange(T, dtype=np.float32)[None, None, :]
             * step_vox) * units[0]
        xyz = (o[:, None, None, :]
               + d[:, None, None, :] * t[..., None]).astype(np.float32)
        xyz = np.clip(xyz, -1.0, 1.0)
        ref = fg.sample_density_brick(fused, jnp.asarray(xyz.reshape(-1, 3)),
                                      mcfg.splus_density_shift)
        got = fg.sample_density_brick_span(fused, jnp.asarray(xyz),
                                           mcfg.splus_density_shift, W)
        np.testing.assert_array_equal(np.asarray(got).reshape(-1),
                                      np.asarray(ref),
                                      err_msg=f"T={T} step={step_vox} W={W}")


def test_span_gather_render_matches_per_sample():
    """render_rays with fine_span_rows (span gathers in every fine pass:
    two-phase termination A/B, heavy/light) is byte-identical to the
    per-sample gather path on the full three-level production shape."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    lin = np.linspace(-1, 1, 48, dtype=np.float32)
    shell = (np.abs(np.sqrt(lin[:, None, None]**2 + lin[None, :, None]**2
                            + lin[None, None, :]**2) - 0.5) < 0.07)
    dense = jnp.asarray(np.where(shell, 11.0, 0.0), jnp.float32)
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True, dense_override=dense)
    rng = np.random.default_rng(7)
    o = rng.uniform(-0.2, 0.2, (96, 3)).astype(np.float32)
    d = rng.normal(size=(96, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((96, 1), 0.01, np.float32),
         np.full((96, 1), 3.0, np.float32)], -1))
    base = dataclasses.replace(rcfg0, coarse_stride=16, max_segments=12,
                               sub_stride=8, max_subsegments=16, head_topk=8,
                               head_tail_complete=True)
    for extra in ({}, {"term_first": 6, "term_fraction": 0.5},
                  {"max_subsegments_light": 8, "heavy_fraction": 0.25}):
        a = dataclasses.replace(base, **extra)
        b = dataclasses.replace(a, fine_span_rows=4)
        R.validate_fine_span(b, state_r)              # contract holds here
        out_a = R.render_rays(params, mcfg, a, state_r, rays, None, False,
                              fused=fused)
        out_b = R.render_rays(params, mcfg, b, state_r, rays, None, False,
                              fused=fused)
        for key in ("rgb", "semantics", "instances", "depth", "opacity",
                    "budget_tail"):
            np.testing.assert_array_equal(np.asarray(out_a[key]),
                                          np.asarray(out_b[key]),
                                          err_msg=f"{key} {extra}")


def test_validate_fine_span_contract():
    """validate_fine_span rejects a span-row budget below the worst-case
    brick-transition count (silent clamping would be inexact) and accepts
    the span_rows_required sizing; calibrate_budgets runs the check."""
    mcfg, params, rcfg0, state_r = _model()
    ok = dataclasses.replace(rcfg0, coarse_stride=16, sub_stride=8,
                             max_segments=12, max_subsegments=16,
                             fine_span_rows=4)
    R.validate_fine_span(ok, state_r)                 # 0.25-voxel steps: 4 ok
    bad = dataclasses.replace(ok, fine_span_rows=2)
    with pytest.raises(ValueError, match="fine_span_rows"):
        R.validate_fine_span(bad, state_r)
    fused = fg.build_fused_grids(params, mcfg, with_occupancy=True,
                                 with_atlas=True)
    probe = jnp.asarray(np.concatenate(
        [np.zeros((8, 3), np.float32),
         np.tile(np.float32([1, 0, 0]), (8, 1)),
         np.full((8, 1), 0.01, np.float32),
         np.full((8, 1), 3.0, np.float32)], -1))
    with pytest.raises(ValueError, match="fine_span_rows"):
        R.calibrate_budgets(mcfg, bad, state_r, probe, fused)


def test_atlas_dtype_config_plumbing():
    """RenderConfig.atlas_dtype reaches the built atlas through the
    production _build_render_grids path, and the bf16 render stays within
    the bf16 rounding band of fp32 (fidelity-gated knob, not exact)."""
    mcfg, params, rcfg0, state_r = _model(grid=48)
    from contrastive_lift_tpu.inference.render import _build_render_grids
    base = dataclasses.replace(rcfg0, coarse_stride=16, max_segments=12,
                               sub_stride=8, max_subsegments=16, head_topk=8)
    bf = dataclasses.replace(base, atlas_dtype="bfloat16")
    fused32 = _build_render_grids(params, mcfg, base, state_r)
    fused16 = _build_render_grids(params, mcfg, bf, state_r)
    assert fused32.brick_atlas.dtype == jnp.float32
    assert fused16.brick_atlas.dtype == jnp.bfloat16
    rng = np.random.default_rng(9)
    o = rng.uniform(-0.2, 0.2, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((64, 1), 0.01, np.float32),
         np.full((64, 1), 3.0, np.float32)], -1))
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                      fused=fused32)
    b = R.render_rays(params, mcfg, bf, state_r, rays, None, False,
                      fused=fused16)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               atol=0.05)
    with pytest.raises(ValueError, match="atlas_dtype"):
        dataclasses.replace(base, atlas_dtype="fp8")
