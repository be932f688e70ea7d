"""Two-level empty-space-skipping render must match the dense path on a
trained (surface-peaked) field."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import RayPoolSampler
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.ops.fused_grid import build_fused_grids
from contrastive_lift_tpu.renderer import render as R
from contrastive_lift_tpu.train.state import init_train_state
from contrastive_lift_tpu.train.step import TrainGates, make_train_step


def test_two_level_matches_dense_after_training():
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(24, 32), seed=5)
    cfg = Config(batch_size=256, min_grid_dim=24, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 lr=2e-3, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (24,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    step = make_train_step(cfg, mcfg, rcfg, TrainGates(semantics_on=False),
                           weights, params)
    nrng = np.random.default_rng(0)
    for i in range(30):
        state, _ = step(state, state_r, sampler.sample(nrng, 256), None, None,
                        jax.random.PRNGKey(i), 1.0, 0.0)
    params = state.params

    fused = build_fused_grids(params, mcfg, corner_features=("appearance",),
                              with_occupancy=True, supervoxel=4)
    assert fused.coarse_occ is not None
    rays = scene.val_frames[0].rays[::5][:128]

    dense = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    rcfg_fast = dataclasses.replace(rcfg, coarse_stride=4,
                                    max_segments=rcfg.n_samples // 4)
    fast = R.render_rays(params, mcfg, rcfg_fast, state_r, rays, None, False,
                         fused=fused)
    # with max_segments covering every segment the only difference is the
    # occupancy threshold on empty space (alpha floor ~1e-6 per sample)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(dense["rgb"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(dense["depth"]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(fast["instances"]),
                               np.asarray(dense["instances"]), atol=2e-2)
    sem_d = np.asarray(dense["semantics"]).argmax(-1)
    sem_f = np.asarray(fast["semantics"]).argmax(-1)
    assert (sem_d == sem_f).mean() > 0.97

    # tighter budget still agrees (surfaces span few segments)
    rcfg_tight = dataclasses.replace(rcfg, coarse_stride=4, max_segments=24,
                                     head_topk=32)
    fast2 = R.render_rays(params, mcfg, rcfg_tight, state_r, rays, None, False,
                          fused=fused)
    np.testing.assert_allclose(np.asarray(fast2["rgb"]),
                               np.asarray(dense["rgb"]), atol=5e-2)


def test_l2_only_selection_matches_cascade():
    """use_l1=False (L2-only selection): with full budgets the kept
    sub-segments are the identical time-ordered set the cascade keeps (a
    tight-occupied sub always sits in a dilated-occupied segment), so the
    render outputs match exactly; calibrate_budgets in this mode keeps
    max_segments at the full count and sizes only the sub budget."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))

    # analytic shell field so occupancy is structured
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    dense_field = jnp.where(jnp.abs(r - 0.55) < 0.12, 10.0, 0.0)

    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)

    rng = np.random.default_rng(7)
    o = rng.uniform(-0.15, 0.15, (96, 3)).astype(np.float32)
    d = rng.normal(size=(96, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((96, 1), 0.01, np.float32),
                           np.full((96, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    S_c = -(-S // 8)
    cand = -(-S // 4)
    base = dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                               max_segments=S_c, max_subsegments=cand)
    cascade = R.occ_grouping_for(base, state_r)
    flat = dataclasses.replace(cascade, use_l1=False)
    assert flat.l2_flat_group >= 2

    out_c = R.render_rays(params, mcfg, cascade, state_r, rays, None, False,
                          fused=fused)
    out_f = R.render_rays(params, mcfg, flat, state_r, rays, None, False,
                          fused=fused)
    for k in ("rgb", "depth", "semantics", "instances", "opacity"):
        np.testing.assert_allclose(np.asarray(out_f[k]), np.asarray(out_c[k]),
                                   rtol=1e-6, atol=1e-6)

    # calibration in L2-only mode: segment budget stays full, subs shrink
    cal = R.calibrate_budgets(mcfg, flat, state_r, jnp.asarray(rays), fused)
    assert cal.max_segments == S_c
    assert cal.max_subsegments <= cand
    out_cal = R.render_rays(params, mcfg, cal, state_r, rays, None, False,
                            fused=fused)
    np.testing.assert_allclose(np.asarray(out_cal["rgb"]),
                               np.asarray(out_c["rgb"]), atol=2e-2)


def test_two_phase_termination_exact_and_guarded():
    """term_first two-phase evaluation: with term_fraction=1.0 every ray
    continues and the spliced two-pass result equals the single-pass render
    exactly (transmittance is multiplicative across contiguous rank blocks);
    a starved survivor fraction surfaces in budget_tail; calibration picks a
    (kA, fraction) pair and renders within tolerance of the full budget."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    dense_field = jnp.where((jnp.abs(r - 0.55) < 0.12)
                            | (jnp.abs(r - 0.3) < 0.08), 10.0, 0.0)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)

    rng = np.random.default_rng(11)
    o = rng.uniform(-0.1, 0.1, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((128, 1), 0.01, np.float32),
                           np.full((128, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    cand = -(-S // 4)
    base = R.occ_grouping_for(
        dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                            max_segments=-(-S // 8), max_subsegments=cand),
        state_r)

    single = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                           fused=fused)
    term_all = dataclasses.replace(base, term_first=8, term_fraction=1.0)
    out_t = R.render_rays(params, mcfg, term_all, state_r, rays, None, False,
                          fused=fused)
    for k in ("rgb", "depth", "semantics", "instances", "opacity"):
        np.testing.assert_allclose(np.asarray(out_t[k]),
                                   np.asarray(single[k]),
                                   rtol=1e-5, atol=1e-6)
    assert float(out_t["budget_tail"]) <= 1e-5

    # starved survivors: rays that still carry transmittance get cut -> tail
    starved = dataclasses.replace(base, term_first=4,
                                  term_fraction=1.0 / 128.0)
    out_s = R.render_rays(params, mcfg, starved, state_r, rays, None, False,
                          fused=fused)
    assert float(out_s["budget_tail"]) > 1e-3

    # calibrated termination point
    cal = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays), fused,
                              termination=True)
    assert cal.term_first > 0 and 0 < cal.term_fraction <= 1.0
    out_c = R.render_rays(params, mcfg, cal, state_r, rays, None, False,
                          fused=fused)
    np.testing.assert_allclose(np.asarray(out_c["rgb"]),
                               np.asarray(single["rgb"]), atol=2e-2)


def test_termination_composes_with_l2_only():
    """term_first + use_l1=False (both round-3 modes) compose: full-budget
    term_fraction=1.0 render equals the plain flat render exactly."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    dense_field = jnp.where(jnp.abs(r - 0.5) < 0.1, 10.0, 0.0)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)
    rng = np.random.default_rng(13)
    o = rng.uniform(-0.1, 0.1, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((64, 1), 0.01, np.float32),
                           np.full((64, 1), 1.5, np.float32)], axis=-1)
    S = rcfg.n_samples
    flat = dataclasses.replace(
        R.occ_grouping_for(
            dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                                max_segments=-(-S // 8),
                                max_subsegments=-(-S // 4)),
            state_r),
        use_l1=False)
    plain = R.render_rays(params, mcfg, flat, state_r, rays, None, False,
                          fused=fused)
    both = dataclasses.replace(flat, term_first=8, term_fraction=1.0)
    out = R.render_rays(params, mcfg, both, state_r, rays, None, False,
                        fused=fused)
    for k in ("rgb", "depth", "opacity", "semantics"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(plain[k]),
                                   rtol=1e-5, atol=1e-6)


def test_termination_empty_rays_dont_claim_survivor_slots():
    """Rays that miss all geometry have residual transmittance 1.0 but an
    EMPTY tail: they must neither crowd surface rays out of the pass-B
    survivor slots nor trip the budget_tail guardrail (their truncation
    loses nothing — full eval also sends everything to background)."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    # background at raw -20 (softplus(-30) ~ 0): at this coarse 33^3 step a
    # raw-0 background would itself clear the occupancy alpha threshold,
    # leaving no actually-empty rays to exercise
    dense_field = jnp.where((jnp.abs(r - 0.55) < 0.12)
                            | (jnp.abs(r - 0.3) < 0.08), 10.0, -20.0)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)

    rng = np.random.default_rng(17)
    # 32 surface rays (origin near center — always cross both shells) ...
    o_hit = rng.uniform(-0.1, 0.1, (32, 3)).astype(np.float32)
    d_hit = rng.normal(size=(32, 3)).astype(np.float32)
    d_hit /= np.linalg.norm(d_hit, axis=-1, keepdims=True)
    # ... and 96 empty rays: origins outside the outer shell pointing
    # outward — they exit the box without touching occupied space
    corner = np.sign(rng.normal(size=(96, 3))).astype(np.float32) * 0.85
    d_out = corner / np.linalg.norm(corner, axis=-1, keepdims=True)
    o = np.concatenate([o_hit, corner])
    d = np.concatenate([d_hit, d_out])
    rays = np.concatenate([o, d, np.full((128, 1), 0.01, np.float32),
                           np.full((128, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    base = R.occ_grouping_for(
        dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                            max_segments=-(-S // 8),
                            max_subsegments=-(-S // 4)),
        state_r)
    full = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                         fused=fused)
    # survivor budget (40) < number of empty rays (96): without the
    # has-remaining-candidates mask the empty rays would fill every slot,
    # truncating the surface rays mid-shell and driving budget_tail to ~1
    term = dataclasses.replace(base, term_first=4,
                               term_fraction=40.0 / 128.0)
    out = R.render_rays(params, mcfg, term, state_r, rays, None, False,
                        fused=fused)
    for k in ("rgb", "depth", "opacity", "semantics"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(full[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    assert float(out["budget_tail"]) <= 1e-3


def test_bounded_tail_calibration_proves_residual():
    """tail_eps calibration (VERDICT r3 #6): budgets sized by the per-ray
    residual bound must (a) never exceed the per-segment-eps budgets, and
    (b) keep every probe ray's truncation error — opacity delta vs the
    full-budget render — below tail_eps."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg
    from contrastive_lift_tpu.renderer.render import (_needed_budget,
                                                      _needed_budget_bounded)

    # unit: many jointly-negligible tail segments no longer inflate the need
    w = np.zeros((2, 12), np.float32)
    w[0, :2] = [0.6, 0.39]          # opaque ray: everything in 2 ranks
    w[0, 4:] = 1e-4                 # + dust the old metric ignores too
    w[1, :8] = 0.9e-3               # grazing ray: all dust, total 7.2e-3
    nb = np.asarray(_needed_budget_bounded(jnp.asarray(w), 1, 5e-3))
    assert nb[0] == 2               # residual after rank 2 = 8e-4 < 5e-3
    assert 1 < nb[1] <= 4           # must keep ranks until resid < 5e-3
    old = np.asarray(_needed_budget(jnp.asarray(w), 1, 1e-3))
    assert old[1] == 0              # old metric: nothing clears 1e-3 ...
    assert nb[1] > old[1]           # ... though truncating all loses 7.2e-3

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    dense_field = jnp.where((jnp.abs(r - 0.55) < 0.12)
                            | (jnp.abs(r - 0.3) < 0.08), 10.0, 0.0)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)

    rng = np.random.default_rng(5)
    o = rng.uniform(-0.1, 0.1, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((128, 1), 0.01, np.float32),
                           np.full((128, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    base = R.occ_grouping_for(
        dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                            max_segments=-(-S // 8),
                            max_subsegments=-(-S // 4)),
        state_r)
    full = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                         fused=fused)

    eps = 5e-3
    cal_std = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays),
                                  fused)
    cal_b = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays),
                                fused, tail_eps=eps)
    assert cal_b.max_segments <= cal_std.max_segments
    assert cal_b.max_subsegments <= cal_std.max_subsegments

    out_b = R.render_rays(params, mcfg, cal_b, state_r, rays, None, False,
                          fused=fused)
    op_err = np.abs(np.asarray(out_b["opacity"]) - np.asarray(full["opacity"]))
    # the proof: every probe ray's truncation loss stays under tail_eps
    # (margin/rounding only ADD budget; bf16 head noise doesn't touch opacity)
    assert float(op_err.max()) <= eps + 1e-4, float(op_err.max())


def test_head_term_on_fused_path_exact_and_calibrated():
    """head_term_first two-phase head evaluation on the production fused-ESS
    path: with head_term_fraction=1.0 the additive splice equals the plain
    top-k fused render up to summation-order rounding; calibration
    (head_term=True) picks a (kA, fraction) pair that renders within the
    head_tail contract of the full-k render."""
    import dataclasses

    from contrastive_lift_tpu.ops import fused_grid as fg

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))
    lin = jnp.linspace(-1, 1, 33)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    dense_field = jnp.where((jnp.abs(r - 0.55) < 0.12)
                            | (jnp.abs(r - 0.3) < 0.08), 10.0, 0.0)
    thres = fg.raw_occupancy_threshold(mcfg.splus_density_shift,
                                       float(state_r.step_size),
                                       rcfg.distance_scale,
                                       rcfg.occ_alpha_thres)
    fused = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=dense_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)

    rng = np.random.default_rng(13)
    o = rng.uniform(-0.1, 0.1, (128, 3)).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((128, 1), 0.01, np.float32),
                           np.full((128, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    base = R.occ_grouping_for(
        dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                            max_segments=-(-S // 8),
                            max_subsegments=-(-S // 4), head_topk=16),
        state_r)

    single = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                           fused=fused)
    ht_all = dataclasses.replace(base, head_term_first=6,
                                 head_term_fraction=1.0)
    out_h = R.render_rays(params, mcfg, ht_all, state_r, rays, None, False,
                          fused=fused)
    for k in ("rgb", "depth", "semantics", "instances", "opacity"):
        np.testing.assert_allclose(np.asarray(out_h[k]),
                                   np.asarray(single[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

    # the thick shells spread per-ray mass over many samples, so the ≥15%
    # expected-win rule (PERFORMANCE.md r4: a marginal split still pays the
    # two-pass launch overhead) must DECLINE head_term here
    cal = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays), fused,
                              head_term=True)
    assert cal.head_term_first == 0, (
        "head_term must decline on a field with no expected win")

    # a sharp surface concentrates mass in the first few sorted samples —
    # calibration must fire there, and the calibrated render must match
    sharp_field = jnp.where(jnp.abs(r - 0.45) < 0.07, 60.0, 0.0)
    fused_s = fg.build_fused_grids(
        params, mcfg, corner_features=("appearance",), with_occupancy=True,
        dense_override=sharp_field, with_atlas=True, with_occ_groups=True,
        occ_bits_thres=thres)
    cal = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays),
                              fused_s, head_term=True)
    assert cal.head_term_first > 0 and 0 < cal.head_term_fraction <= 1.0
    single_s = R.render_rays(params, mcfg, base, state_r, rays, None, False,
                             fused=fused_s)
    out_c = R.render_rays(params, mcfg, cal, state_r, rays, None, False,
                          fused=fused_s)
    np.testing.assert_allclose(np.asarray(out_c["rgb"]),
                               np.asarray(single_s["rgb"]), atol=2e-2)
    # heavy/light bucketing must still calibrate when termination is off
    # (regression: the head_term block must not break the if/elif chain)
    if base.heavy_fraction > 0:
        assert cal.max_subsegments_light <= cal.max_subsegments
