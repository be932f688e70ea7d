"""Top-k head compaction must match dense rendering when k covers all active
samples (the weight distribution is surface-peaked by construction)."""
import dataclasses

import numpy as np
import jax

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import RayPoolSampler
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.renderer import render as R
from contrastive_lift_tpu.train.state import init_train_state
from contrastive_lift_tpu.train.step import TrainGates, make_train_step


import functools


@functools.lru_cache(maxsize=1)
def _trained_setup():
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(24, 32), seed=1)
    cfg = Config(batch_size=256, min_grid_dim=20, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 lr=2e-3, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (20,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    step = make_train_step(cfg, mcfg, rcfg, TrainGates(semantics_on=False),
                           weights, params)
    nrng = np.random.default_rng(0)
    for i in range(25):
        state, _ = step(state, state_r, sampler.sample(nrng, 256), None, None,
                        jax.random.PRNGKey(i), 1.0, 0.0)
    return scene, cfg, mcfg, state.params, rcfg, state_r


def test_topk_matches_dense_after_training():
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::7][:128]
    dense = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    # count active samples per ray to choose a covering k
    xyz, z, in_box = R.sample_points_in_box(rays, state_r, rcfg.n_samples, 0.0,
                                            None, False)
    rcfg_k = dataclasses.replace(rcfg, head_topk=rcfg.n_samples // 2)
    topk = R.render_rays(params, mcfg, rcfg_k, state_r, rays, None, False)
    # identical whenever k covers every above-threshold sample; allow a tiny
    # tail tolerance for rays with very diffuse early-training weights
    np.testing.assert_allclose(np.asarray(topk["rgb"]),
                               np.asarray(dense["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(topk["instances"]),
                               np.asarray(dense["instances"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(topk["depth"]),
                               np.asarray(dense["depth"]), atol=1e-5)


def test_bf16_heads_close_to_fp32():
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[:64]
    f32 = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    rcfg_bf = dataclasses.replace(rcfg, head_dtype="bfloat16")
    bf = R.render_rays(params, mcfg, rcfg_bf, state_r, rays, None, False)
    np.testing.assert_allclose(np.asarray(bf["rgb"]), np.asarray(f32["rgb"]),
                               atol=2e-2)


def test_head_term_frac1_matches_topk():
    """Two-phase head evaluation with fraction=1.0 is an exact additive
    splice: every ray runs pass B, so maps must equal the plain top-k render
    up to summation-order rounding (RenderConfig.head_term_first)."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    k = rcfg.n_samples // 2
    base = dataclasses.replace(rcfg, head_topk=k)
    ht = dataclasses.replace(base, head_term_first=6, head_term_fraction=1.0)
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    b = R.render_rays(params, mcfg, ht, state_r, rays, None, False)
    for key in ("rgb", "semantics", "instances", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(b[key]), np.asarray(a[key]),
                                   atol=1e-5, err_msg=key)


def test_head_term_frac1_matches_topk_semins_budget():
    """The k2 (head_topk_semins) budget must splice exactly too, in both
    regimes: kA < k2 (pass B re-runs sem/ins) and kA >= k2 (sem/ins fully
    covered by pass A)."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    k = rcfg.n_samples // 2
    base = dataclasses.replace(rcfg, head_topk=k, head_topk_semins=8)
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    for kA in (4, 12):  # straddle k2=8
        ht = dataclasses.replace(base, head_term_first=kA,
                                 head_term_fraction=1.0)
        b = R.render_rays(params, mcfg, ht, state_r, rays, None, False)
        for key in ("rgb", "semantics", "instances"):
            np.testing.assert_allclose(
                np.asarray(b[key]), np.asarray(a[key]), atol=1e-5,
                err_msg=f"kA={kA} {key}")


def test_head_term_partial_fraction_contract():
    """With a partial survivor fraction the maps stay within the head_tail
    contract on a surface-peaked trained field: non-survivor rays only drop
    samples whose weight the threshold mask would zero anyway."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    k = rcfg.n_samples // 2
    base = dataclasses.replace(rcfg, head_topk=k)
    ht = dataclasses.replace(base, head_term_first=k // 2,
                             head_term_fraction=0.5)
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    b = R.render_rays(params, mcfg, ht, state_r, rays, None, False)
    tail = float(b["head_tail"])
    # head_tail IS the max dropped weight mass over non-survivors; per-channel
    # map error is bounded by that mass times the head output range ([0,1]
    # for rgb; instances are tanh-bounded embeddings here)
    bound = max(2e-3, tail)
    for key in ("rgb", "instances"):
        np.testing.assert_allclose(np.asarray(b[key]), np.asarray(a[key]),
                                   atol=bound, err_msg=key)


def test_head_term_requires_topk():
    import pytest
    from contrastive_lift_tpu.renderer.render import RenderConfig
    rcfg = RenderConfig(n_samples=64, num_semantic_classes=5,
                        dim_feature_instance=6)
    with pytest.raises(ValueError):
        dataclasses.replace(rcfg, head_term_first=8)


def _map_err(a, b, key):
    return float(np.max(np.abs(np.asarray(a[key]) - np.asarray(b[key]))))


def test_tail_complete_reduces_truncation_error():
    """head_tail_complete renormalizes rgb/instance maps by the exact
    above-threshold mass an aggressive top-k cut dropped; on a field with
    diffuse weights the residual error must shrink substantially (the tail
    samples share the kept samples' surface, so crediting them with the
    kept weighted-mean value removes the first-order truncation term)."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::7][:128]
    dense = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    cut = dataclasses.replace(rcfg, head_topk=8)
    plain = R.render_rays(params, mcfg, cut, state_r, rays, None, False)
    comp = R.render_rays(params, mcfg,
                         dataclasses.replace(cut, head_tail_complete=True),
                         state_r, rays, None, False)
    for key in ("rgb", "instances"):
        e_plain = _map_err(plain, dense, key)
        e_comp = _map_err(comp, dense, key)
        # the cut must actually truncate (otherwise the test proves nothing)
        assert e_plain > 5e-3, (key, e_plain)
        assert e_comp < 0.5 * e_plain, (key, e_plain, e_comp)
    # semantics are deliberately NOT completed (argmax/softmax postprocess is
    # scale-invariant): maps must be bit-identical between the two renders
    np.testing.assert_array_equal(np.asarray(comp["semantics"]),
                                  np.asarray(plain["semantics"]))


def test_tail_complete_noop_when_topk_covers():
    """When k covers every above-threshold sample the kept mass equals the
    full masked mass and the completion ratio is 1 — identical maps up to
    summation-order rounding."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    cover = dataclasses.replace(rcfg, head_topk=rcfg.n_samples // 2)
    plain = R.render_rays(params, mcfg, cover, state_r, rays, None, False)
    comp = R.render_rays(params, mcfg,
                         dataclasses.replace(cover, head_tail_complete=True),
                         state_r, rays, None, False)
    for key in ("rgb", "instances"):
        np.testing.assert_allclose(np.asarray(comp[key]),
                                   np.asarray(plain[key]), atol=2e-5,
                                   err_msg=key)


def test_tail_complete_head_term_frac1_matches_topk():
    """Completion composes with the two-phase head splice: at fraction=1.0
    the spliced kept mass equals the plain top-k kept mass, so the completed
    maps must agree across the two code paths."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    base = dataclasses.replace(rcfg, head_topk=12, head_tail_complete=True)
    ht = dataclasses.replace(base, head_term_first=6, head_term_fraction=1.0)
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    b = R.render_rays(params, mcfg, ht, state_r, rays, None, False)
    for key in ("rgb", "instances"):
        np.testing.assert_allclose(np.asarray(b[key]), np.asarray(a[key]),
                                   atol=3e-5, err_msg=key)


def test_rank_select_matches_topk_when_covering():
    """Rank-select head compaction (nearest-k above threshold, no sort) keeps
    the IDENTICAL sample set as top-k whenever <= k samples clear the
    threshold, so with a covering k the maps must agree with both the top-k
    path and the dense render; its head_tail (dropped above-threshold mass)
    must be exactly 0 in that regime."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::7][:128]
    k = rcfg.n_samples // 2
    topk = R.render_rays(params, mcfg,
                         dataclasses.replace(rcfg, head_topk=k),
                         state_r, rays, None, False)
    rank = R.render_rays(params, mcfg,
                         dataclasses.replace(rcfg, head_topk=k,
                                             head_select="rank"),
                         state_r, rays, None, False)
    for key in ("rgb", "semantics", "instances", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(rank[key]),
                                   np.asarray(topk[key]), atol=2e-5,
                                   err_msg=key)
    assert float(rank["head_tail"]) == 0.0  # no above-threshold mass dropped


def test_rank_select_completion_bounds_aggressive_k():
    """At an under-covering k the two selections keep different sets (top-k
    the heaviest, rank-select the nearest); tail completion renormalizes the
    dropped mass either way, so the completed rank-select render must stay
    close to dense — the same contract the k=8 production point passes on
    the PQ gate."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::7][:128]
    dense = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    cut = dataclasses.replace(rcfg, head_topk=8, head_select="rank")
    plain = R.render_rays(params, mcfg, cut, state_r, rays, None, False)
    comp = R.render_rays(params, mcfg,
                         dataclasses.replace(cut, head_tail_complete=True),
                         state_r, rays, None, False)
    for key in ("rgb", "instances"):
        e_plain = _map_err(plain, dense, key)
        e_comp = _map_err(comp, dense, key)
        assert e_plain > 5e-3, (key, e_plain)       # the cut must truncate
        assert e_comp < 0.6 * e_plain, (key, e_plain, e_comp)
    # head_tail reports the dropped above-threshold mass (> 0 here)
    assert float(plain["head_tail"]) > 1e-3


def test_rank_select_head_term_frac1_matches():
    """The two-phase head splice composes with rank-select ordering: at
    fraction=1.0 every ray runs pass B, so maps equal the plain rank-select
    render up to summation-order rounding (the kA prefix is now the nearest
    kA above-threshold samples rather than the heaviest)."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    k = rcfg.n_samples // 2
    base = dataclasses.replace(rcfg, head_topk=k, head_select="rank")
    ht = dataclasses.replace(base, head_term_first=6, head_term_fraction=1.0)
    a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
    b = R.render_rays(params, mcfg, ht, state_r, rays, None, False)
    for key in ("rgb", "semantics", "instances", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(b[key]), np.asarray(a[key]),
                                   atol=1e-5, err_msg=key)


def test_rank_select_argmax_mode_falls_back_to_topk():
    """semantic_weight_mode='argmax' needs the globally heaviest sample in
    the kept set (one-hot pick), so rank-select must fall back to the top_k
    sort — byte-identical maps with the flag on and off."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    am = dataclasses.replace(rcfg, semantic_weight_mode="argmax",
                             head_topk=12)
    a = R.render_rays(params, mcfg, am, state_r, rays, None, False)
    b = R.render_rays(params, mcfg,
                      dataclasses.replace(am, head_select="rank"),
                      state_r, rays, None, False)
    for key in ("rgb", "semantics", "instances"):
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]), err_msg=key)


def test_aux_topk_rank_select_identical_set_when_covering():
    """_aux_topk under rank-select keeps the same sample set as the top_k
    sort whenever per-ray above-threshold counts fit in k (the regime the
    Trainer auto-calibration maintains): masked composites must match and
    the overflow guardrail is selection-independent."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    Rr, S, k = 32, 48, 12
    w = rng.uniform(0.0, 5e-5, (Rr, S)).astype(np.float32)  # sub-threshold
    # implant <= k above-threshold samples per ray at random positions
    for i in range(Rr):
        pos = rng.choice(S, size=rng.integers(1, k + 1), replace=False)
        w[i, pos] = rng.uniform(1e-3, 0.5, len(pos))
    xyz = rng.normal(size=(Rr, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(0, 1, (Rr, S)).astype(np.float32), axis=1)
    base = R.RenderConfig(n_samples=S, num_semantic_classes=5,
                          dim_feature_instance=6, head_topk=k)
    vals = {}
    for mode in ("sort", "iter", "rank"):
        rcfg_m = dataclasses.replace(base, head_select=mode)
        w_k, xyz_k, z_k, tail = R._aux_topk(rcfg_m, jnp.asarray(w),
                                            jnp.asarray(xyz), jnp.asarray(z))
        assert float(tail) == 0.0
        m = np.asarray(w_k) > base.raymarch_weight_thres
        # masked composite of an arbitrary value function of xyz
        v = np.tanh(np.asarray(xyz_k).sum(-1))
        vals[mode] = (np.asarray(w_k) * m * v).sum(1)
    np.testing.assert_allclose(vals["rank"], vals["sort"], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_array_equal(vals["iter"], vals["sort"])


def test_rank_select_calibration_runs_and_budgets_sane():
    """calibrate_budgets(head_term=True) under rank-select must mirror the
    time-ordered selection when sizing the kA split (a heavy far sample
    lands in the rank-select tail) and still return a valid operating
    point."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    from contrastive_lift_tpu.ops.fused_grid import build_render_grids
    import jax.numpy as jnp
    rc = dataclasses.replace(rcfg, head_topk=16, head_select="rank",
                             coarse_stride=8, max_segments=16, sub_stride=4,
                             max_subsegments=16)
    fused = build_render_grids(params, mcfg, rc, state_r, compact=True)
    probe = jnp.asarray(scene.val_frames[0].rays[::11][:64])
    out = R.calibrate_budgets(mcfg, rc, state_r, probe, fused,
                              termination=True, head_term=True)
    assert out.max_segments >= 8 and out.max_subsegments >= 8
    assert 0 <= out.head_term_first < 16


def test_iter_select_matches_sort_exactly():
    """head_select='iter' (k argmax+mask passes) is an exact implementation
    swap for lax.top_k — same kept set, descending order, and lowest-index
    tie-breaking — so every output map must be byte-identical to the sort
    path, composed with two-phase heads and tail completion alike."""
    scene, cfg, mcfg, params, rcfg, state_r = _trained_setup()
    rays = scene.val_frames[0].rays[::5][:96]
    for extra in ({}, {"head_term_first": 6, "head_term_fraction": 0.5,
                       "head_tail_complete": True}):
        base = dataclasses.replace(rcfg, head_topk=12, head_topk_semins=8,
                                   **extra)
        a = R.render_rays(params, mcfg, base, state_r, rays, None, False)
        b = R.render_rays(params, mcfg,
                          dataclasses.replace(base, head_select="iter"),
                          state_r, rays, None, False)
        for key in ("rgb", "semantics", "instances", "depth", "opacity",
                    "head_tail"):
            np.testing.assert_array_equal(np.asarray(a[key]),
                                          np.asarray(b[key]),
                                          err_msg=f"{key} {extra}")
