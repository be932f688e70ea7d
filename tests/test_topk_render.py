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
