"""End-to-end training smoke tests on the synthetic sphere scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import (InstanceBundleSampler,
                                            RayPoolSampler,
                                            SegmentBundleSampler)
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.train.schedule import lr_scale_for_epoch
from contrastive_lift_tpu.train.state import init_train_state, ema_update_slow
from contrastive_lift_tpu.train.step import (TrainGates, gates_for_epoch,
                                             make_train_step)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(num_spheres=4, num_train=6, num_val=2,
                                image_dim=(24, 32), seed=0)


@pytest.fixture(scope="module")
def small_cfg():
    return Config(
        batch_size=256, chunk=256, min_grid_dim=24, max_grid_dim=32,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        max_rays_instances=128, max_labels_per_image=16,
        batch_size_segments=4, max_rays_segments=64,
        lambda_dist_reg=0.001, seed=0, lr=2e-3,
    ).resolve_epochs()


def _setup(cfg, scene):
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds,
        (cfg.min_grid_dim,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    return mcfg, params, rcfg, state_r, weights


def test_schedule():
    assert lr_scale_for_epoch(0, [9, 10], 0.5) == 1.0
    assert lr_scale_for_epoch(9, [9, 10], 0.5) == 0.5
    assert lr_scale_for_epoch(10, [9, 10], 0.5) == 0.25


def test_gates_follow_reference_epochs(small_cfg):
    g0 = gates_for_epoch(small_cfg, 0)
    assert not g0.semantics_on and not g0.instances_on
    g_late = gates_for_epoch(small_cfg, small_cfg.instance_optimization_epoch)
    assert g_late.instances_on and g_late.semantics_on


def test_rgb_phase_loss_decreases(small_cfg, scene):
    cfg = small_cfg
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    gates = TrainGates(semantics_on=False, instances_on=False)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    nrng = np.random.default_rng(0)
    losses = []
    for i in range(40):
        batch = sampler.sample(nrng, cfg.batch_size)
        state, metrics = step(state, state_r, batch, None, None,
                              jax.random.PRNGKey(i), 1.0, 0.0)
        losses.append(float(metrics["loss_rgb"]))
    assert np.isfinite(losses).all()
    # medians: the random white-bg compositing coin makes per-batch loss bimodal
    # early in training (faithful to the reference, renderer :164-165)
    assert np.median(losses[-10:]) < 0.5 * np.median(losses[:10]), losses


def test_full_step_with_all_phases(small_cfg, scene):
    cfg = small_cfg
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    state = init_train_state(cfg, params)
    main_s = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    inst_s = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                                   cfg.max_labels_per_image)
    seg_s = SegmentBundleSampler(scene.train_frames, cfg.max_rays_segments)
    nrng = np.random.default_rng(1)
    # warm up density first — with an empty field every sample is below
    # raymarch_weight_thres and the instance/segment heads see zero weight
    # (the reference gates these phases to later epochs for the same reason)
    warm = make_train_step(cfg, mcfg, rcfg,
                           TrainGates(semantics_on=False), weights, params)
    for i in range(15):
        state, _ = warm(state, state_r, main_s.sample(nrng, cfg.batch_size),
                        None, None, jax.random.PRNGKey(1000 + i), 1.0, 0.0)
    gates = TrainGates(semantics_on=True, instances_on=True, segments_on=True)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    slow_before = np.array(state.params["instance_mlp"]["slow"]["layers"][0]["w"])
    fast_before = np.array(state.params["instance_mlp"]["fast"]["layers"][0]["w"])
    density_before = np.array(state.params["density"]["planes"][0])
    for i in range(3):
        bm = main_s.sample(nrng, cfg.batch_size)
        bi = inst_s.sample(nrng, cfg.batch_size_contrastive)
        bs = seg_s.sample(nrng, cfg.batch_size_segments)
        state, metrics = step(state, state_r, bm, bi, bs,
                              jax.random.PRNGKey(100 + i), 1.0, 0.001)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # DINO-style: the slow net moved by EMA even though the optimizer skips it
    slow_after = np.array(state.params["instance_mlp"]["slow"]["layers"][0]["w"])
    fast_after = np.array(state.params["instance_mlp"]["fast"]["layers"][0]["w"])
    assert not np.allclose(slow_before, slow_after)
    assert not np.allclose(fast_before, fast_after)
    # density grid updated by main phase
    assert not np.allclose(density_before,
                           np.asarray(state.params["density"]["planes"][0]))


def test_ema_update_math():
    params = {"instance_mlp": {
        "fast": {"layers": [{"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}]},
        "slow": {"layers": [{"w": jnp.zeros((2, 2)), "b": jnp.zeros(2)}]},
    }}
    out = ema_update_slow(params, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["instance_mlp"]["slow"]["layers"][0]["w"]),
                               0.1 * np.ones((2, 2)), rtol=1e-6)


def test_per_image_ema_dynamics(small_cfg, scene):
    """With batch_size_contrastive=I the slow net must receive I EMA updates
    per step (reference runs ema_update_slownet once per image inside the
    per-image loop, train_panopli_tensorf.py:213-218,258-259). Since fast is
    constant during the loop, slow_after == 0.9^I slow_0 + (1-0.9^I) fast_0."""
    cfg = small_cfg
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    state = init_train_state(cfg, params)
    main_s = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    inst_s = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                                   cfg.max_labels_per_image)
    gates = TrainGates(semantics_on=True, instances_on=True)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    nrng = np.random.default_rng(5)
    num_images = 3
    slow0 = np.array(state.params["instance_mlp"]["slow"]["layers"][0]["w"])
    fast0 = np.array(state.params["instance_mlp"]["fast"]["layers"][0]["w"])
    state, _ = step(state, state_r, main_s.sample(nrng, cfg.batch_size),
                    inst_s.sample(nrng, num_images), None,
                    jax.random.PRNGKey(0), 1.0, 0.0)
    slow_after = np.array(state.params["instance_mlp"]["slow"]["layers"][0]["w"])
    m = 0.9 ** num_images
    np.testing.assert_allclose(slow_after, m * slow0 + (1 - m) * fast0,
                               rtol=1e-5, atol=1e-7)


def test_linear_assignment_mode_runs(scene):
    cfg = Config(batch_size=128, min_grid_dim=24, max_instances=8,
                 instance_loss_mode="linear_assignment",
                 max_rays_instances=64, max_labels_per_image=8, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    state = init_train_state(cfg, params)
    main_s = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    inst_s = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                                   cfg.max_labels_per_image)
    gates = TrainGates(semantics_on=True, instances_on=True)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    nrng = np.random.default_rng(2)
    state, metrics = step(state, state_r, main_s.sample(nrng, cfg.batch_size),
                          inst_s.sample(nrng, 1), None,
                          jax.random.PRNGKey(0), 1.0, 0.0)
    assert np.isfinite(float(metrics["loss_clustering"]))


def test_aux_topk_auto_exact_and_guardrail(small_cfg, scene):
    """Auto-calibrated aux head top-k (Config.head_topk_train_auto): with k
    covering every above-threshold sample the aux losses are EXACTLY the
    dense ones (the reference masks heads below raymarch_weight_thres,
    panopli_tensoRF_renderer.py:103) and aux_head_tail == 0; an undersized k
    raises the guardrail."""
    from contrastive_lift_tpu.renderer import render as R
    from contrastive_lift_tpu.train.step import _aux_density_grids, _aux_rcfg

    cfg = small_cfg
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    state = init_train_state(cfg, params)
    main_s = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    inst_s = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                                   cfg.max_labels_per_image)
    seg_s = SegmentBundleSampler(scene.train_frames, cfg.max_rays_segments)
    nrng = np.random.default_rng(3)
    warm = make_train_step(cfg, mcfg, rcfg,
                           TrainGates(semantics_on=False), weights, params)
    for i in range(15):
        state, _ = warm(state, state_r, main_s.sample(nrng, cfg.batch_size),
                        None, None, jax.random.PRNGKey(2000 + i), 1.0, 0.0)

    bm = main_s.sample(nrng, cfg.batch_size)
    bi = inst_s.sample(nrng, cfg.batch_size_contrastive)
    bs = seg_s.sample(nrng, cfg.batch_size_segments)

    # covering k measured on the actual aux AND main rays (no-perturb
    # weights) — the calibrated k now compacts the main-phase heads too
    rcfg_aux = _aux_rcfg(cfg, rcfg)
    fused = _aux_density_grids(state.params, cfg)
    all_rays = jnp.concatenate([jnp.asarray(bi["rays"]).reshape(-1, 8),
                                jnp.asarray(bs["rays"]).reshape(-1, 8),
                                jnp.asarray(bm["rays"]).reshape(-1, 8)])
    w = R.aux_density_weights(state.params, mcfg, rcfg_aux, state_r,
                              all_rays, None, False, fused)[2]
    w_main = R.aux_density_weights(state.params, mcfg, rcfg, state_r,
                                   jnp.asarray(bm["rays"]), None, False,
                                   None)[2]
    cnt = int(max(jnp.max(jnp.sum(w > rcfg_aux.raymarch_weight_thres, -1)),
                  jnp.max(jnp.sum(w_main > rcfg.raymarch_weight_thres, -1))))
    k_cover = cnt + 8

    gates = TrainGates(semantics_on=True, instances_on=True, segments_on=True)
    args = (state, state_r, bm, bi, bs, jax.random.PRNGKey(777), 1.0, 0.001)
    dense = make_train_step(cfg, mcfg, rcfg, gates, weights, params,
                            donate=False)
    compact = make_train_step(cfg, mcfg, rcfg, gates, weights, params,
                              donate=False, aux_head_topk=k_cover)
    _, m_d = dense(*args)
    _, m_c = compact(*args)
    assert float(m_c["aux_head_tail"]) == 0.0
    # main-phase compaction guardrail: the k-th kept weight sits below the
    # head mask threshold, so the main losses are the dense ones exactly
    assert float(m_c["main_head_tail"]) <= rcfg.raymarch_weight_thres
    np.testing.assert_allclose(float(m_c["loss_main"]),
                               float(m_d["loss_main"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_c["loss_segment"]),
                               float(m_d["loss_segment"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_c["loss_clustering"]),
                               float(m_d["loss_clustering"]), rtol=1e-5)

    tiny = make_train_step(cfg, mcfg, rcfg, gates, weights, params,
                           donate=False, aux_head_topk=max(1, cnt // 4))
    _, m_t = tiny(*args)
    assert float(m_t["aux_head_tail"]) > 0.0


def test_fused_main_density_gradients_match_direct(small_cfg, scene):
    """Config.fused_main_density routes the main phase through the
    differentiable densified grid — mathematically the SAME function as
    direct VM sampling (trilinear separability), so the phase loss and the
    full parameter gradient tree must match."""
    import dataclasses

    from contrastive_lift_tpu.data.base import RayPoolSampler
    from contrastive_lift_tpu.train.step import main_phase_loss

    cfg = small_cfg
    mcfg, params, rcfg, state_r, weights = _setup(cfg, scene)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    batch = sampler.sample(np.random.default_rng(5), 128)
    gates = TrainGates(semantics_on=True)
    key = jax.random.PRNGKey(3)

    def loss_for(cfg_v):
        def f(p):
            return main_phase_loss(p, cfg_v, mcfg, rcfg, state_r, gates,
                                   batch, key, 0.001, weights)[0]
        return f

    l_d, g_d = jax.value_and_grad(loss_for(cfg))(params)
    cfg_f = dataclasses.replace(cfg, fused_main_density=True)
    l_f, g_f = jax.value_and_grad(loss_for(cfg_f))(params)
    np.testing.assert_allclose(float(l_f), float(l_d), rtol=1e-5)
    flat_d = jax.tree.leaves(g_d)
    flat_f = jax.tree.leaves(g_f)
    assert len(flat_d) == len(flat_f)
    for a, b in zip(flat_d, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_auto_topk_calibration_contract(tmp_path):
    """Trainer._calibrate_aux_topk honors its documented contract
    (config.py head_topk_train_auto): None before the instance/segment
    gates open and on an empty probe field; a finite bucketed k on a carved
    field; no draws from the TRAINING rng (batch stream identical with the
    feature on/off); jitted probe cached per stage."""
    import copy

    from contrastive_lift_tpu.train.loop import Trainer

    sc = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                              image_dim=(16, 16), seed=0)
    cfg = Config(
        batch_size=128, chunk=128, min_grid_dim=16, max_grid_dim=16,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        batch_size_contrastive=4, max_rays_instances=32,
        max_labels_per_image=8, batch_size_segments=4, max_rays_segments=16,
        seed=0, late_semantic_optimization=0, instance_optimization_epoch=2,
        segment_optimization_epoch=2, bbox_aabb_reset_epochs=[],
        grid_upscale_epochs=[], sanity_steps=0, save_every_n_train_steps=0,
    ).resolve_epochs()
    t = Trainer(cfg, sc, tmp_path / "cal", log_every=1)

    rng_before = copy.deepcopy(t.rng.bit_generator.state)
    # gates off (epoch 0): dense, no probe
    assert t._calibrate_aux_topk(gates_for_epoch(cfg, 0), 0) is None
    # gates on, but the init field is empty (softplus shift -10): cnt == 0
    gates2 = gates_for_epoch(cfg, 2)
    assert gates2.instances_on
    assert t._calibrate_aux_topk(gates2, 2) is None
    assert t.rng.bit_generator.state == rng_before  # training stream intact

    # carve a slab into the density field -> small finite k
    params = jax.tree.map(lambda x: x, t.state.params)
    planes = list(params["density"]["planes"])
    lines = list(params["density"]["lines"])
    p0 = np.zeros_like(np.asarray(planes[0]))
    p0[0, :, 7:9] = 30.0
    l0 = np.zeros_like(np.asarray(lines[0]))
    l0[0, :] = 1.0
    planes[0] = jnp.asarray(p0)
    lines[0] = jnp.asarray(l0)
    for i in (1, 2):
        planes[i] = jnp.zeros_like(planes[i])
        lines[i] = jnp.zeros_like(lines[i])
    params["density"] = {"planes": tuple(planes), "lines": tuple(lines)}
    t.state = t.state._replace(params=params)
    k = t._calibrate_aux_topk(gates2, 2)
    assert k is not None and k % 16 == 0 and k >= 16
    fn_first = t._count_fn
    t._calibrate_aux_topk(gates2, 3)  # same stage -> cached jit reused
    assert t._count_fn is fn_first
    assert t.rng.bit_generator.state == rng_before


def test_aux_passes_honor_bf16_head_dtype(small_cfg, scene):
    """The stop-grad aux passes (segment/instance) run their MLPs in
    head_dtype (Config.precision) with an fp32 composite — bf16 output must
    track fp32 within mixed-precision tolerance and actually compute in
    bf16 (the phase is MLP-bound on TPU; VERDICT r4 #6)."""
    import dataclasses

    from contrastive_lift_tpu.renderer import render as R

    cfg = small_cfg
    mcfg, params, rcfg, state_r, _ = _setup(cfg, scene)
    # carve a non-trivial field: a random-init density renders empty maps
    # (constant after the log-softmax postprocess), which would make the
    # bf16-vs-f32 comparison vacuously equal
    params = dict(params)
    params["density"] = jax.tree.map(lambda x: jnp.abs(x) * 40.0,
                                     params["density"])
    rng = np.random.default_rng(0)
    seg = SegmentBundleSampler(scene.train_frames, cfg.max_rays_segments)
    batch = seg.sample(rng, cfg.batch_size_segments)
    rays = jnp.asarray(batch["rays"][:64])

    out_f32 = R.render_segment_features(params, mcfg, rcfg, state_r, rays,
                                        is_train=False)
    rcfg_bf = dataclasses.replace(rcfg, head_dtype="bfloat16")
    out_bf = R.render_segment_features(params, mcfg, rcfg_bf, state_r, rays,
                                       is_train=False)
    assert out_bf.dtype == jnp.float32  # fp32 loss reduction preserved
    assert not np.allclose(np.asarray(out_f32), np.asarray(out_bf))  # bf16 ran
    np.testing.assert_allclose(np.asarray(out_f32), np.asarray(out_bf),
                               atol=3e-2)

    inst_f32, _ = R.render_instance_features(params, mcfg, rcfg, state_r,
                                             rays, is_train=False)
    inst_bf, _ = R.render_instance_features(params, mcfg, rcfg_bf, state_r,
                                            rays, is_train=False)
    assert inst_bf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(inst_f32), np.asarray(inst_bf),
                               atol=3e-2)
