"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from contrastive_lift_tpu.parallel import mesh as pmesh


def test_mesh_and_batch_sharding():
    mesh = pmesh.make_mesh(8)
    assert mesh.devices.size == 8
    batch = {"rays": np.zeros((64, 8), np.float32)}
    sharded = pmesh.shard_main_batch(mesh, batch)
    shards = sharded["rays"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (8, 8)


def test_pad_batch_to_multiple():
    batch = {"x": np.ones((13, 4)), "y": np.ones(13)}
    out = pmesh.pad_batch_to_multiple(batch, 8)
    assert out["x"].shape == (16, 4)
    assert out["y"].shape == (16,)


def test_dryrun_multichip_full_train_step():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out["rgb"].shape == (2048, 3)
    assert out["instances"].shape == (2048, 6)  # 2*max_instances slow-fast


def _make_trainer(tmp_path, n_shards, tag):
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.train.loop import Trainer

    scene = make_synthetic_scene(num_spheres=3, num_train=8, num_val=1,
                                 image_dim=(16, 16), seed=0)
    cfg = Config(
        batch_size=256, chunk=256, min_grid_dim=16, max_grid_dim=16,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        batch_size_contrastive=8, max_rays_instances=64, max_labels_per_image=8,
        batch_size_segments=8, max_rays_segments=32, seed=0,
        n_data_shards=n_shards, late_semantic_optimization=0,
        instance_optimization_epoch=0, segment_optimization_epoch=0,
        bbox_aabb_reset_epochs=[], grid_upscale_epochs=[],
        sanity_steps=0, save_every_n_train_steps=0, lambda_dist_reg=0.0,
    ).resolve_epochs()
    return Trainer(cfg, scene, tmp_path / tag, log_every=1), scene


def test_trainer_mesh_losses_match_single_device(tmp_path, capsys):
    """The production Trainer on the 8-device mesh must produce step-for-step
    the same losses as single-device (same seed, same host sampling) — the
    DDP-equivalence check at the Trainer level (VERDICT r1 next #2)."""
    t1, _ = _make_trainer(tmp_path, 1, "single")
    t8, _ = _make_trainer(tmp_path, 8, "mesh")
    assert t1.mesh is None and t8.mesh is not None and t8.mesh.size == 8

    t1.on_epoch_start(0)
    t8.on_epoch_start(0)
    import jax as _jax
    for i in range(3):
        # identical host-side sampling: same rng state in both trainers
        b_main = t1.main_sampler.sample(t1.rng, t1.cfg.batch_size)
        b_inst = t1.inst_sampler.sample(t1.rng, t1.cfg.batch_size_contrastive)
        b_seg = t1.seg_sampler.sample(t1.rng, t1.cfg.batch_size_segments)
        key = _jax.random.PRNGKey(i)
        t1.state, m1 = t1._step_fn(t1.state, t1.state_r, b_main, b_inst,
                                   b_seg, key, 1.0, 0.0)
        t8.state, m8 = t8._step_fn(
            t8.state, t8.state_r, t8._shard_batch(b_main),
            t8._shard_batch(b_inst), t8._shard_batch(b_seg), key, 1.0, 0.0)
        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m8[k]), rtol=2e-3, atol=1e-5,
                err_msg=f"step {i} metric {k} diverged between 1- and 8-device")


def test_sharded_render_matches_single_device():
    """Data-parallel render == single-device render (the DDP-equivalence test)."""
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.renderer import render as R

    cfg = Config(min_grid_dim=12, max_instances=3,
                 instance_loss_mode="slow_fast", seed=0)
    mcfg, params, rcfg, state_r = build_model(cfg, 4, grid_dim=(12,) * 3)
    rng = np.random.default_rng(0)
    rays = np.concatenate([
        rng.uniform(-0.2, 0.2, (64, 3)), rng.normal(size=(64, 3)),
        np.full((64, 1), 0.01), np.full((64, 1), 1.2)], -1).astype(np.float32)
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)

    fn = lambda p, r: R.render_rays(p, mcfg, rcfg, state_r, r, None, False)
    single = jax.jit(fn)(params, rays)

    mesh = pmesh.make_mesh(8)
    with mesh:
        params_r = pmesh.replicate_tree(mesh, params)
        rays_s = jax.device_put(rays, pmesh.batch_sharding(mesh))
        multi = jax.jit(fn)(params_r, rays_s)
    np.testing.assert_allclose(np.asarray(single["rgb"]),
                               np.asarray(multi["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(single["instances"]),
                               np.asarray(multi["instances"]), atol=1e-5)

def test_sharded_fused_render_matches_single_device():
    """The PRODUCTION inference fast path (brick-atlas density, bit-packed
    grouped occupancy, calibrated budgets, two-phase termination) under the
    8-device mesh == single device. Guards the cross-ray argsort/take in the
    termination and bucketing paths against sharding regressions before the
    modes are adopted as defaults (inference/render.py passes mesh-sharded
    chunks through this exact jit)."""
    import dataclasses

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.ops import fused_grid as fg
    from contrastive_lift_tpu.renderer import render as R

    cfg = Config(min_grid_dim=33, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(33, 33, 33))

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

    rng = np.random.default_rng(3)
    o = rng.uniform(-0.15, 0.15, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((64, 1), 0.01, np.float32),
                           np.full((64, 1), 1.5, np.float32)], axis=-1)

    S = rcfg.n_samples
    base = dataclasses.replace(rcfg, coarse_stride=8, sub_stride=4,
                               max_segments=-(-S // 8),
                               max_subsegments=-(-S // 4), head_topk=16,
                               head_topk_semins=8)
    base = R.occ_grouping_for(base, state_r)
    cal = R.calibrate_budgets(mcfg, base, state_r, jnp.asarray(rays), fused,
                              termination=True)
    assert cal.term_first > 0  # termination actually engaged

    fn = lambda p, f, r: R.render_rays(p, mcfg, cal, state_r, r, None, False,
                                       fused=f)
    single = jax.jit(fn)(params, fused, rays)

    mesh = pmesh.make_mesh(8)
    with mesh:
        params_r = pmesh.replicate_tree(mesh, params)
        fused_r = pmesh.replicate_tree(mesh, fused)
        rays_s = jax.device_put(rays, pmesh.batch_sharding(mesh))
        multi = jax.jit(fn)(params_r, fused_r, rays_s)
    for k in ("rgb", "depth", "semantics", "instances", "opacity"):
        np.testing.assert_allclose(np.asarray(single[k]),
                                   np.asarray(multi[k]), atol=1e-5,
                                   err_msg=k)


def test_grouped_dispatch_sharded_matches_single_device():
    """render_frames with BOTH the 8-device mesh and grouped dispatch must
    match the single-device per-chunk path: lax.map iterates the replicated
    group axis while each body step runs the same ray-sharded program
    (parallel/mesh.py::group_batch_sharding)."""
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.inference.render import render_frames

    scene = make_synthetic_scene(num_spheres=2, num_train=1, num_val=1,
                                 image_dim=(16, 16), seed=1)
    cfg = Config(min_grid_dim=17, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (17, 17, 17))

    frames = scene.val_frames  # 256 rays -> 4 chunks of 64
    ref = render_frames(params, mcfg, rcfg, state_r, frames, chunk=64,
                        dispatch_group=1)
    mesh = pmesh.make_mesh(8)
    grp = render_frames(params, mcfg, rcfg, state_r, frames, chunk=64,
                        mesh=mesh, dispatch_group=3)
    for a, b in zip(ref, grp):
        for k in ("rgb", "semantics", "instances", "depth"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-5, err_msg=k)


def test_production_point_sharded_grouped_matches_single_device():
    """VERDICT r3 #8: the recorded single-chip fast path must be provably
    mesh-safe at the PRODUCTION operating point — build_render_grids compact
    bf16 tables + bit-packed grouped occupancy, stride-16/8 three-level ESS,
    calibrated budgets (incl. heavy/light bucketing), head_topk=24/12 — under
    BOTH the 8-device mesh and grouped dispatch, vs the single-device
    per-chunk render. Mirrors bench.py / inference.render_frames exactly
    (reference DDP analog: trainer/__init__.py:93-108)."""
    import dataclasses

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.inference.render import (_jitted_render,
                                                       _jitted_render_group)
    from contrastive_lift_tpu.ops import fused_grid as fg
    from contrastive_lift_tpu.renderer import render as R

    grid = 49  # 48 cells -> 12 bricks/axis; production strides stay meaningful
    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 chunk=64, seed=0, precision="bf16").resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 7, step_ratio=0.25)
    rcfg = dataclasses.replace(rcfg, head_topk=24, head_topk_semins=12,
                               head_dtype="bfloat16")

    # the bench field's structure at test scale: two shells + floor disk
    lin = jnp.linspace(-1, 1, grid)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    th = 1.5 * 2.0 / grid
    surf = ((jnp.abs(r - 0.35) < th) | (jnp.abs(r - 0.65) < th)
            | ((Z < -0.9) & (jnp.sqrt(X**2 + Y**2) < 0.7)))
    dense = jnp.where(surf, 14.0, 0.0).astype(jnp.float32)

    fused = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.bfloat16,
                                  dense_override=dense)
    rng = np.random.default_rng(0)
    n_rays = 128
    o = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n_rays, 1), 0.01, np.float32),
                           np.full((n_rays, 1), 1.5, np.float32)], axis=-1)
    rcfg = R.occ_grouping_for(rcfg, state_r)
    rcfg = R.calibrate_budgets(mcfg, rcfg, state_r, jnp.asarray(rays[:64]),
                               fused)

    fn = _jitted_render(mcfg, rcfg)
    singles = [fn(params, fused, state_r, rays[i:i + 64]) for i in (0, 64)]

    mesh = pmesh.make_mesh(8)
    gfn = _jitted_render_group(mcfg, rcfg)
    arr = jax.device_put(rays.reshape(2, 64, -1),
                         pmesh.group_batch_sharding(mesh, "data"))
    multi = gfn(pmesh.replicate_tree(mesh, params),
                pmesh.replicate_tree(mesh, fused),
                pmesh.replicate_tree(mesh, state_r), arr)
    for k in ("rgb", "semantics", "instances", "depth", "opacity"):
        got = np.asarray(multi[k]).reshape((-1,) + np.asarray(multi[k]).shape[2:])
        want = np.concatenate([np.asarray(s[k]) for s in singles])
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=k)
