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
