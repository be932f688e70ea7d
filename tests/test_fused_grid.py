"""Fused dense-grid sampling must match the direct VM path exactly."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.models import tensorf as tf
from contrastive_lift_tpu.ops import fused_grid as fg
from contrastive_lift_tpu.renderer import render as R


def _setup(use_grid_branches=False):
    cfg = Config(min_grid_dim=14, max_instances=3,
                 instance_loss_mode="slow_fast",
                 use_mlp_for_semantics=not use_grid_branches,
                 use_mlp_for_instances=not use_grid_branches, seed=0)
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(14, 14, 14))
    return cfg, mcfg, params, rcfg, state_r


def test_fused_density_matches_vm():
    cfg, mcfg, params, rcfg, state_r = _setup()
    fused = fg.build_fused_grids(params, mcfg)
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (500, 3)),
                      jnp.float32)
    direct = tf.compute_density_raw(params, mcfg, xyz)
    ours = fg.sample_density_fused(fused, xyz, mcfg.splus_density_shift)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_fused_feature_matches_vm():
    cfg, mcfg, params, rcfg, state_r = _setup()
    fused = fg.build_fused_grids(params, mcfg)
    assert "appearance" in fused.features
    xyz = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (300, 3)),
                      jnp.float32)
    direct = tf._branch_feature(params, "appearance", xyz)
    ours = fg.sample_feature_fused(fused, "appearance", xyz)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_fused_render_matches_direct():
    cfg, mcfg, params, rcfg, state_r = _setup()
    fused = fg.build_fused_grids(params, mcfg)
    rng = np.random.default_rng(2)
    o = rng.uniform(-0.2, 0.2, (64, 3))
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((64, 1), 0.01), np.full((64, 1), 1.2)], -1), jnp.float32)
    direct = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False)
    with_fused = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                               fused=fused)
    for key in ("rgb", "semantics", "instances", "depth"):
        np.testing.assert_allclose(np.asarray(with_fused[key]),
                                   np.asarray(direct[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)


def test_fused_grid_branches_match():
    """Grid-based semantic/instance branches also densify exactly."""
    cfg, mcfg, params, rcfg, state_r = _setup(use_grid_branches=True)
    fused = fg.build_fused_grids(params, mcfg)
    assert set(fused.features) >= {"appearance", "semantic", "instance"}
    xyz = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (200, 3)),
                      jnp.float32)
    for name in ("semantic", "instance"):
        direct = tf._branch_feature(params, name, xyz)
        ours = fg.sample_feature_fused(fused, name, xyz)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(direct),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_gradients_flow_to_factors():
    """Training through the fused path updates the VM factors."""
    cfg, mcfg, params, rcfg, state_r = _setup()
    fused_fn = lambda p: fg.build_fused_grids(p, mcfg)
    xyz = jnp.asarray(np.random.default_rng(4).uniform(-0.5, 0.5, (100, 3)),
                      jnp.float32)

    def loss(p):
        fused = fused_fn(p)
        sig = fg.sample_density_fused(fused, xyz, mcfg.splus_density_shift)
        return jnp.sum(sig ** 2)

    grads = jax.grad(loss)(params)
    gnorm = float(jnp.abs(grads["density"]["planes"][0]).max())
    assert gnorm > 0.0
