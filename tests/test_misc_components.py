"""Coverage tests: conditional TensoRF, NDC rays, dense sigma / cluster export."""
import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.models import tensorf as tf
from contrastive_lift_tpu.models.conditional import (ConditionalConfig,
                                                     compute_density_conditional,
                                                     init_conditional,
                                                     render_appearance_conditional)
from contrastive_lift_tpu.renderer import occupancy as occ
from contrastive_lift_tpu.utils import geometry as geo


def test_conditional_tensorf():
    base = tf.TensoRFConfig(num_semantic_classes=3, dim_feature_instance=6,
                            slow_fast_mode=True)
    ccfg = ConditionalConfig(base=base, latent_dim=8)
    params = init_conditional(jax.random.PRNGKey(0), ccfg, (10, 10, 10))
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                      jnp.float32)
    latents = jnp.asarray(np.random.default_rng(1).normal(size=(32, 8)),
                          jnp.float32)
    sigma = compute_density_conditional(params, ccfg, xyz, latents)
    assert sigma.shape == (32,)
    assert np.all(np.asarray(sigma) >= 0)
    # different latents -> different densities (the conditioning is live)
    sigma2 = compute_density_conditional(params, ccfg, xyz, latents + 1.0)
    assert not np.allclose(np.asarray(sigma), np.asarray(sigma2))
    dirs = latents[:, :3] / jnp.linalg.norm(latents[:, :3], axis=-1,
                                            keepdims=True)
    rgb = render_appearance_conditional(params, ccfg, dirs, xyz, latents)
    assert rgb.shape == (32, 3)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_ndc_rays():
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    no, nd = geo.ndc_rays(100, 100, 50.0, 1.0, o, d)
    # central ray maps to the NDC axis
    np.testing.assert_allclose(np.asarray(no[0, :2]), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(no)[0, 2] + np.asarray(nd)[0, 2], 1.0,
                               atol=1e-6)


def test_dense_sigma_and_cluster_export(tmp_path):
    cfg = Config(min_grid_dim=12, max_instances=3,
                 instance_loss_mode="slow_fast", seed=0)
    mcfg, params, rcfg, state_r = build_model(cfg, 3, grid_dim=(12,) * 3)
    sigma = occ.dense_sigma(params, mcfg, state_r, (12, 12, 12))
    assert sigma.shape == (12, 12, 12)
    assert np.all(np.asarray(sigma) >= 0)
    xyz, labels = occ.get_instance_clusters(params, mcfg, state_r, (12, 12, 12),
                                            mode="full", max_samples=500)
    assert xyz.shape[1] == 3 and len(xyz) == len(labels)
    occ.export_instance_clusters(params, mcfg, state_r, (12, 12, 12), tmp_path)
    assert (tmp_path / "alpha.obj").exists() or (tmp_path / "full.obj").exists()


def test_grouped_dispatch_matches_per_chunk():
    """render_frames(dispatch_group=G) must be numerically identical to the
    per-chunk path — the lax.map body IS render_rays on the same [chunk]
    shapes (inference/render.py::_jitted_render_group). Covers a full group
    plus a remainder group (4 chunks, G=3)."""
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.inference.render import render_frames

    scene = make_synthetic_scene(num_spheres=2, num_train=1, num_val=2,
                                 image_dim=(16, 16), seed=0)
    cfg = Config(min_grid_dim=17, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (17, 17, 17))

    frames = scene.val_frames  # 256 rays/frame -> 4 chunks of 64
    ref = render_frames(params, mcfg, rcfg, state_r, frames, chunk=64,
                        dispatch_group=1)
    grp = render_frames(params, mcfg, rcfg, state_r, frames, chunk=64,
                        dispatch_group=3)
    for a, b in zip(ref, grp):
        for k in ("rgb", "semantics", "instances", "depth"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
