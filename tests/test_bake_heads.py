"""Baked position-only heads (renderer/bake.py): node-exactness and bounded
drift of the interpolated head outputs on a trained, surface-peaked field."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.base import RayPoolSampler
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.factory import build_model, class_weights_for
from contrastive_lift_tpu.models import tensorf as tf
from contrastive_lift_tpu.ops import fused_grid as fg
from contrastive_lift_tpu.renderer import render as R
from contrastive_lift_tpu.renderer.bake import bake_head_tables, baked_width
from contrastive_lift_tpu.train.state import init_train_state
from contrastive_lift_tpu.train.step import TrainGates, make_train_step


def _trained_model(steps=30, grid=24):
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(24, 32), seed=5)
    cfg = Config(batch_size=256, min_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 lr=2e-3, seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (grid,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    state = init_train_state(cfg, params)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    step = make_train_step(cfg, mcfg, rcfg, TrainGates(semantics_on=True,
                                                       instances_on=True),
                           weights, params)
    nrng = np.random.default_rng(0)
    inst = None
    from contrastive_lift_tpu.data.base import InstanceBundleSampler
    isampler = InstanceBundleSampler(scene.train_frames, 128, 8)
    for i in range(steps):
        inst = isampler.sample(nrng, 1)
        state, _ = step(state, state_r, sampler.sample(nrng, 256), inst, None,
                        jax.random.PRNGKey(i), 1.0, 0.0)
    return scene, cfg, mcfg, state.params, rcfg, state_r


def test_baked_heads_node_exact_and_bounded_drift():
    scene, cfg, mcfg, params, rcfg, state_r = _trained_model()
    rcfg = dataclasses.replace(rcfg, coarse_stride=8, max_segments=16,
                               head_topk=32)
    fused = fg.build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                  feature_dtype=jnp.float32)
    baked = bake_head_tables(params, mcfg, fused)
    assert "baked" in baked.compact_feature_cells
    F = baked_width(mcfg)

    # node-exactness: at voxel nodes inside occupied bricks the baked rows
    # reproduce the direct head outputs (up to the bf16 payload)
    gx = int(fused.grid_dim[0])
    occ = np.asarray(fused.slot_map[:, 0].reshape(fused.coarse_dim) > 0)
    bx, by, bz = [int(i) for i in np.argwhere(occ)[0]]
    nodes_i = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing="ij"),
                       -1).reshape(-1, 3) + np.array([bx, by, bz]) * 4 + 1
    nodes = jnp.asarray(nodes_i / (gx - 1) * 2.0 - 1.0, jnp.float32)
    got = np.asarray(fg.sample_feature_fused(baked, "baked", nodes,
                                             out_dim=F))
    sem = np.asarray(tf.render_semantics(params, mcfg, nodes,
                                         compute_dtype=jnp.bfloat16))
    # render_semantics applies the softmax; the baked payload stores logits
    want_sem = np.asarray(tf.mlp_apply(
        params["semantic_mlp"],
        tf._head_input(mcfg, mcfg.pe_sem, nodes, None), jnp.bfloat16))
    ins = np.asarray(tf.render_instances(params, mcfg, nodes,
                                         compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got[:, :mcfg.num_semantic_classes], want_sem,
                               rtol=0.03, atol=0.03)
    np.testing.assert_allclose(got[:, mcfg.num_semantic_classes:], ins,
                               rtol=0.03, atol=0.03)

    # rendered-map drift vs the exact heads on the same fast path
    rays = scene.val_frames[0].rays[::3][:256]
    out_exact = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                              fused=fused)
    out_baked = R.render_rays(params, mcfg, rcfg, state_r, rays, None, False,
                              fused=baked)
    # appearance path untouched
    np.testing.assert_allclose(np.asarray(out_baked["rgb"]),
                               np.asarray(out_exact["rgb"]), atol=1e-5)
    sem_e = np.asarray(out_exact["semantics"]).argmax(-1)
    sem_b = np.asarray(out_baked["semantics"]).argmax(-1)
    assert (sem_e == sem_b).mean() > 0.97
    err = np.abs(np.asarray(out_baked["instances"])
                 - np.asarray(out_exact["instances"]))
    scale = np.abs(np.asarray(out_exact["instances"])).max() + 1e-6
    assert np.quantile(err, 0.99) / scale < 0.15
