"""A/B microbench: MAIN-phase train cost — direct VM sampling vs
differentiable densified grids (run on the real TPU).

The main phase needs gradients into the density and head factor grids, so it
has always used direct VM sampling (18 small-table gathers per sample
forward; scatter-adds into the factor tables backward). But the densify
insight (ops/fused_grid.py) is differentiable end-to-end: dense = einsums of
the factors (cheap, matmul backward), then ONE cell-corner gather per sample
whose backward is a scatter-add into the [cells, 8] grid. Whether that wins
depends on the TPU scatter-add rate — measured here, not assumed.

Variants (value_and_grad of an rgb+semantic loss at the bench --train
operating point: 128^3 grid, 2048 rays x ~443 samples):
  A  direct VM, dense heads            (the r3 production main phase pre-topk)
  B  direct VM, head_topk=64           (production with calibrated train topk)
  C  fused differentiable density (+topk) — heads still direct VM
  D  C + fused differentiable FEATURES for grid-branch heads

Also: raw scatter-add rate [N,8] -> [2M,8] (the gather-backward primitive).

Usage: python tools/microbench_train_main.py [--iters 10]
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, sync, iters=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.base import RayPoolSampler
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.factory import build_model, class_weights_for
    from contrastive_lift_tpu.losses import losses as L
    from contrastive_lift_tpu.ops import fused_grid as fg
    from contrastive_lift_tpu.renderer import render as R

    grid = args.grid
    cfg = Config(batch_size=args.batch, min_grid_dim=grid, max_grid_dim=grid,
                 max_instances=3, instance_loss_mode="slow_fast",
                 use_DINO_style=True, precision="bf16", seed=0,
                 use_mlp_for_semantics=False).resolve_epochs()
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(64, 64), seed=0)
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (grid,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    nrng = np.random.default_rng(0)
    sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    batch = sampler.sample(nrng, cfg.batch_size)
    rays = jnp.asarray(batch["rays"])
    rgbs = jnp.asarray(batch["rgbs"])
    sem = jnp.asarray(batch["semantics"])
    probs = jnp.asarray(batch["probabilities"])
    confs = jnp.asarray(batch["confidences"])
    key = jax.random.PRNGKey(0)

    # raw scatter-add rate (the gather-backward primitive)
    cells = (grid - 1) ** 3
    for n in (262_144, 1 << 20):
        idx = jnp.asarray(np.random.default_rng(1).integers(0, cells, n),
                          jnp.int32)
        vals = jnp.asarray(np.random.default_rng(2).standard_normal((n, 8)),
                           jnp.float32)

        def scat(idx, vals):
            return jnp.zeros((cells, 8), jnp.float32).at[idx].add(vals).sum()

        fn = jax.jit(scat)
        ms = _time(lambda: fn(idx, vals), lambda o: float(o), args.iters)
        print(json.dumps({"scatter_add": f"{n}x8->{cells}x8",
                          "ms": round(ms, 3),
                          "Mrows_per_s": round(n / ms / 1e3, 1)}), flush=True)

    def loss_with(rcfg_v, fused_density: bool, fused_feats: bool):
        def f(p):
            fused = None
            if fused_density:
                fused = fg.build_density_only(p)
                if fused_feats:
                    feats = {}
                    for name in ("appearance", "semantic", "instance"):
                        if name in p:
                            feats[name] = fg.build_dense_feature(p, name)
                    fused = fused._replace(features=feats)
            out = R.render_rays(p, mcfg, rcfg_v, state_r, rays, key,
                                is_train=True, fused=fused)
            loss = L.mse_loss(out["rgb"], rgbs)
            loss = loss + 0.1 * L.semantic_loss(
                out["semantics"], sem, probs, confs, cfg.probabilistic_ce_mode,
                weights, cfg.use_symmetric_ce, cfg.ce_alpha, cfg.ce_beta)
            return loss
        return jax.jit(jax.grad(f))

    rcfg_tk = dataclasses.replace(rcfg, head_topk=64)
    variants = [
        ("A_direct_dense_heads", rcfg, False, False),
        ("B_direct_topk64", rcfg_tk, False, False),
        ("C_fused_density_topk64", rcfg_tk, True, False),
        ("D_fused_density_feats_topk64", rcfg_tk, True, True),
    ]
    for name, rcfg_v, fd, ff in variants:
        fn = loss_with(rcfg_v, fd, ff)
        ms = _time(lambda: fn(params),
                   lambda g: float(jax.tree.leaves(g)[0].reshape(-1)[0]),
                   args.iters)
        print(json.dumps({"main_phase_grad": name, "ms": round(ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
