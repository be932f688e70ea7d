"""Decisive gather-vs-arithmetic probes for the two remaining hot stages.

Questions this answers (each as an A/B inside one process, so the ~1.3 ms
remote-dispatch overhead cancels in comparisons):
  1. fine stage: is the brick-atlas pass bound by gather ISSUE (then
     dedup/compaction pays) or by the fused interp loop (then only fewer
     SAMPLES pays)?  -> time gather-only vs gather+interp at 1.38M samples.
  2. appearance head: how much of the 256-lane corner-row gather cost is the
     slot_map indirection vs the row gather itself; what does the head MLP
     cost without any gather.
  3. per-ray cell dedup headroom: unique-cell count among the top-k head
     samples (the gather count a dedup pass would reach).

Usage: python tools/microbench_gathers.py [--iters 20]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from profile_render_stages import make_bench_point  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.ops import fused_grid as F
    from contrastive_lift_tpu import models as M  # noqa: F401
    import contrastive_lift_tpu.models.tensorf as tf

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    fused = F.build_render_grids(params, mcfg, rcfg0, state_r, compact=True,
                                 feature_dtype=jnp.bfloat16,
                                 dense_override=dense)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])

    def t(fn, *a, iters=args.iters):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        return round((time.perf_counter() - t0) / iters * 1e3, 3)

    res = {}
    rng = np.random.default_rng(0)

    # -- 1. fine stage: gather vs gather+interp at the production count ------
    P = 1_376_256  # 8192 * (0.875*20 + 0.125*28) * 8 rounded to tiles
    xyz = jnp.asarray(rng.uniform(-0.6, 0.6, (P, 3)), jnp.float32)
    atlas = fused.brick_atlas
    res["atlas_rows_dtype"] = str(atlas.dtype)
    bx, by, bz = F.brick_atlas_dims(fused.grid_dim)

    def brick_rows_only(f, x):
        gx, gy, gz = f.grid_dim
        g = jnp.asarray((gx, gy, gz), jnp.float32)
        p = (x + 1.0) * 0.5 * (g - 1.0)
        i = jnp.clip(jnp.floor(p), 0.0, g - 2.0).astype(jnp.int32)
        b = jnp.minimum(i // 4, jnp.asarray((bx - 1, by - 1, bz - 1)))
        flat = (b[:, 0] * by + b[:, 1]) * bz + b[:, 2]
        rows = jnp.take(f.brick_atlas, flat, axis=0)     # [P, 128]
        return jnp.sum(rows, axis=-1)                     # cheap reduce to force it

    res["fine_gather_only_1.38M"] = t(jax.jit(brick_rows_only), fused, xyz)
    res["fine_gather_interp_1.38M"] = t(
        jax.jit(lambda f, x: F.sample_density_brick(f, x, mcfg.splus_density_shift)),
        fused, xyz)

    # same, half the samples (what global compaction would reach)
    xyz_h = xyz[:P // 2]
    res["fine_gather_interp_0.69M"] = t(
        jax.jit(lambda f, x: F.sample_density_brick(f, x, mcfg.splus_density_shift)),
        fused, xyz_h)

    # -- 2. appearance head decomposition ------------------------------------
    k = rcfg0.head_topk or 24
    Ph = rays.shape[0] * k
    flat = jnp.asarray(rng.uniform(-0.6, 0.6, (Ph, 3)), jnp.float32)
    name = "appearance"
    table = fused.compact_feature_cells[name]
    res["app_table_rows"] = int(table.shape[0])

    res["app_gather_full"] = t(
        jax.jit(lambda f, x: F.sample_feature_fused(
            f, name, x, out_dim=mcfg.dim_appearance)), fused, flat)

    # row gather with a precomputed row index (slot indirection excluded)
    ridx = jnp.asarray(rng.integers(0, table.shape[0], Ph), jnp.int32)
    def rows_only(tab, ix):
        return jnp.sum(jnp.take(tab, ix, axis=0), axis=-1)
    res["app_rowgather_only"] = t(jax.jit(rows_only), table, ridx)

    # slot_map gather alone (110k-row int32x8 table)
    sidx = jnp.asarray(rng.integers(0, fused.slot_map.shape[0], Ph), jnp.int32)
    res["app_slotgather_only"] = t(
        jax.jit(lambda sm, ix: jnp.sum(jnp.take(sm, ix, axis=0), axis=-1)),
        fused.slot_map, sidx)

    # appearance MLP alone (no gather): random features at the head point
    feats = jnp.asarray(rng.normal(size=(Ph, mcfg.dim_appearance)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(Ph, 3)), jnp.float32)
    res["app_mlp_only"] = t(
        jax.jit(lambda p, d, x, ft: tf.render_appearance(
            p, mcfg, d, x, jnp.bfloat16, feats=ft)),
        params, dirs, flat, feats)

    # sem+ins MLPs alone at k2
    k2 = rcfg0.head_topk_semins or 12
    P2 = rays.shape[0] * k2
    flat2 = flat[:P2]
    res["sem_mlp_only"] = t(
        jax.jit(lambda p, x: tf.render_semantics(p, mcfg, x, None, jnp.bfloat16)),
        params, flat2)
    res["ins_mlp_only"] = t(
        jax.jit(lambda p, x: tf.render_instances(p, mcfg, x, None, jnp.bfloat16)),
        params, flat2)

    # -- 3. dedup headroom: unique cells among top-k samples per ray ---------
    from contrastive_lift_tpu.renderer import render as R
    grouped = R.occ_grouping_for(rcfg0, state_r)
    cal = R.calibrate_budgets(mcfg, grouped, state_r, rays, fused)
    out = R._two_level_density(mcfg, cal, state_r, rays, fused)
    xyz_n, weight = out[0], out[6]
    w_k, idx = jax.lax.top_k(weight, k)
    xyz_k = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
    gx, gy, gz = fused.grid_dim
    g = jnp.asarray((gx, gy, gz), jnp.float32)
    p = (xyz_k + 1.0) * 0.5 * (g - 1.0)
    i = jnp.clip(jnp.floor(p), 0.0, g - 2.0).astype(jnp.int32)
    cell = (i[..., 0] * (gy - 1) + i[..., 1]) * (gz - 1) + i[..., 2]
    # count unique cells among ABOVE-THRESHOLD samples per ray (masked ones
    # don't need a gather)
    live = w_k > cal.raymarch_weight_thres
    cell = jnp.where(live, cell, -1)
    s = jnp.sort(cell, axis=1)
    uniq = jnp.sum((s[:, 1:] != s[:, :-1]) & (s[:, 1:] >= 0), axis=1) + (
        s[:, 0:1].squeeze(1) >= 0)
    u = np.asarray(uniq)
    res["uniq_cells_mean"] = round(float(u.mean()), 2)
    res["uniq_cells_p90"] = int(np.percentile(u, 90))
    res["uniq_cells_p999"] = int(np.percentile(u, 99.9))
    res["uniq_cells_max"] = int(u.max())
    live_n = np.asarray(jnp.sum(live, axis=1))
    res["live_topk_mean"] = round(float(live_n.mean()), 2)

    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
