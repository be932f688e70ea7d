"""Piecewise timing of the unique-cell head-dedup path vs per-sample gathers.

All numbers in ONE process (same device state) so comparisons hold:
  a) per-sample appearance gather at [R*k] (the baseline being replaced)
  b) head_dedup_slots alone (run flags + uid build over the full sample list)
  c) unique-row gather alone ([R*cap])
  d) one-hot einsum redistribution alone
  e) the full dedup feature path (b+c+d+interp)

Usage: python tools/microbench_dedup.py [--iters 20]
"""
import argparse
import dataclasses
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
    from contrastive_lift_tpu.renderer import render as R

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    fused = F.build_render_grids(params, mcfg, rcfg0, state_r, compact=True,
                                 feature_dtype=jnp.bfloat16,
                                 dense_override=dense)
    grouped = R.occ_grouping_for(rcfg0, state_r)
    cal = R.calibrate_budgets(mcfg, grouped, state_r, rays, fused)
    print(json.dumps({"budgets": [cal.max_segments, cal.max_subsegments],
                      "dedup_cap": cal.head_dedup_cells}), flush=True)
    cap = cal.head_dedup_cells or 16
    k = cal.head_topk or 24

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

    # shared inputs: density pass output (fixed tensors, reused)
    dens = jax.jit(lambda r: R._two_level_density(
        mcfg, cal, state_r, r, fused)[0:7:6])
    xyz_n, weight = dens(rays)
    xyz_n = jax.block_until_ready(xyz_n)
    live = weight > cal.raymarch_weight_thres
    w_k, idx = jax.lax.top_k(weight, k)
    xyz_k = jnp.take_along_axis(xyz_n, idx[..., None], axis=1)
    flat = np.asarray(xyz_k.reshape(-1, 3))
    flat = jnp.asarray(flat)

    # a) per-sample baseline
    res["a_per_sample_gather"] = t(
        jax.jit(lambda f, x: F.sample_feature_fused(
            f, "appearance", x, out_dim=mcfg.dim_appearance)), fused, flat)

    # b) slots alone
    slots_fn = jax.jit(lambda f, x, lv: F.head_dedup_slots(f, x, lv, cap))
    res["b_dedup_slots"] = t(slots_fn, fused, xyz_n, live)
    slot, uid, tail = slots_fn(fused, xyz_n, live)
    slot_k = jnp.take_along_axis(slot, idx, axis=1)

    # c) unique-row gather alone
    def rows_only(f, u):
        gx, gy, gz = f.grid_dim
        uf = u.reshape(-1)
        iz = uf % (gz - 1)
        iy = (uf // (gz - 1)) % (gy - 1)
        ix = uf // ((gz - 1) * (gy - 1))
        i_u = jnp.stack([ix, iy, iz], axis=-1)
        rowsu = jnp.take(f.compact_feature_cells["appearance"],
                         F._compact_row_index(f, i_u), axis=0)
        return jnp.sum(rowsu.astype(jnp.float32), axis=-1)
    res["c_unique_row_gather"] = t(jax.jit(rows_only), fused, uid)

    # d) einsum redistribution alone (random rows stand-in)
    rng = np.random.default_rng(0)
    R_ = rays.shape[0]
    rows_u = jnp.asarray(rng.normal(size=(R_, cap, 256)), jnp.bfloat16)
    def redis(ru, sk):
        hot = (sk[..., None] == jnp.arange(cap, dtype=jnp.int32)).astype(ru.dtype)
        return jnp.einsum("rkc,rcw->rkw", hot, ru)
    res["d_einsum_redistribute"] = t(jax.jit(redis), rows_u, slot_k)

    # e) full dedup path
    def full(f, u, sk, xk):
        return F.sample_feature_dedup(f, "appearance", u, sk, xk,
                                      mcfg.dim_appearance)
    res["e_dedup_full"] = t(jax.jit(full), fused, uid, slot_k, xyz_k)

    # f) per-sample baseline again (device-drift control)
    res["f_per_sample_again"] = t(
        jax.jit(lambda f, x: F.sample_feature_fused(
            f, "appearance", x, out_dim=mcfg.dim_appearance)), fused, flat)

    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
