"""Microbench the ESS selection + head stages piece by piece on the real TPU.

The round-3 profiler showed L1 select at ~4.8 ms and L2 at ~3.3 ms per
8192-ray chunk — together more than the fine density stage they feed. This
tool times each INTERNAL piece (midpoint geometry, occupancy gather, alpha
test, top_k ranking, head feature gather, head MLPs) in one process so the
slow piece is identified by measurement, not guesswork.

Usage: python tools/microbench_select.py [--iters 20] [--which all]
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


def _timer(sync):
    def run(fn, *args, iters=20):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters * 1e3
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.ops.fused_grid import (
        build_render_grids, sample_occ_grouped, sample_coarse_occ)
    from contrastive_lift_tpu.renderer import render as R
    import contrastive_lift_tpu.models.tensorf as _  # noqa

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    fused = build_render_grids(params, mcfg, rcfg0, state_r, compact=True,
                               feature_dtype=jnp.bfloat16, dense_override=dense)
    grouped = R.occ_grouping_for(rcfg0, state_r)
    cal = R.calibrate_budgets(mcfg, grouped, state_r, rays, fused)
    print(json.dumps({"budgets": [cal.max_segments, cal.max_subsegments,
                                  cal.max_subsegments_light],
                      "g1": cal.occ_group_l1}), flush=True)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])

    t = _timer(sync)
    res = {}
    state = state_r
    rc = cal
    cs = rc.coarse_stride
    S_c = -(-rc.n_samples // cs)
    g = rc.occ_group_l1
    S_cp = -(-S_c // g) * g if g >= 2 else S_c

    # -- L1 pieces -----------------------------------------------------------
    def p_tmin(r):
        return R._ray_tmin(state, r)[2]
    res["tmin"] = t(jax.jit(p_tmin), rays, iters=args.iters)

    def p_mid_xyz(r):
        ro, rd, t0 = R._ray_tmin(state, r)
        steps_c = (jnp.arange(S_cp, dtype=jnp.float32) * cs + 0.5 * cs) * state.step_size
        z_c = t0[:, None] + steps_c[None, :]
        xyz = ro[:, None, :] + rd[:, None, :] * z_c[..., None]
        return R.normalize_coordinates(state, xyz)
    res["l1_geometry"] = t(jax.jit(p_mid_xyz), rays, iters=args.iters)

    def p_gather_grouped(f, r):
        xyz = p_mid_xyz(r)
        return sample_occ_grouped(f, xyz, g)[:, :S_c]
    res["l1_geom+gather_grouped"] = t(jax.jit(p_gather_grouped), fused, rays,
                                      iters=args.iters)

    def p_gather_flat(f, r):
        xyz = p_mid_xyz(r)
        Rr = xyz.shape[0]
        return sample_coarse_occ(f, xyz.reshape(-1, 3)).reshape(Rr, S_cp)
    res["l1_geom+gather_pertest"] = t(jax.jit(p_gather_flat), fused, rays,
                                      iters=args.iters)

    def p_l1_full(f, r):
        ro, rd, t0 = R._ray_tmin(state, r)
        return R._select_segments(mcfg, rc, state, ro, rd, t0, f)[0]
    res["l1_full"] = t(jax.jit(p_l1_full), fused, rays, iters=args.iters)

    # top_k alone on the L1 score shape
    score = jnp.asarray(np.random.default_rng(0).random((rays.shape[0], S_c)),
                        jnp.float32)
    res["topk_8192x83_k20"] = t(jax.jit(lambda s: jax.lax.top_k(s, rc.max_segments)[1]),
                                score, iters=args.iters)

    # -- L2 pieces -----------------------------------------------------------
    def p_l1l2(f, r):
        ro, rd, t0 = R._ray_tmin(state, r)
        si, sv = R._select_segments(mcfg, rc, state, ro, rd, t0, f)
        return R._select_subsegments(mcfg, rc, state, ro, rd, t0, f, si, sv)[0]
    res["l1l2_full"] = t(jax.jit(p_l1l2), fused, rays, iters=args.iters)

    cand = rc.max_segments * (cs // rc.sub_stride)
    score2 = jnp.asarray(np.random.default_rng(1).random((rays.shape[0], cand)),
                         jnp.float32)
    res[f"topk_8192x{cand}_k{rc.max_subsegments}"] = t(
        jax.jit(lambda s: jax.lax.top_k(s, rc.max_subsegments)[1]), score2,
        iters=args.iters)

    # -- density / bucketing -------------------------------------------------
    def p_density(f, r):
        return R._two_level_density(mcfg, rc, state, r, f)[6]
    res["density_full"] = t(jax.jit(p_density), fused, rays, iters=args.iters)

    nobucket = dataclasses.replace(rc, max_subsegments_light=0)
    def p_density_nb(f, r):
        return R._two_level_density(mcfg, nobucket, state, r, f)[6]
    res["density_nobucket"] = t(jax.jit(p_density_nb), fused, rays,
                                iters=args.iters)

    # -- heads ---------------------------------------------------------------
    def p_full(f, r):
        return R.render_rays(params, mcfg, rc, state, r, None, False, fused=f)
    res["full_pass"] = t(jax.jit(lambda f, r: p_full(f, r)["rgb"]), fused, rays,
                         iters=args.iters)

    # corner-feature gather alone at the head operating point
    from contrastive_lift_tpu.ops.fused_grid import sample_feature_fused
    Rn = rays.shape[0]
    k = rc.head_topk or 24
    flat = jnp.asarray(np.random.default_rng(2).uniform(-0.6, 0.6, (Rn * k, 3)),
                       jnp.float32)
    if "appearance" in fused.compact_feature_cells or "appearance" in fused.feature_cells:
        res["head_app_gather_only"] = t(
            jax.jit(lambda f, x: sample_feature_fused(f, "appearance", x,
                                                      out_dim=mcfg.dim_appearance)),
            fused, flat, iters=args.iters)

    print(json.dumps({k2: round(v, 3) for k2, v in res.items()}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
