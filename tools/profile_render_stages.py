"""Stage-level profiling of the inference render pass on the real TPU.

Times each ESS/density/head stage and A/B variants (grouped vs per-test
occupancy gathers, baked vs exact heads) in ONE process at the bench
operating point, so comparisons share the same device/tunnel state.
Feeds the PERFORMANCE.md stage budget; run after any compute-path change.

Usage: python tools/profile_render_stages.py [--iters 20]
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_bench_point(grid=192, chunk=8192, classes=21):
    """The bench.py operating point: model, rays, analytic indoor field."""
    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model

    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 chunk=chunk, seed=0, precision="bf16").resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, classes, step_ratio=0.25)
    # k=8/k2=8 + tail completion = the round-5-adopted bench defaults
    # (PERFORMANCE.md "Round-5 adjudication"); the k16/k24 variants below
    # re-profile the superseded points
    rcfg = dataclasses.replace(rcfg, head_topk=8, head_topk_semins=8,
                               head_dtype="bfloat16", head_tail_complete=True,
                               coarse_stride=16, max_segments=32,
                               sub_stride=8, max_subsegments=48)
    lin = jnp.linspace(-1, 1, grid)
    X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    th = 1.5 * 2.0 / grid
    surf = ((jnp.abs(r - 0.35) < th) | (jnp.abs(r - 0.65) < th)
            | ((Z < -0.9) & (jnp.sqrt(X**2 + Y**2) < 0.7)))
    dense = jnp.where(surf, 14.0, 0.0).astype(jnp.float32)

    rng = np.random.default_rng(0)
    origins = rng.uniform(-0.2, 0.2, (chunk, 3)).astype(np.float32)
    dirs = rng.normal(size=(chunk, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs, np.full((chunk, 1), 0.01, np.float32),
        np.full((chunk, 1), 1.5, np.float32)], axis=-1)
    return cfg, mcfg, params, rcfg, state_r, jax.device_put(rays), dense


def _time(fn, sync, iters):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from contrastive_lift_tpu.utils.platform import honor_platform_env
    honor_platform_env()  # JAX_PLATFORMS=cpu must beat the axon default
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None,
                    help="substring filter: run only stages whose name "
                         "contains this (each stage pays a remote compile, "
                         "so full sweeps exceed short timeouts)")
    args = ap.parse_args()

    def want(name):
        return args.only is None or args.only in name

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.ops.fused_grid import build_render_grids
    from contrastive_lift_tpu.renderer import render as R
    from contrastive_lift_tpu.renderer.bake import bake_head_tables

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    fused = build_render_grids(params, mcfg, rcfg0, state_r, compact=True,
                               feature_dtype=jnp.bfloat16,
                               dense_override=dense)
    grouped = R.occ_grouping_for(rcfg0, state_r)
    cal = R.calibrate_budgets(mcfg, grouped, state_r, rays, fused)
    ungrouped = dataclasses.replace(cal, occ_group_l1=0, occ_group_l2=False)
    # the round-4 production point (bench.py defaults): L2-only flat
    # selection + two-phase termination + calibrated head_term
    prod = R.occ_grouping_for(dataclasses.replace(rcfg0, use_l1=False),
                              state_r)
    prod = R.calibrate_budgets(mcfg, prod, state_r, rays, fused,
                               termination=True, head_term=True)
    baked = bake_head_tables(params, mcfg, fused)
    print(json.dumps({"budgets": [cal.max_segments, cal.max_subsegments],
                      "groups": [cal.occ_group_l1, cal.occ_group_l2],
                      "prod_budgets": [prod.max_segments,
                                       prod.max_subsegments,
                                       prod.max_subsegments_light,
                                       prod.term_first,
                                       round(prod.term_fraction, 3),
                                       prod.head_term_first,
                                       round(prod.head_term_fraction, 3)]}))

    def sync_any(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])

    results = {}

    # A/B variants of the production point ----------------------------------
    # bf16 brick atlas: halves the fine-gather bandwidth (the atlas is the
    # hot table — every fine sample gathers one 128-lane row); interp math
    # stays f32 (rows are upcast inside sample_density_brick)
    fused_bf16atlas = build_render_grids(params, mcfg, rcfg0, state_r,
                                         compact=True,
                                         feature_dtype=jnp.bfloat16,
                                         dense_override=dense,
                                         atlas_dtype=jnp.bfloat16)
    prod_noterm = dataclasses.replace(prod, term_first=0)
    prod_k16 = dataclasses.replace(prod, head_topk=16, head_topk_semins=8)
    prod_k24 = dataclasses.replace(prod, head_topk=24, head_topk_semins=8)
    # head selection mode A/B (RenderConfig.head_select): "iter" = exact
    # top-k via argmax passes (no [R,S] sort — a pure implementation swap),
    # "rank" = nearest-k above threshold (field-dependent fidelity, needs
    # the PQ gate; here it times the selection cost)
    prod_iter = dataclasses.replace(prod, head_select="iter")
    prod_rank = dataclasses.replace(prod, head_select="rank")
    # span gathers (RenderConfig.fine_span_rows): 4 atlas rows per
    # sub-segment instead of 8 per-sample rows — halves fine-pass gather
    # traffic, exactness checked host-side (validate_fine_span)
    prod_span = dataclasses.replace(prod, fine_span_rows=4)
    R.validate_fine_span(prod_span, state_r)
    # bounded-tail calibration (tail_eps): per-ray PROVEN residual bound
    # sizes the sub budget / termination depth tighter than the eps heuristic
    prod_te = R.calibrate_budgets(
        mcfg, R.occ_grouping_for(dataclasses.replace(rcfg0, use_l1=False),
                                 state_r),
        state_r, rays, fused, termination=True, head_term=True, tail_eps=2e-3)
    print(json.dumps({"prod_te_budgets": [prod_te.max_segments,
                                          prod_te.max_subsegments,
                                          prod_te.max_subsegments_light,
                                          prod_te.term_first,
                                          round(prod_te.term_fraction, 3),
                                          prod_te.head_term_first,
                                          round(prod_te.head_term_fraction,
                                                3)]}), flush=True)

    # -- full pass variants -------------------------------------------------
    for name, rc, fu in [("prod_full", prod, fused),
                         ("prod_full_taileps", prod_te, fused),
                         ("prod_full_bf16atlas", prod, fused_bf16atlas),
                         ("prod_full_noterm", prod_noterm, fused),
                         ("prod_full_k16", prod_k16, fused),
                         ("prod_full_k24", prod_k24, fused),
                         ("prod_full_iterheads", prod_iter, fused),
                         ("prod_full_rankheads", prod_rank, fused),
                         ("prod_full_span", prod_span, fused),
                         ("full_grouped_baked", cal, baked),
                         ("full_grouped_exactheads", cal, fused),
                         ("full_ungrouped_exactheads", ungrouped, fused),
                         ("full_ungrouped_baked", ungrouped, baked)]:
        if not want(name):
            continue
        fn = jax.jit(lambda p, f, r, rc=rc: R.render_rays(
            p, mcfg, rc, state_r, r, None, False, fused=f))
        results[name] = _time(lambda: fn(params, fu, rays),
                              lambda o: float(o["rgb"][0, 0]), args.iters)
        print(json.dumps({name: round(results[name], 3)}), flush=True)

    # -- density/ESS stages -------------------------------------------------
    for name, rc, fu in [("prod_density", prod, fused),
                         ("prod_density_span", prod_span, fused),
                         ("prod_density_bf16atlas", prod, fused_bf16atlas),
                         ("prod_density_noterm", prod_noterm, fused),
                         ("density_grouped", cal, fused),
                         ("density_ungrouped", ungrouped, fused)]:
        if not want(name):
            continue
        fn = jax.jit(lambda p, f, r, rc=rc: R._two_level_density(
            mcfg, rc, state_r, r, f)[6])
        results[name] = _time(lambda: fn(params, fu, rays),
                              lambda o: float(o[0, 0]), args.iters)
        print(json.dumps({name: round(results[name], 3)}), flush=True)

    for name, rc in [("l1_grouped", cal), ("l1_ungrouped", ungrouped)]:
        if not want(name):
            continue
        def l1(p, f, r, rc=rc):
            ro, rd, t0_ = R._ray_tmin(state_r, r)
            return R._select_segments(mcfg, rc, state_r, ro, rd, t0_, f)[0]
        fn = jax.jit(l1)
        results[name] = _time(lambda: fn(params, fused, rays),
                              lambda o: float(o[0, 0]), args.iters)
        print(json.dumps({name: round(results[name], 3)}), flush=True)

    # production L2-flat selection only (no segment cascade)
    if want("prod_select_l2flat"):
        def l2flat(p, f, r):
            ro, rd, t0_ = R._ray_tmin(state_r, r)
            return R._select_subsegments(mcfg, prod, state_r, ro, rd, t0_, f,
                                         None, None)[0]
        fn = jax.jit(l2flat)
        results["prod_select_l2flat"] = _time(lambda: fn(params, fused, rays),
                                              lambda o: float(o[0, 0, 0]),
                                              args.iters)
        print(json.dumps({"prod_select_l2flat":
                          round(results["prod_select_l2flat"], 3)}), flush=True)

    # selection + raw fine density (no termination/splice/transmittance):
    # isolates the brick-atlas gather+interp block inside prod_density
    if want("prod_selfine"):
        def selfine(p, f, r):
            ro, rd, t0_ = R._ray_tmin(state_r, r)
            fine_steps, sample_valid, _ = R._select_subsegments(
                mcfg, prod, state_r, ro, rd, t0_, f, None, None)
            return R._fine_density(mcfg, prod, state_r, ro, rd, t0_, f,
                                   fine_steps, sample_valid)[6]
        fn = jax.jit(selfine)
        results["prod_selfine"] = _time(lambda: fn(params, fused, rays),
                                        lambda o: float(o[0, 0]), args.iters)
        print(json.dumps({"prod_selfine":
                          round(results["prod_selfine"], 3)}), flush=True)

    for name, rc in [("l1l2_grouped", cal), ("l1l2_ungrouped", ungrouped)]:
        if not want(name):
            continue
        def l12(p, f, r, rc=rc):
            ro, rd, t0_ = R._ray_tmin(state_r, r)
            si, sv = R._select_segments(mcfg, rc, state_r, ro, rd, t0_, f)
            return R._select_subsegments(mcfg, rc, state_r, ro, rd, t0_, f,
                                         si, sv)[0]
        fn = jax.jit(l12)
        results[name] = _time(lambda: fn(params, fused, rays),
                              lambda o: float(o[0, 0, 0]), args.iters)
        print(json.dumps({name: round(results[name], 3)}), flush=True)

    print(json.dumps({k: round(v, 3) for k, v in sorted(results.items())}))


if __name__ == "__main__":
    main()
