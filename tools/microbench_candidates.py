"""Microbenchmarks for candidate render optimizations (run on the real TPU).

Measures, at the bench operating point's scales:
  1. random row-gather rates for stride-2 super-atlas candidate tables
     ([~884k, 256] bf16/f32) vs the current [110k, 128] f32 brick atlas;
  2. fused shared-row interp (one row serves 8 samples) vs per-sample
     brick interp — the full fine-density stage A/B;
  3. lax.top_k vs a cumsum/one-hot "first-k occupied" select on the L1/L2
     shapes;
  4. baked-vs-exact heads at several head_topk budgets (the CLI renders at
     a far larger k than the bench's 24/12).

Usage: python tools/microbench_candidates.py [--iters 20] [--which all]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _time(fn, sync, iters=20):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_gathers(iters):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    n_idx = 1 << 18  # ~262k gathers (one per sub-segment at 32 subs/ray)
    for rows, lanes, dtype in [(110_592, 128, jnp.float32),
                               (884_736, 128, jnp.float32),
                               (884_736, 256, jnp.bfloat16),
                               (884_736, 256, jnp.float32),
                               (2_097_152, 256, jnp.bfloat16),
                               (2_097_152, 512, jnp.bfloat16)]:
        tab = jnp.asarray(rng.standard_normal((rows, lanes)), dtype)
        idx = jnp.asarray(rng.integers(0, rows, n_idx), jnp.int32)
        fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        ms = _time(lambda: fn(tab, idx), lambda o: float(o), iters)
        print(json.dumps({"gather": f"{rows}x{lanes}:{jnp.dtype(dtype).name}",
                          "ms": round(ms, 3),
                          "Mrows_per_s": round(n_idx / ms / 1e3, 1)}),
              flush=True)


def bench_shared_row_interp(iters):
    """Fine-density A/B: per-sample 5^3 brick rows vs one 6^3 stride-2 row
    shared by the 8 samples of a sub-segment."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    n_sub = 1 << 18                      # sub-segments per chunk
    n_samp = n_sub * 8

    # A: current — one [110k,128] f32 row + hat product per SAMPLE
    atlas = jnp.asarray(rng.standard_normal((110_592, 128)), jnp.float32)
    idx_s = jnp.asarray(rng.integers(0, 110_592, n_samp), jnp.int32)
    frac_s = jnp.asarray(rng.uniform(0, 4, (n_samp, 3)), jnp.float32)

    def per_sample(atlas, idx, frac):
        rows = jnp.take(atlas, idx, axis=0)
        lane = jnp.arange(128)
        a = (lane // 25).astype(jnp.float32)[None, :]
        b = ((lane // 5) % 5).astype(jnp.float32)[None, :]
        c = (lane % 5).astype(jnp.float32)[None, :]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(frac[:, 0:1] - a))
             * jnp.maximum(0.0, 1.0 - jnp.abs(frac[:, 1:2] - b))
             * jnp.maximum(0.0, 1.0 - jnp.abs(frac[:, 2:3] - c)))
        return jnp.sum(rows * w, axis=1).sum()

    fn_a = jax.jit(per_sample)
    ms = _time(lambda: fn_a(atlas, idx_s, frac_s), lambda o: float(o), iters)
    print(json.dumps({"fine": "per_sample_5c_f32", "ms": round(ms, 3)}),
          flush=True)

    # B: stride-2 super atlas — one [884k,256] row per sub-segment, 8 samples
    for dtype, name in [(jnp.bfloat16, "shared_6c_bf16"),
                        (jnp.float32, "shared_6c_f32")]:
        atlas2 = jnp.asarray(rng.standard_normal((884_736, 256)), dtype)
        idx_g = jnp.asarray(rng.integers(0, 884_736, n_sub), jnp.int32)
        # per-sample fracs relative to the shared row origin, in [0, 5]
        frac_g = jnp.asarray(rng.uniform(0, 5, (n_sub, 8, 3)), jnp.float32)

        def shared(atlas2, idx, frac):
            rows = jnp.take(atlas2, idx, axis=0).astype(jnp.float32)
            lane = jnp.arange(256)
            a = (lane // 36).astype(jnp.float32)
            b = ((lane // 6) % 6).astype(jnp.float32)
            c = (lane % 6).astype(jnp.float32)
            live = (lane < 216).astype(jnp.float32)
            w = (jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 0:1] - a))
                 * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 1:2] - b))
                 * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 2:3] - c)) * live)
            return jnp.sum(rows[:, None, :] * w, axis=-1).sum()

        fn_b = jax.jit(shared)
        ms = _time(lambda: fn_b(atlas2, idx_g, frac_g), lambda o: float(o),
                   iters)
        print(json.dumps({"fine": name, "ms": round(ms, 3)}), flush=True)


def bench_topk(iters):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    for S, k in [(83, 20), (84, 20), (40, 32), (443, 64)]:
        occ = jnp.asarray(rng.random((8192, S)) < 0.3)

        def via_topk(occ):
            score = occ.astype(jnp.float32) * (S - jnp.arange(S, dtype=jnp.float32))
            s, i = jax.lax.top_k(score, min(k, S))
            return i.sum() + (s > 0).sum()

        def via_cumsum(occ):
            # first-k occupied positions via rank matching (pure VPU)
            cum = jnp.cumsum(occ.astype(jnp.int32), axis=1)      # [R,S]
            r = jnp.arange(1, min(k, S) + 1, dtype=jnp.int32)
            hit = occ[..., None] & (cum[..., None] == r)         # [R,S,k]
            pos = jnp.arange(S, dtype=jnp.int32)[None, :, None]
            idx = jnp.sum(jnp.where(hit, pos, 0), axis=1)
            valid = jnp.any(hit, axis=1)
            return idx.sum() + valid.sum()

        for name, f in [("topk", via_topk), ("cumsum", via_cumsum)]:
            fn = jax.jit(f)
            ms = _time(lambda: fn(occ), lambda o: float(o), iters)
            print(json.dumps({"select": f"{name}_S{S}_k{k}",
                              "ms": round(ms, 3)}), flush=True)


def bench_baked_vs_exact(iters):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.ops.fused_grid import build_render_grids
    from contrastive_lift_tpu.renderer import render as R
    from contrastive_lift_tpu.renderer.bake import bake_head_tables
    from tools.profile_render_stages import make_bench_point

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    fused = build_render_grids(params, mcfg, rcfg0, state_r, compact=True,
                               feature_dtype=jnp.bfloat16,
                               dense_override=dense)
    baked = bake_head_tables(params, mcfg, fused)
    base = R.occ_grouping_for(rcfg0, state_r)
    base = R.calibrate_budgets(mcfg, base, state_r, rays, fused)
    for k in (24, 64, 128):
        rc = dataclasses.replace(base, head_topk=k,
                                 head_topk_semins=max(12, k // 2))
        for name, fu in [("exact", fused), ("baked", baked)]:
            fn = jax.jit(lambda p, f, r, rc=rc: R.render_rays(
                p, mcfg, rc, state_r, r, None, False, fused=f))
            ms = _time(lambda: fn(params, fu, rays),
                       lambda o: float(o["rgb"][0, 0]), iters)
            print(json.dumps({"heads": f"{name}_k{k}", "ms": round(ms, 3)}),
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--which", default="all",
                    choices=["all", "gathers", "fine", "topk", "baked"])
    args = ap.parse_args()
    if args.which in ("all", "gathers"):
        bench_gathers(args.iters)
    if args.which in ("all", "fine"):
        bench_shared_row_interp(args.iters)
    if args.which in ("all", "topk"):
        bench_topk(args.iters)
    if args.which in ("all", "baked"):
        bench_baked_vs_exact(args.iters)


if __name__ == "__main__":
    main()
