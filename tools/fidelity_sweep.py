"""Operating-point sweep: throughput AND fidelity for ESS/head knobs.

For each candidate (occ_alpha_thres, head_topk/semins) this renders the
bench field both through the production fast path and through the dense
fp32 reference path on a probe, reporting rays/s plus the fidelity numbers
PERFORMANCE.md quotes (rgb p99 err, opacity max err, semantic argmax
mismatch, guardrail tails). Picks are made from this table, not vibes.

Usage: python tools/fidelity_sweep.py [--iters 20]
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    from contrastive_lift_tpu.utils.platform import honor_platform_env
    honor_platform_env()  # JAX_PLATFORMS=cpu must beat the axon default
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--probe", type=int, default=2048)
    ap.add_argument("--ref-cache", default="/tmp/fidelity_ref.npz",
                    help="npz cache of the dense-reference probe maps")
    ap.add_argument("--r4", action="store_true",
                    help="round-4 adjudication subset (k2 cuts, bf16 atlas)")
    ap.add_argument("--r5", action="store_true",
                    help="round-5 head_topk shrink subset (k 24->8 under "
                         "tail completion), measured at the PRODUCTION "
                         "calibration (termination + head_term) so the "
                         "fidelity numbers are the shipped point's")
    ap.add_argument("--ref-only", action="store_true",
                    help="build + cache the dense fp32 reference, then exit. "
                         "Run under JAX_PLATFORMS=cpu: the axon process "
                         "registers no CPU backend, so the CPU-side table "
                         "build (whose densify peak exceeds chip HBM) must "
                         "happen in a separate CPU process writing the cache")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contrastive_lift_tpu.ops.fused_grid import build_render_grids
    from contrastive_lift_tpu.renderer import render as R
    from tools.profile_render_stages import make_bench_point

    cfg, mcfg, params, rcfg0, state_r, rays, dense = make_bench_point()
    chunk = rays.shape[0]

    # Dense fp32 ground truth on a probe subset (no ESS, no top-k, f32 heads).
    # compact=True is exact for composited maps (samples in non-occupied
    # bricks have zero density -> zero weight, so their feature reads are
    # masked out) and keeps the f32 tables inside the 16 GB chip — the full
    # 193^3 uncompacted f32 tables OOM. The result is cached to disk because
    # the shared remote chip sporadically refuses the multi-GB build peak.
    probe = rays[:args.probe]
    ref_cache = Path(args.ref_cache)
    if ref_cache.exists():
        z = np.load(ref_cache)
        ref_rgb, ref_op, ref_sem = z["rgb"], z["op"], z["sem"]
        print(f"loaded dense reference from {ref_cache}", file=sys.stderr)
    else:
        rcfg_dense = dataclasses.replace(
            rcfg0, coarse_stride=None, sub_stride=None, head_topk=None,
            head_topk_semins=None, head_dtype="float32")
        # build the f32 tables on CPU (the densify peak exceeds chip HBM),
        # then ship the ~1.2 GB result to the device
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            raise SystemExit(
                f"no CPU backend in this process and no reference cache at "
                f"{ref_cache}; run `JAX_PLATFORMS=cpu python "
                f"tools/fidelity_sweep.py --ref-only` first (the axon "
                f"process registers only the TPU backend)")
        with jax.default_device(cpu_dev):
            fused_plain = build_render_grids(
                params, mcfg, rcfg_dense, state_r, compact=True,
                feature_dtype=jnp.float32,
                dense_override=jax.device_get(dense))
        fused_plain = jax.device_put(fused_plain, jax.devices()[0])
        ref_fn = jax.jit(lambda p, f, r: R.render_rays(
            p, mcfg, rcfg_dense, state_r, r, None, False, fused=f))
        # chunk the dense probe: 1324 samples x dense f32 256-wide heads on
        # all rays at once holds multi-GB activations
        ref_parts = [ref_fn(params, fused_plain, probe[i:i + 256])
                     for i in range(0, probe.shape[0], 256)]
        ref_rgb = np.concatenate([np.asarray(r["rgb"]) for r in ref_parts])
        ref_op = np.concatenate([np.asarray(r["opacity"]) for r in ref_parts])
        ref_sem = np.concatenate(
            [np.asarray(r["semantics"]) for r in ref_parts]).argmax(-1)
        del fused_plain, ref_parts  # free the f32 tables before the sweep
        np.savez(ref_cache, rgb=ref_rgb, op=ref_op, sem=ref_sem)
    if args.ref_only:
        print(json.dumps({"ref_cached": str(ref_cache),
                          "probe": int(args.probe)}))
        return

    candidates = [
        {"occ": 1e-5, "k": 24, "k2": 12},   # current production point
        {"occ": 3e-5, "k": 24, "k2": 12},
        {"occ": 1e-4, "k": 24, "k2": 12},
        {"occ": 3e-5, "k": 16, "k2": 8},
        {"occ": 1e-5, "k": 32, "k2": 16},
        # finer L2 granularity: 1-voxel sub-segments hug surfaces tighter,
        # cutting fine-stage gathers after calibration (pads auto-derive)
        {"occ": 1e-5, "k": 24, "k2": 12, "sub": 4},
        {"occ": 1e-5, "k": 24, "k2": 8, "sub": 4},
        {"occ": 1e-5, "k": 24, "k2": 8},
        {"occ": 1e-5, "k": 20, "k2": 10},
        # bf16 brick atlas: halves fine-gather bandwidth; quantizes the
        # DENSITY table (~3 decimal digits), so alpha/compositing shift —
        # adoption needs this row's error vs the dense fp32 reference
        {"occ": 1e-5, "k": 24, "k2": 12, "atlas": "bfloat16"},
        {"occ": 1e-5, "k": 24, "k2": 8, "atlas": "bfloat16"},
    ]
    if args.r4:
        # round-4 adjudication subset: k2 reduction (sem+ins head rows are
        # a third of the head block each) and the bf16 atlas, vs prod
        candidates = [candidates[0], candidates[7], candidates[8],
                      candidates[9], candidates[10]]
    if args.r5:
        # round-5: tail completion made small k fidelity-true on the trained
        # field (tools/pq_fidelity_gate.py passes down to k=8); adjudicate
        # the ANALYTIC regime's k at the production point (profiler: k=24 ->
        # 12 is -17% full-pass wall)
        candidates = [{"occ": 1e-5, "k": k, "k2": 8} for k in (24, 16, 12, 8)]
        # bf16-atlas adoption row (round 5): the r5b trained-field PQ gate
        # passes with atlas_dtype=bfloat16 (FIDELITY_PQ_k8_atlasbf16.json);
        # this row supplies the matching ANALYTIC-regime error-vs-dense-fp32
        # fact at the adopted k=8 point
        candidates.append({"occ": 1e-5, "k": 8, "k2": 8, "atlas": "bfloat16"})
    for c in candidates:
        rcfg = dataclasses.replace(rcfg0, occ_alpha_thres=c["occ"],
                                   head_topk=c["k"], head_topk_semins=c["k2"],
                                   sub_stride=c.get("sub", rcfg0.sub_stride),
                                   use_l1=not args.r5)
        fused = build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                   feature_dtype=jnp.bfloat16,
                                   dense_override=dense,
                                   atlas_dtype=jnp.dtype(
                                       c.get("atlas", "float32")))
        rcfg = R.occ_grouping_for(rcfg, state_r)
        rcfg = R.calibrate_budgets(mcfg, rcfg, state_r, rays, fused,
                                   termination=args.r5, head_term=args.r5)
        fn = jax.jit(lambda p, f, r, rc=rcfg: R.render_rays(
            p, mcfg, rc, state_r, r, None, False, fused=f))
        out = fn(params, fused, rays)
        float(out["rgb"][0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, fused, rays)
        float(out["rgb"][0, 0])
        dt = (time.perf_counter() - t0) / args.iters

        fast = fn(params, fused, probe)
        rgb = np.asarray(fast["rgb"])
        op = np.asarray(fast["opacity"])
        sem = np.asarray(fast["semantics"]).argmax(-1)
        print(json.dumps({
            "occ": c["occ"], "k": c["k"], "k2": c["k2"], "sub": c.get("sub", 8),
            "budgets": [rcfg.max_segments, rcfg.max_subsegments,
                        rcfg.max_subsegments_light],
            "rays_per_s": round(chunk / dt, 1),
            "rgb_p99": round(float(np.quantile(np.abs(rgb - ref_rgb), 0.99)), 6),
            "opacity_max": round(float(np.max(np.abs(op - ref_op))), 6),
            "sem_mismatch": round(float((sem != ref_sem).mean()), 6),
            "budget_tail": round(float(out["budget_tail"]), 6),
            "head_tail": round(float(out["head_tail"]), 6),
        }), flush=True)


if __name__ == "__main__":
    main()
