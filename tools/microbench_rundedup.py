"""A/B microbench: per-sample fine-density gathers vs per-sub-segment
brick-RUN dedup (cap 4).

Fact being tested: the 8 samples of a sub-segment span (sub_stride-1) *
step_ratio < 4 voxels, so a straight ray crosses at most one brick boundary
per axis inside the sub-segment -> it visits at most 4 bricks, each in ONE
contiguous run (a line enters a convex box once). Gathering one atlas row
per RUN slot (4 per sub-segment) instead of one per SAMPLE (8) should halve
the dominant fine-stage gather cost; samples then pick their row from the 4
candidates by run id (a 3-deep where chain over 128 lanes that XLA fuses
into the hat-product consumer).

Run counts are synthesized with a Bernoulli(boundary) new-run process at a
few realistic rates (mean ~1.5-2.5 runs/sub on diagonal rays at the bench
operating point).

Usage: python tools/microbench_rundedup.py [--iters 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_sub = 1 << 18                       # sub-segments per chunk
    sub = 8
    n_samp = n_sub * sub
    rows = 110_592                        # (192/4)^3 brick atlas

    atlas = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
    frac = jnp.asarray(rng.uniform(0, 4, (n_samp, 3)), jnp.float32)

    def hat(rows_f32, frac):
        lane = jnp.arange(128)
        a = (lane // 25).astype(jnp.float32)
        b = ((lane // 5) % 5).astype(jnp.float32)
        c = (lane % 5).astype(jnp.float32)
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 0:1] - a))
             * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 1:2] - b))
             * jnp.maximum(0.0, 1.0 - jnp.abs(frac[..., 2:3] - c)))
        return jnp.sum(rows_f32 * w, axis=-1)

    # ---- A: per-sample gather (current production fine stage) -------------
    idx_s = jnp.asarray(rng.integers(0, rows, n_samp), jnp.int32)

    def per_sample(atlas, idx, frac):
        return hat(jnp.take(atlas, idx, axis=0), frac).sum()

    fn_a = jax.jit(per_sample)
    ms_a = _time(lambda: fn_a(atlas, idx_s, frac), lambda o: float(o),
                 args.iters)
    print(json.dumps({"fine": "per_sample", "ms": round(ms_a, 3),
                      "gathers": n_samp}), flush=True)

    # ---- B: run-dedup cap-4 gather + run-id select ------------------------
    for p_new in (0.1, 0.2, 0.35):
        # synthesize per-sample brick ids with contiguous runs
        base = rng.integers(0, rows, (n_sub, 1))
        new = rng.random((n_sub, sub)) < p_new
        new[:, 0] = False
        run_np = np.cumsum(new, axis=1).clip(max=3)
        ids_np = ((base + run_np * 7919) % rows).astype(np.int32)
        brickflat = jnp.asarray(ids_np)               # [n_sub, 8]
        frac_g = frac.reshape(n_sub, sub, 3)

        def dedup(atlas, brickflat, frac_g):
            new = jnp.concatenate(
                [jnp.zeros((brickflat.shape[0], 1), bool),
                 brickflat[:, 1:] != brickflat[:, :-1]], axis=1)
            run = jnp.minimum(jnp.cumsum(new.astype(jnp.int32), axis=1), 3)
            slot = jnp.arange(4, dtype=jnp.int32)
            first = jnp.concatenate(
                [jnp.ones((brickflat.shape[0], 1), bool), new[:, 1:]], axis=1)
            hit = first[..., None] & (run[..., None] == slot)   # [n,8,4]
            cand = jnp.sum(jnp.where(hit, brickflat[..., None], 0), axis=1)
            gathered = jnp.take(atlas, cand.reshape(-1), axis=0)
            g = gathered.reshape(-1, 4, 128)                    # [n,4,128]
            sel = g[:, 0, :][:, None, :]
            for s in range(1, 4):
                sel = jnp.where((run == s)[..., None], g[:, s, :][:, None, :],
                                sel)
            return hat(sel, frac_g).sum()

        fn_b = jax.jit(dedup)
        ms_b = _time(lambda: fn_b(atlas, brickflat, frac_g),
                     lambda o: float(o), args.iters)
        mean_runs = float(run_np.max(axis=1).mean() + 1)
        print(json.dumps({"fine": f"run_dedup_cap4_p{p_new}",
                          "ms": round(ms_b, 3), "gathers": n_sub * 4,
                          "mean_runs": round(mean_runs, 2),
                          "speedup_vs_per_sample":
                              round(ms_a / ms_b, 2)}), flush=True)


if __name__ == "__main__":
    main()
