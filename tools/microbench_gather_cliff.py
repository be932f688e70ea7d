"""Disentangle the random-gather rate cliff: table ROWS vs table BYTES.

The head corner-feature gather (197k rows/chunk from a 770k-row 256-lane
bf16 table) runs ~45M rows/s while the same-width gather from a 110k-row
table runs ~220-260M rows/s. If the cliff is driven by row COUNT, packing
2-4 cells per (wider) row rides the fast regime; if by table BYTES, only
quantization helps. Sweep (rows, width) on two matched-byte series:

  width 256 bf16 x rows {110k, 221k, 442k, 884k}   (56..452 MB)
  width 512 bf16 x rows { 55k, 110k, 221k, 442k}   (same bytes, half rows)
  width 1024 bf16 x rows {28k, 55k, 110k, 221k}    (same bytes, quarter rows)

plus a packed-2-cell consumer A/B: gather [n,512] then select the correct
256-lane half (the real cost of multi-cell packing).

Usage: python tools/microbench_gather_cliff.py [--iters 20]
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
    n_idx = 196_608              # 8192 rays x head_topk 24

    cases = []
    for lanes in (256, 512, 1024):
        for rows in (884_736 * 256 // lanes, 442_368 * 256 // lanes,
                     221_184 * 256 // lanes, 110_592 * 256 // lanes):
            cases.append((rows, lanes))

    key = jax.random.PRNGKey(0)
    for rows, lanes in cases:
        # tables built ON DEVICE — host->device upload of a 452MB table
        # through the remote-TPU tunnel takes minutes
        tab = jax.jit(lambda: jax.random.normal(
            key, (rows, lanes), jnp.bfloat16), static_argnums=())()
        idx = jnp.asarray(rng.integers(0, rows, n_idx), jnp.int32)
        fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0)
                     .astype(jnp.float32).sum())
        ms = _time(lambda: fn(tab, idx), lambda o: float(o), args.iters)
        print(json.dumps({"gather": f"{rows}x{lanes}:bf16",
                          "MB": round(rows * lanes * 2 / 2**20),
                          "ms": round(ms, 3),
                          "Mrows_per_s": round(n_idx / ms / 1e3, 1)}),
              flush=True)

    # packed-2-cell consumer: 385k x 512 bf16 table (the real compact table
    # at 2 cells/row), gather the shared row, select the owning half
    rows = 385_024
    tab = jax.jit(lambda: jax.random.normal(key, (rows, 512), jnp.bfloat16))()
    idx = jnp.asarray(rng.integers(0, rows, n_idx), jnp.int32)
    half = jnp.asarray(rng.integers(0, 2, n_idx), jnp.int32)

    def packed(tab, idx, half):
        g = jnp.take(tab, idx, axis=0).reshape(-1, 2, 256)
        sel = jnp.where((half == 1)[:, None, None], g[:, 1:2], g[:, 0:1])
        return sel.astype(jnp.float32).sum()

    fn = jax.jit(packed)
    ms = _time(lambda: fn(tab, idx, half), lambda o: float(o), args.iters)
    print(json.dumps({"gather": "packed2_385024x512_select_half:bf16",
                      "ms": round(ms, 3),
                      "Mrows_per_s": round(n_idx / ms / 1e3, 1)}), flush=True)

    # packed-4-cell consumer: 192.5k x 1024 bf16
    rows = 192_512
    tab = jax.jit(lambda: jax.random.normal(key, (rows, 1024), jnp.bfloat16))()
    idx = jnp.asarray(rng.integers(0, rows, n_idx), jnp.int32)
    quarter = jnp.asarray(rng.integers(0, 4, n_idx), jnp.int32)

    def packed4(tab, idx, quarter):
        g = jnp.take(tab, idx, axis=0).reshape(-1, 4, 256)
        sel = g[:, 0:1]
        for s in range(1, 4):
            sel = jnp.where((quarter == s)[:, None, None], g[:, s:s + 1], sel)
        return sel.astype(jnp.float32).sum()

    fn = jax.jit(packed4)
    ms = _time(lambda: fn(tab, idx, quarter), lambda o: float(o), args.iters)
    print(json.dumps({"gather": "packed4_192512x1024_select_quarter:bf16",
                      "ms": round(ms, 3),
                      "Mrows_per_s": round(n_idx / ms / 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
