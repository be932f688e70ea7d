"""Decide the fused multi-branch corner-row layout (VERDICT r4 item 2b).

The three head branches (appearance/semantic/instance, dim 27 -> 256-lane
bf16 corner rows) are gathered SEPARATELY per sample today: 197k appearance
rows (k=24) + 98k semantic + 98k instance rows (k2=12) per 8192-ray chunk =
393k row issues from three 770k-row tables. The measured gather model says
cost is per-row-issue at fixed row count, so packing branches into one wider
row could cut issues ~2x — IF wide tile-aligned rows hold the issue rate
(pack2's 12% regression warns bandwidth may not be free at 1 KB rows).

Candidate layouts, measured at the production issue pattern:
  A 3-way separate  (status quo): 197k@256 + 98k@256 + 98k@256
  B sem+ins fused:               197k@256 + 98k@512   (zero wasted bytes —
                                  sem and ins sample the SAME k2 points)
  C all fused:                   197k@768             (wastes sem+ins lanes
                                  on the k-k2 appearance-only samples)

Also characterizes raw width scaling (256/512/768/1024 lanes) at the same
row count so the layout decision generalizes.

Usage: python tools/microbench_multibranch.py [--iters 30] [--rows 770048]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rows", type=int, default=770048)
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows = args.rows
    Pk = args.rays * args.k
    Pk2 = args.rays * args.k2

    keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def table(lanes):
        # built ON DEVICE — host->device transfer of GB tables over the
        # remote tunnel takes minutes and isn't what we're measuring
        return jax.block_until_ready(jax.jit(
            lambda k: jax.random.normal(k, (rows, lanes), jnp.bfloat16),
        )(next(keys)))

    # indices share the per-ray locality structure of real renders loosely
    # (uniform random is the WORST case the rate model was built on)
    ik = jnp.asarray(rng.integers(0, rows, Pk), jnp.int32)
    ik2 = ik[:Pk2]

    def sync(x):
        float(jnp.asarray(x).reshape(-1)[0])

    def t(fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        return round((time.perf_counter() - t0) / args.iters * 1e3, 3)

    res = {"rows": rows, "issues_k": Pk, "issues_k2": Pk2}

    # raw width scaling at the k issue count
    for lanes in (256, 512, 768, 1024):
        tab = table(lanes)
        ms = t(jax.jit(lambda tb, ix: jnp.sum(
            jnp.take(tb, ix, axis=0).astype(jnp.float32), axis=-1)), tab, ik)
        res[f"width{lanes}_ms"] = ms
        res[f"width{lanes}_Mrows_s"] = round(Pk / ms / 1e3, 1)
        del tab

    t256a, t256b, t256c = table(256), table(256), table(256)
    t512 = table(512)
    t768 = table(768)

    def reduce_rows(tb, ix):
        return jnp.sum(jnp.take(tb, ix, axis=0).astype(jnp.float32), axis=-1)

    # A: status quo — three separate gathers in one jit (as the render does)
    res["A_threeway_ms"] = t(jax.jit(
        lambda a, b, c, i1, i2: jnp.sum(reduce_rows(a, i1))
        + jnp.sum(reduce_rows(b, i2)) + jnp.sum(reduce_rows(c, i2))),
        t256a, t256b, t256c, ik, ik2)

    # B: appearance separate + sem/ins fused 512-lane row
    res["B_semins_fused_ms"] = t(jax.jit(
        lambda a, f, i1, i2: jnp.sum(reduce_rows(a, i1))
        + jnp.sum(reduce_rows(f, i2))), t256a, t512, ik, ik2)

    # C: all three in one 768-lane row at the k issue count
    res["C_all_fused_ms"] = t(jax.jit(
        lambda f, i1: jnp.sum(reduce_rows(f, i1))), t768, ik)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
