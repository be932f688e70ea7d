"""Render-throughput benchmark on the flagship slow-fast panoptic model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: inference rays/sec on one chip through the FULL render pass (density +
transmittance + rgb/semantic/instance heads + compositing) at the reference's
inference operating point — 192^3 grid, step_ratio 0.25 (2x samples, reference:
inference/render_panopli.py:104), chunked ray batches. Uses the production
inference path: fused dense-grid density (one gather per sample), top-k head
compaction, bf16 head matmuls.

vs_baseline: ratio against the reference's A100 PyTorch render path. The repo
publishes no absolute number (BASELINE.md), so we use a nominal 1.0e5 rays/sec
for torch TensoRF-with-4-heads rendering on A100 — consistent with the
reference's chunk=2048 render loop timing on these scenes. The north-star is
vs_baseline >= 10.

Timing note: the result of the last chunk is fetched to host each iteration —
on remote-TPU platforms block_until_ready alone does not synchronize.
"""
import dataclasses
import json
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 1.0e5


def main():
    import jax

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.ops.fused_grid import build_fused_grids
    from contrastive_lift_tpu.renderer import render as R

    grid = 192
    chunk = 16384
    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 chunk=chunk, seed=0, precision="bf16").resolve_epochs()
    num_classes = 21
    mcfg, params, rcfg, state_r = build_model(
        cfg, num_classes, step_ratio=0.25)  # inference: 2x samples
    # production fast-path operating point: 24 occupied segments x 8 fine
    # samples covers 2-3 surfaces per ray with margin; k=48 head samples
    # covers everything above raymarch_weight_thres (see PERFORMANCE.md for
    # the knob/throughput curve: segs=16/k=32 reaches ~188k rays/s)
    rcfg = dataclasses.replace(rcfg, head_topk=48, head_dtype="bfloat16",
                               coarse_stride=8, max_segments=24)

    # Install a realistic occupancy pattern (an untrained field is empty and
    # the empty-space-skipping path would render nothing): three orthogonal
    # solid slabs through the origin — every ray crosses 2-3 surfaces, and
    # ~20% of segments along a ray are occupied, matching trained indoor
    # scenes. The slabs are expressed through the VM factors themselves.
    import jax.numpy as jnp
    lin = np.linspace(-1, 1, grid, dtype=np.float32)
    slab = (np.abs(lin) < 0.12).astype(np.float32)
    dp = [np.array(p) for p in params["density"]["planes"]]
    dl = [np.array(l) for l in params["density"]["lines"]]
    for i, (m0_profile, line_profile) in enumerate(
            [(slab, np.ones_like(slab))] * 3):
        dp[i][0] = 14.0 * m0_profile[None, :]  # slab along the plane's x-dim
        dl[i][0] = line_profile
    params = dict(params)
    params["density"] = {"planes": tuple(jnp.asarray(p) for p in dp),
                         "lines": tuple(jnp.asarray(l) for l in dl)}

    rng = np.random.default_rng(0)
    origins = rng.uniform(-0.2, 0.2, (chunk, 3)).astype(np.float32)
    dirs = rng.normal(size=(chunk, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs, np.full((chunk, 1), 0.01, np.float32),
        np.full((chunk, 1), 1.5, np.float32)], axis=-1)
    rays = jax.device_put(rays)

    import jax.numpy as jnp
    fused = jax.jit(lambda p: build_fused_grids(
        p, mcfg, feature_dtype=jnp.bfloat16,
        corner_features=("appearance",), with_occupancy=True))(params)
    fn = jax.jit(lambda p, f, r: R.render_rays(p, mcfg, rcfg, state_r, r,
                                               None, False, fused=f))
    out = fn(params, fused, rays)
    float(out["rgb"][0, 0])  # compile + sync

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, fused, rays)
    float(out["rgb"][0, 0])  # host fetch = true synchronization
    dt = time.perf_counter() - t0

    rays_per_sec = n_iters * chunk / dt
    result = {
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
