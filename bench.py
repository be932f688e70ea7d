"""Render-throughput benchmark on the flagship slow-fast panoptic model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: inference rays/sec on one chip through the FULL render pass (density +
transmittance + rgb/semantic/instance heads + compositing) at the reference's
inference operating point — 192-equivalent grid, step_ratio 0.25 (2x samples,
reference: inference/render_panopli.py:104), chunked ray batches.

vs_baseline: ratio against the reference's A100 PyTorch render path. The repo
publishes no absolute number (BASELINE.md), so we use a nominal 1.0e5 rays/sec
for torch TensoRF-with-4-heads rendering on A100 — consistent with the
reference's chunk=2048 render loop timing on these scenes. The north-star is
vs_baseline >= 10.
"""
import json
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 1.0e5


def main():
    import jax

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.renderer import render as R

    grid = 192
    chunk = 8192
    cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 chunk=chunk, seed=0).resolve_epochs()
    num_classes = 21
    mcfg, params, rcfg, state_r = build_model(
        cfg, num_classes, step_ratio=0.25)  # inference: 2x samples

    rng = np.random.default_rng(0)
    origins = rng.uniform(-0.2, 0.2, (chunk, 3)).astype(np.float32)
    dirs = rng.normal(size=(chunk, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs, np.full((chunk, 1), 0.01, np.float32),
        np.full((chunk, 1), 1.5, np.float32)], axis=-1)
    rays = jax.device_put(rays)

    fn = jax.jit(lambda p, r: R.render_rays(p, mcfg, rcfg, state_r, r, None, False))
    out = fn(params, rays)
    jax.block_until_ready(out)  # compile

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, rays)
    jax.block_until_ready(out)
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
