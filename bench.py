"""Render-throughput benchmark on the flagship slow-fast panoptic model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: inference rays/sec on one chip through the FULL render pass
(density + transmittance + rgb/semantic/instance heads + compositing) on the
ANALYTIC bench field — the r1+ headline series. The same line records the
committed reference-scale TRAINED checkpoint (artifacts/e2e_r4_tpu) at its
PQ-gated production operating point (|ΔPQ^scene| < 0.5 pt vs dense fp32,
artifacts/e2e_r4_tpu/FIDELITY_PQ_bench_point.json) — the cross-check VERDICT
r3 #3 asked for: real optimization statistics, budgets calibrated on the
trained field. Note the two regimes trade differently: the trained field's
ESS budgets land DEEPER (sharper surfaces) but its fuzzy short-budget
surfaces need a deeper head budget to hold PQ fidelity (auto head_topk=64 vs
the analytic field's fidelity-proven k=24), so its gated point is slower —
the recorded trained number is one a user actually gets at gated fidelity,
not a fidelity-failing fast point. The full 3-phase train-step rate rides in
the same line (train_steps_per_sec).

Analytic regime: 192^3 grid, step_ratio 0.25 -> 1324 samples/ray
(reference: inference/render_panopli.py:104), 21 classes, slow-fast instance
head. Uses the production inference fast path (ops/fused_grid.py):
brick-atlas density (one 128-lane gather + fused hat-product interpolation
per sample), three-level empty-space skipping (stride-16 coarse tests,
stride-8 sub-segment tests; budgets start at 32 segments / 48 sub-segments
and are then scene-calibrated down), occupancy-compacted bf16
corner-feature rows, weight-sorted top-k head compaction (k=24 appearance,
k=12 semantics/instances).

Budgets are scene-calibrated (renderer.calibrate_budgets): a probe density
pass finds the deepest nearest-first segment rank still carrying compositing
weight and sizes max_segments/max_subsegments at its 99.9th percentile —
this field calibrates to ~(20, 28). Fidelity vs dense fp32 rendering of the
same field (4096-ray probe, PERFORMANCE.md): rgb p99 err 5.2e-3, opacity
max err 1.4e-3, semantic argmax mismatch 0.00%, no truncation tail (0 rays
with opacity err > 0.05).

Scene: an indoor-like analytic field on the 192^3 grid — two nested sphere
shells (r=0.35, 0.65, 1.5 voxels thick) plus a floor disk; cameras inside the
inner shell, so every ray crosses 2-3 textured surfaces; ~27% of supervoxel
bricks are occupied after conservative dilation. (Trained indoor fields show
the same structure: a few surface crossings per ray; see tests/test_two_level.py
for the error bound on trained fields.)

vs_baseline: ratio against the reference's A100 PyTorch render path. The repo
publishes no absolute number (BASELINE.md), so we use a nominal 1.0e5 rays/sec
for torch TensoRF-with-4-heads rendering on A100 — consistent with the
reference's chunk=2048 render loop timing on these scenes (see
PERFORMANCE.md "Baseline" for the roofline cross-check). North star >= 10.

Timing note: the result of the last chunk is fetched to host each iteration —
on remote-TPU platforms block_until_ready alone does not synchronize.
"""
import dataclasses
import json
import sys
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 1.0e5


XLA_CACHE_DIR = "artifacts/xla_cache"


def _honor_platform_env():
    """The container's sitecustomize pre-registers the remote-TPU platform,
    which overrides JAX_PLATFORMS (CLAUDE.md); re-apply the env var so
    `JAX_PLATFORMS=cpu python bench.py` (smoke runs) behaves as documented.

    Also enables the persistent XLA compilation cache (repo-local): on the
    remote-TPU platform every compile pays a ~60-200 s remote-compile HTTP
    hop — the round-4 driver run spent 693 s of its 600 s budget on the
    analytic phase's compiles alone and skipped the other two metrics
    (VERDICT r4 #1). With the cache warmed (any prior full run), a repeat
    bench run deserializes executables in <1 s each and all three phases fit
    the budget with minutes to spare. Measured on chip: 81 s compile -> 0.7 s
    cache hit for a toy program."""
    import os

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # CPU-forced smoke runs skip the cache: CPU compiles are seconds, and
    # XLA:CPU AOT cache loads emit noisy machine-feature-mismatch warnings
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
        import pathlib
        cache = pathlib.Path(__file__).resolve().parent / XLA_CACHE_DIR
        try:
            cache.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except (OSError, AttributeError):
            pass  # read-only checkout / older jax: compiles stay live


def bench_train():
    """Training-step throughput at the reference operating point (VERDICT r1
    #8): 128^3 grid, 2048 main rays + 1024-ray instance bundle + 32x1024-ray
    segment stream, ~443 samples/ray, bf16 head compute. Reports steps/s per
    epoch-gate combination (the reference enables instance optimization at
    epoch 3+l and segments at 6+l — trainer/train_panopli_tensorf.py:148-228).
    Prints one JSON line per phase."""
    import os

    import jax
    _honor_platform_env()

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.base import (InstanceBundleSampler,
                                                RayPoolSampler,
                                                SegmentBundleSampler)
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.factory import build_model, class_weights_for
    from contrastive_lift_tpu.train.state import init_train_state
    from contrastive_lift_tpu.train.step import TrainGates, make_train_step

    # BENCH_GRID/BENCH_ITERS smoke overrides apply here too (the recorded
    # benchmark is the 128^3 default)
    grid = int(os.environ.get("BENCH_GRID", 128))
    cfg = Config(batch_size=2048, min_grid_dim=grid, max_grid_dim=grid,
                 max_instances=3, instance_loss_mode="slow_fast",
                 use_DINO_style=True, batch_size_contrastive=1,
                 max_rays_instances=1024, batch_size_segments=32,
                 max_rays_segments=1024, precision="bf16",
                 seed=0).resolve_epochs()
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(64, 64), seed=0)
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (grid,) * 3)
    weights = class_weights_for(cfg, scene.segmentation)
    nrng = np.random.default_rng(0)
    main_sampler = RayPoolSampler(scene.train_frames, scene.num_semantic_classes)
    inst_sampler = InstanceBundleSampler(
        scene.train_frames, cfg.max_rays_instances, cfg.max_labels_per_image)
    seg_sampler = SegmentBundleSampler(scene.train_frames,
                                       cfg.max_rays_segments)

    all_gates = TrainGates(semantics_on=True, instances_on=True,
                           segments_on=True)
    phases = [
        # default config: train-time ESS for the stop-grad passes
        # (Config.ess_train_stride=8 — bounded-drift, conservative occupancy)
        # default since round 4 = fused_main_density ON (adopted: 2.283 ->
        # 3.462 steps/s on-chip; Config.fused_main_density)
        ("main", TrainGates(semantics_on=True), {}),
        # inverse A/B: direct 18-gather VM sampling (pre-r4 default)
        ("main+directvm", TrainGates(semantics_on=True),
         {"fused_main_density": False}),
        ("main+instance", TrainGates(semantics_on=True, instances_on=True), {}),
        ("main+instance+segment", all_gates, {}),
        # segment-phase remat chunk A/B: 4096 is the 16 GB-safe default
        # (three [chunk*S,256] backward activations); 8192 halves the
        # lax.map trip count if it fits
        ("all+chunkseg8192", all_gates, {"chunk_segment": 8192}),
        # dense-parity mode: exact reference sampling for the aux passes
        ("all+ess_off", all_gates, {"ess_train_stride": 0}),
        # train-time top-k head compaction at k=64 — representative of what
        # the Trainer's per-stage auto-calibration (Config.
        # head_topk_train_auto, default on) picks on a carved field: k =
        # max above-threshold count + margin, exact while counts stay <= k
        # (this bench's random-init field is nearly empty, so calibrating
        # in-bench would pick an unrepresentatively small k)
        ("all+topk64", all_gates, {"head_topk": 64}),
        # phase-attribution rows at the SAME topk64 operating point as the
        # recorded full-step metric: the deltas main -> +instance -> +segment
        # locate the wall (r5: the segment stream's 2M-sample MLP chain)
        ("main+topk64", TrainGates(semantics_on=True), {"head_topk": 64}),
        ("main+instance+topk64",
         TrainGates(semantics_on=True, instances_on=True), {"head_topk": 64}),
    ]
    params_host = jax.tree.map(np.asarray, params)  # train steps donate state
    for name, gates, mods in phases:
        params = jax.tree.map(jax.numpy.asarray, params_host)
        state = init_train_state(cfg, params)
        cfg_p = (dataclasses.replace(cfg, **{k: v for k, v in mods.items()
                                             if k != "head_topk"})
                 if mods else cfg)
        rcfg_p = (dataclasses.replace(rcfg, head_topk=mods["head_topk"])
                  if "head_topk" in mods else rcfg)
        step = make_train_step(cfg_p, mcfg, rcfg_p, gates, weights, params)
        bm = main_sampler.sample(nrng, cfg.batch_size)
        bi = (inst_sampler.sample(nrng, cfg.batch_size_contrastive)
              if gates.instances_on else None)
        bs = (seg_sampler.sample(nrng, cfg.batch_size_segments)
              if gates.segments_on else None)
        state, metrics = step(state, state_r, bm, bi, bs,
                              jax.random.PRNGKey(0), 1.0, 0.001)
        float(metrics["loss_main"])  # compile + sync
        n_iters = int(os.environ.get("BENCH_ITERS", 0)) or 5
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, metrics = step(state, state_r, bm, bi, bs,
                                  jax.random.PRNGKey(i + 1), 1.0, 0.001)
        float(metrics["loss_main"])  # host fetch = true synchronization
        dt = (time.perf_counter() - t0) / n_iters
        line = {"metric": f"train_steps_per_sec[{name}]",
                "value": round(1.0 / dt, 3), "unit": "steps/s",
                "seconds_per_step": round(dt, 4)}
        if name == "main+instance+segment":
            # pinned same-host reference full-step baseline: 0.081 steps/s
            # on one CPU core at identical batch/stream shapes
            # (tools/bench_reference_cpu.py --train, BASELINE.md)
            line["vs_cpu_core_baseline"] = round(1.0 / dt / 0.081, 1)
        print(json.dumps(line))


def _train_full_step_rate():
    """Full 3-phase production train step rate — the driver-visible train
    metric (VERDICT r3 #5: training throughput must reach the recorded bench,
    not live only behind ``--train``). Operating point = bench_train's
    ``all+topk64`` phase: 128^3 grid, all gates on, head_topk 64 (what the
    Trainer's per-stage auto-calibration picks on carved fields,
    Config.head_topk_train_auto). Returns (steps_per_sec, seconds_per_step)."""
    import os

    import jax
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.data.base import (InstanceBundleSampler,
                                                RayPoolSampler,
                                                SegmentBundleSampler)
    from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
    from contrastive_lift_tpu.factory import build_model, class_weights_for
    from contrastive_lift_tpu.train.state import init_train_state
    from contrastive_lift_tpu.train.step import TrainGates, make_train_step

    grid = int(os.environ.get("BENCH_GRID", 128))
    cfg = Config(batch_size=2048, min_grid_dim=grid, max_grid_dim=grid,
                 max_instances=3, instance_loss_mode="slow_fast",
                 use_DINO_style=True, batch_size_contrastive=1,
                 max_rays_instances=1024, batch_size_segments=32,
                 max_rays_segments=1024, precision="bf16",
                 seed=0).resolve_epochs()
    scene = make_synthetic_scene(num_spheres=3, num_train=4, num_val=1,
                                 image_dim=(64, 64), seed=0)
    mcfg, params, rcfg, state_r = build_model(
        cfg, scene.num_semantic_classes, scene.scene_bounds, (grid,) * 3)
    rcfg = dataclasses.replace(rcfg, head_topk=64)
    weights = class_weights_for(cfg, scene.segmentation)
    nrng = np.random.default_rng(0)
    bm = RayPoolSampler(scene.train_frames,
                        scene.num_semantic_classes).sample(nrng, cfg.batch_size)
    bi = InstanceBundleSampler(scene.train_frames, cfg.max_rays_instances,
                               cfg.max_labels_per_image).sample(
                                   nrng, cfg.batch_size_contrastive)
    bs = SegmentBundleSampler(scene.train_frames, cfg.max_rays_segments).sample(
        nrng, cfg.batch_size_segments)
    gates = TrainGates(semantics_on=True, instances_on=True, segments_on=True)
    state = init_train_state(cfg, params)
    step = make_train_step(cfg, mcfg, rcfg, gates, weights, params)
    state, metrics = step(state, state_r, bm, bi, bs,
                          jax.random.PRNGKey(0), 1.0, 0.001)
    float(metrics["loss_main"])  # compile + sync
    n_iters = int(os.environ.get("BENCH_ITERS", 0)) or 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, state_r, bm, bi, bs,
                              jax.random.PRNGKey(i + 1), 1.0, 0.001)
    float(metrics["loss_main"])  # host fetch = true synchronization
    dt = (time.perf_counter() - t0) / n_iters
    return round(1.0 / dt, 3), round(dt, 4)


# the committed reference-scale e2e checkpoint (tools/run_reference_scale_e2e
# on chip, round 5: 64 train views at 64x96, checker_freq 18 — the first
# committed field whose RAW PQ^scene is non-zero on both sides of the
# fidelity gate, artifacts/e2e_r5b_tpu/FIDELITY_PQ_k*.json); when present
# the driver line also records the trained-field render rate so the
# recorded bench covers BOTH operating regimes (VERDICT r3 #3:
# analytic-shell occupancy must not flatter ESS)
DEFAULT_TRAINED_CKPT = "artifacts/e2e_r5b_tpu/checkpoints/final.npz"

# pinned scene-calibration results (see _calibrated): calibrate_budgets is
# deterministic given (field, probe rays, config), and its probe pass is one
# of the two big remote-TPU compiles per regime — pinning its adjudicated
# output halves the bench's compile wall so the driver's run records ALL
# regimes within its time budget. The pins are validated two ways: the
# fingerprint must match the live config exactly (else live calibration runs
# and refreshes the file), and the run itself still measures budget_tail /
# head_tail at the pinned point — a stale pin surfaces as a visible tail.
PIN_PATH = "artifacts/bench_budgets.json"
_PIN_FIELDS = ("max_segments", "max_subsegments", "max_subsegments_light",
               "term_first", "term_fraction", "head_term_first",
               "head_term_fraction")


def _calibrated(mcfg, rcfg, state_r, rays, fused, regime: str, fp_extra: dict,
                termination: bool, tail_eps: float, head_term: bool,
                head_tail_eps: float = 2e-3):
    """calibrate_budgets with a committed memo: returns (rcfg', pinned)."""
    import dataclasses as _dc
    import json as _json
    import os

    from contrastive_lift_tpu.renderer import render as R
    # calib_v: bump when calibrate_budgets' ALGORITHM changes (the other
    # fields fingerprint its inputs, not its code) — v2 = masked head_term
    # tail mass (advisor r4)
    fp = {"calib_v": 2,
          "regime": regime, "n_samples": int(rcfg.n_samples),
          "coarse_stride": rcfg.coarse_stride, "sub_stride": rcfg.sub_stride,
          "pre_max_segments": int(rcfg.max_segments),
          "pre_max_subsegments": int(rcfg.max_subsegments),
          "head_topk": rcfg.head_topk, "head_topk_semins": rcfg.head_topk_semins,
          "use_l1": bool(rcfg.use_l1), "termination": bool(termination),
          "tail_eps": float(tail_eps), "head_term": bool(head_term),
          "head_tail_eps": float(head_tail_eps),
          "chunk": int(rays.shape[0])}
    if getattr(rcfg, "head_select", "sort") == "rank":
        # only fingerprinted for "rank" (the one mode whose head_term
        # calibration differs — "iter" is an exact top-k implementation
        # swap) so the committed default pins stay valid
        fp["head_select"] = "rank"
    fp.update(fp_extra)
    # key by regime + fingerprint hash so off-default runs (smoke grids,
    # flag A/Bs) pin alongside the production entries instead of clobbering
    import hashlib
    key = f"{regime}-" + hashlib.md5(
        _json.dumps(fp, sort_keys=True).encode()).hexdigest()[:10]
    pins = {}
    if os.path.exists(PIN_PATH):
        try:
            with open(PIN_PATH) as f:
                pins = _json.load(f)
        except (OSError, ValueError):
            pins = {}
    ent = pins.get(key)
    if (ent and ent.get("fingerprint") == fp
            and not os.environ.get("BENCH_RECALIBRATE")):
        return _dc.replace(rcfg, **ent["budgets"]), True
    out = R.calibrate_budgets(mcfg, rcfg, state_r, rays, fused,
                              termination=termination, tail_eps=tail_eps,
                              head_term=head_term,
                              head_tail_eps=head_tail_eps)
    budgets = {}
    for k in _PIN_FIELDS:
        v = getattr(out, k)
        budgets[k] = float(v) if isinstance(v, float) else int(v)
    pins[key] = {"fingerprint": fp, "budgets": budgets}
    try:
        os.makedirs(os.path.dirname(PIN_PATH), exist_ok=True)
        with open(PIN_PATH, "w") as f:
            _json.dump(pins, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: live calibration still returned
    return out, False


def _measure_render(chunk: int = 8192, use_l1: bool = True, pack: int = 1,
                    termination: bool = False, group: int = 1,
                    sub_stride: int = 8, coarse_stride: int = 16,
                    ckpt: str = None, tail_eps: float = 0.0,
                    head_term: bool = False, k2: int = 12,
                    head_tail_eps: float = 2e-3, k: int = 24,
                    head_select: str = "sort",
                    fine_span: int = 0, atlas_bf16: bool = False) -> dict:
    import os

    import jax
    _honor_platform_env()
    import jax.numpy as jnp

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import build_model
    from contrastive_lift_tpu.ops.fused_grid import build_render_grids
    from contrastive_lift_tpu.renderer import render as R

    if ckpt is not None:
        # --ckpt: bench on a TRAINED field instead of the analytic shells
        # (VERDICT r3 #3 — the recorded rays/s must hold on fields whose
        # occupancy statistics come from real optimization, not a synthetic
        # geometry that may flatter ESS). The checkpoint is expected from
        # tools/run_reference_scale_e2e.py (its deterministic synthetic scene
        # is regenerated for real camera rays); any io/checkpoint.py npz with
        # the default flagship config works.
        import sys as _sys
        from pathlib import Path as _Path
        _sys.path.insert(0, str(_Path(__file__).resolve().parent))
        from contrastive_lift_tpu.inference.render import \
            load_model_for_inference
        from tools.pq_fidelity_gate import e2e_config, e2e_scene
        scene = e2e_scene()
        cfg = e2e_config()
        params, mcfg, rcfg, state_r, meta = load_model_for_inference(
            ckpt, cfg, scene.num_semantic_classes, step_ratio=0.25,
            head_topk=k)
        # the TRAINED regime benches at k=24/k2 with TAIL COMPLETION
        # (RenderConfig.head_tail_complete) — the PQ^scene gate PASSES there
        # (artifacts/e2e_r4_tpu/FIDELITY_PQ_bench_point.json: |delta PQ
        # masked| 0.01 pt, rgb p99 8.3e-3). Without completion this k=24
        # point FAILED the gate (rgb p99 0.058, |delta| 0.7 pt — the trained
        # field's fuzzy surfaces spread weight past k=24) and the regime had
        # to bench at the auto k=64 point (292.8k rays/s); completion
        # renormalizes by the exact dropped above-threshold mass, collapsing
        # the truncation error at zero measurable cost
        # (tools/pq_fidelity_gate.py --head_topk 24 --k2 8).
        rcfg = dataclasses.replace(
            rcfg, head_dtype="bfloat16", head_tail_complete=True,
            head_topk_semins=k2,
            coarse_stride=coarse_stride, max_segments=32,
            sub_stride=sub_stride, max_subsegments=48 * 8 // sub_stride)
        rng = np.random.default_rng(0)
        cam_rays = np.concatenate(
            [f.rays for f in scene.val_frames]).astype(np.float32)
        sel = rng.permutation(cam_rays.shape[0])
        n_rays = chunk * group
        rays_all = cam_rays[np.resize(sel, n_rays)]
        fused = build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                   feature_dtype=jnp.bfloat16,
                                   feature_cells_per_row=pack,
                                   atlas_dtype=(jnp.bfloat16 if atlas_bf16
                                                else jnp.float32))
        metric_name = "render_rays_per_sec_per_chip_trained"
    else:
        fused = None  # built below from the analytic field
        metric_name = "render_rays_per_sec_per_chip"

    if ckpt is None:
        # BENCH_GRID/BENCH_ITERS: smoke-test overrides ONLY (CI/CPU validation
        # of the full bench code path at a small grid) — the recorded
        # benchmark is the 192^3 default
        grid = int(os.environ.get("BENCH_GRID", 192))
        # default chunk 8192: measured fastest pre-bucketing (16k: 327k
        # rays/s, 8k: 350k) and re-confirmed at the round-5 k=8 operating
        # point (16k: analytic 808.2k / trained 948.6k vs 8k: 811.5k /
        # 984.8k — larger chunks lose ~4% on the trained field's budget
        # head-room); re-sweep with --chunk after balance-point changes
        cfg = Config(min_grid_dim=grid, max_grid_dim=grid, max_instances=3,
                     instance_loss_mode="slow_fast", use_DINO_style=True,
                     chunk=chunk, seed=0, precision="bf16").resolve_epochs()
        num_classes = 21
        mcfg, params, rcfg, state_r = build_model(
            cfg, num_classes, step_ratio=0.25)  # inference: 2x samples
        # k: appearance head top-k — same adoption story as the trained
        # regime (round 5: k=8 holds analytic fidelity flat under tail
        # completion, ANALYTIC_FIDELITY_SWEEP_k.jsonl; 617k vs 481k rays/s)
        rcfg = dataclasses.replace(rcfg, head_topk=k, head_topk_semins=k2,
                                   head_dtype="bfloat16",
                                   head_tail_complete=True,
                                   coarse_stride=coarse_stride,
                                   max_segments=32, sub_stride=sub_stride,
                                   # pre-calibration cap scales with sub count
                                   # per segment (48 at the default stride 8)
                                   max_subsegments=48 * 8 // sub_stride)

        # indoor-like analytic density field (see module docstring)
        lin = jnp.linspace(-1, 1, grid)
        X, Y, Z = jnp.meshgrid(lin, lin, lin, indexing="ij")
        r = jnp.sqrt(X**2 + Y**2 + Z**2)
        th = 1.5 * 2.0 / grid
        surf = ((jnp.abs(r - 0.35) < th) | (jnp.abs(r - 0.65) < th)
                | ((Z < -0.9) & (jnp.sqrt(X**2 + Y**2) < 0.7)))
        dense = jnp.where(surf, 14.0, 0.0).astype(jnp.float32)

        rng = np.random.default_rng(0)
        n_rays = chunk * group
        origins = rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
        dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rays_all = np.concatenate([
            origins, dirs, np.full((n_rays, 1), 0.01, np.float32),
            np.full((n_rays, 1), 1.5, np.float32)], axis=-1)

        fused = build_render_grids(params, mcfg, rcfg, state_r, compact=True,
                                   feature_dtype=jnp.bfloat16,
                                   dense_override=dense,
                                   feature_cells_per_row=pack,
                                   atlas_dtype=(jnp.bfloat16 if atlas_bf16
                                                else jnp.float32))
    rays = jax.device_put(rays_all[:chunk])
    if not use_l1:
        # A/B: L2-only flat grouped-bit selection (RenderConfig.use_l1)
        rcfg = dataclasses.replace(rcfg, use_l1=False)
    if head_select != "sort":
        # A/B: head selection mode (RenderConfig.head_select; bench
        # `--head-select iter|rank`): "iter" = exact top-k via argmax
        # passes (no [R,S] sort), "rank" = nearest-k above threshold. Set
        # BEFORE calibration so the head_term split mirrors the selection.
        rcfg = dataclasses.replace(rcfg, head_select=head_select)
    if fine_span:
        # A/B: span gathers (`--fine-span 4`) — fine_span_rows atlas rows
        # per sub-segment instead of one per sample; an exact implementation
        # swap (validated below), so calibration pins are unchanged
        rcfg = dataclasses.replace(rcfg, fine_span_rows=fine_span)
        R.validate_fine_span(rcfg, state_r)
    # scene-adaptive segment budgets, exactly as inference/render.py does:
    # size max_segments/max_subsegments at the 99.9th-percentile occupied
    # counts of a ray probe (kills budget truncation on dense scenes, speeds
    # up sparse ones)
    # grouped occupancy tests (one 5^3-neighborhood row per ~5 L1 tests /
    # per segment's L2 tests) — derived from the step geometry
    rcfg = R.occ_grouping_for(rcfg, state_r)
    regime = "trained" if ckpt is not None else "analytic"
    fp_extra = {}
    if atlas_bf16:
        # bf16 atlas rounds the probe densities, so calibrated budgets may
        # differ — pin separately (`--atlas-dtype bfloat16`; adoption needs
        # the PQ gate at this dtype first)
        fp_extra["atlas"] = "bf16"
    if ckpt is not None:
        # pin by checkpoint CONTENT, not just path: a regenerated final.npz
        # must invalidate the pinned budgets (advisor r4 — a stale pin would
        # bias the recorded headline without necessarily tripping the tells)
        import hashlib as _hl
        h = _hl.md5()
        with open(ckpt, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                h.update(blk)
        fp_extra = {"ckpt": ckpt, "ckpt_md5": h.hexdigest()}
    rcfg, pinned = _calibrated(mcfg, rcfg, state_r, rays, fused, regime,
                               fp_extra, termination, tail_eps, head_term,
                               head_tail_eps)
    if group > 1:
        # grouped dispatch: G chunks of identical per-chunk compute per
        # device call — amortizes the ~1.2 ms remote-tunnel dispatch cost
        # G-fold. Uses the SAME jitted program as production inference so
        # the A/B measures what render_frames ships.
        from contrastive_lift_tpu.inference.render import \
            _jitted_render_group
        gfn = _jitted_render_group(mcfg, rcfg)
        fn = lambda p, f, rg: gfn(p, f, state_r, rg)
        rays = jax.device_put(rays_all.reshape(group, chunk, -1))
        out_sel = lambda o: o["rgb"][0, 0, 0]
    else:
        fn = jax.jit(lambda p, f, r: R.render_rays(p, mcfg, rcfg, state_r, r,
                                                   None, False, fused=f))
        out_sel = lambda o: o["rgb"][0, 0]
    out = fn(params, fused, rays)
    float(out_sel(out))  # compile + sync

    n_iters = int(os.environ.get("BENCH_ITERS", 0)) or max(1, 40 // group)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, fused, rays)
    float(out_sel(out))  # host fetch = true synchronization
    dt = time.perf_counter() - t0

    rays_per_sec = n_iters * group * chunk / dt
    result = {
        "metric": metric_name,
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
        # truncation guardrails at the measured operating point (see
        # renderer/render.py budget_tail/head_tail): ~0 = no ray was clipped
        # by the calibrated ESS budgets or the top-k head compaction
        "budget_tail": round(float(jnp.max(out["budget_tail"])), 6),
        "head_tail": round(float(jnp.max(out["head_tail"])), 6),
        # calibrated operating point (what calibrate_budgets actually chose)
        "budgets": [rcfg.max_segments, rcfg.max_subsegments,
                    rcfg.max_subsegments_light, rcfg.term_first,
                    round(rcfg.term_fraction, 3), rcfg.head_term_first,
                    round(rcfg.head_term_fraction, 3)],
        # True = budgets came from the committed pin (artifacts/
        # bench_budgets.json); the tails above are still measured live
        "budgets_pinned": pinned,
    }
    return result


def main(chunk: int = 8192, use_l1: bool = True, pack: int = 1,
         termination: bool = False, group: int = 1, sub_stride: int = 8,
         coarse_stride: int = 16, ckpt: str = None, tail_eps: float = 0.0,
         train_metric: bool = True, head_term: bool = False,
         trained_metric: bool = True, k2: int = 12,
         head_tail_eps: float = 2e-3, trained_hterm_eps: float = None,
         trained_k: int = 8, head_select: str = "sort",
         fine_span: int = 0, atlas_bf16: bool = False):
    import gc
    import os
    import signal
    import time as _time

    # self-bounding: the driver runs `python bench.py` under an unknown
    # wall-clock budget, and remote-TPU compiles dominate the runtime. The
    # ANALYTIC metric (the r1-r4 headline series) is measured first and is
    # the contract; the trained-regime and train-step metrics follow, each
    # gated on the remaining budget (with a recorded skip reason), so one
    # slow compile can never cost the whole recorded line. After the first
    # phase lands, a SIGALRM print-guard guarantees the partial line reaches
    # stdout even if a later phase's remote compile hangs (tunnel outages
    # present as indefinite blocks, CLAUDE.md). The pinned calibrations
    # (artifacts/bench_budgets.json) remove one big compile per regime so
    # all three phases normally fit the default budget.
    t_start = _time.monotonic()
    soft_budget = float(os.environ.get("BENCH_TIME_BUDGET", 600.0))

    # EARLY guard — armed before the first jax op. When the axon tunnel is
    # down, backend init blocks the process indefinitely (CLAUDE.md), which
    # would leave the driver artifact EMPTY. A diagnosable error line beats
    # silence; cleared the moment phase 1 returns.
    def _early_guard(sig, frm):
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip", "value": 0.0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "error": "backend_init_or_compile_timeout",
            "detail": "no phase completed within 1.5x BENCH_TIME_BUDGET; "
                      "remote-TPU tunnel likely down (axon backend init "
                      "blocks the first jax op indefinitely)",
            "bench_wall_s": round(_time.monotonic() - t_start, 1),
        }), flush=True)
        os._exit(0)

    signal.signal(signal.SIGALRM, _early_guard)
    signal.alarm(int(soft_budget * 1.5))

    result = _measure_render(chunk, use_l1, pack, termination, group,
                             sub_stride, coarse_stride, ckpt, tail_eps,
                             head_term, k2, head_tail_eps, k=trained_k,
                             head_select=head_select, fine_span=fine_span,
                             atlas_bf16=atlas_bf16)
    gc.collect()  # the 192^3 render tables are locals of _measure_render
    t1 = _time.monotonic() - t_start
    result["analytic_wall_s"] = round(t1, 1)

    def _guard(sig, frm):  # later-phase hang: flush what we have and exit
        result.setdefault("guard_fired", "later_phase_timeout")
        print(json.dumps(result), flush=True)
        os._exit(0)

    signal.signal(signal.SIGALRM, _guard)
    signal.alarm(max(120, int(soft_budget * 1.5 - t1)))

    # BENCH_GRID marks a small-grid smoke run (CLAUDE.md recipe): it only
    # rescales the ANALYTIC regime, so the full-scale trained phase would
    # dominate a CPU smoke run — skip it there.
    if (trained_metric and ckpt is None and "BENCH_GRID" not in os.environ
            and os.path.exists(DEFAULT_TRAINED_CKPT)):
        # second operating regime in the SAME driver line: the committed
        # reference-scale trained field at its PQ-gated production operating
        # point (real optimization statistics — the cross-check VERDICT r3
        # #3 asked for). Cost ~= the analytic phase (same compile
        # structure), hence the 0.9*t1 gate.
        if _time.monotonic() - t_start + 0.9 * t1 < soft_budget:
            try:
                t2_start = _time.monotonic()
                tr = _measure_render(chunk, use_l1, pack, termination, group,
                                     sub_stride, coarse_stride,
                                     DEFAULT_TRAINED_CKPT, tail_eps,
                                     head_term, k2,
                                     trained_hterm_eps if trained_hterm_eps
                                     is not None else head_tail_eps,
                                     k=trained_k, head_select=head_select,
                                     fine_span=fine_span,
                                     atlas_bf16=atlas_bf16)
                result["trained_wall_s"] = round(
                    _time.monotonic() - t2_start, 1)
                result["trained_field_rays_per_sec"] = tr["value"]
                result["trained_vs_baseline"] = tr["vs_baseline"]
                result["trained_budget_tail"] = tr["budget_tail"]
                result["trained_head_tail"] = tr["head_tail"]
                result["trained_budgets"] = tr["budgets"]
            except Exception as e:  # the headline must still be recorded
                result["trained_error"] = f"{type(e).__name__}: {e}"[:200]
            gc.collect()
        else:
            result["trained_skipped"] = "time_budget"
    elif trained_metric and ckpt is None:
        result["trained_skipped"] = ("smoke_grid"
                                     if "BENCH_GRID" in os.environ
                                     else "checkpoint_missing")
    # train-step phase cost = one train-step compile (~170 s measured on
    # chip) + a few timed steps
    if train_metric and (_time.monotonic() - t_start) + 200.0 >= soft_budget:
        result["train_skipped"] = "time_budget"
        train_metric = False
    if train_metric:
        try:
            tps, spt = _train_full_step_rate()
            result["train_steps_per_sec"] = tps
            result["train_seconds_per_step"] = spt
            # pinned same-host reference full-step baseline: 0.081 steps/s
            # on one CPU core at identical batch/stream shapes
            # (tools/bench_reference_cpu.py --train, BASELINE.md)
            result["train_vs_cpu_core_baseline"] = round(tps / 0.081, 1)
        except Exception as e:  # the render metric must still be recorded
            result["train_error"] = f"{type(e).__name__}: {e}"[:200]
    signal.alarm(0)
    result["bench_wall_s"] = round(_time.monotonic() - t_start, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--train" in sys.argv:
        bench_train()
    else:
        chunk_arg = 8192
        if "--chunk" in sys.argv:
            chunk_arg = int(sys.argv[sys.argv.index("--chunk") + 1])
        pack_arg = 1
        if "--pack" in sys.argv:
            pack_arg = int(sys.argv[sys.argv.index("--pack") + 1])
        # group4 amortizes the ~1.2 ms remote-dispatch cost (neutral-positive
        # on chip, r4 sweep); production default since round 4
        group_arg = 4
        if "--group" in sys.argv:
            group_arg = int(sys.argv[sys.argv.index("--group") + 1])
        sub_arg = 8
        if "--sub" in sys.argv:
            sub_arg = int(sys.argv[sys.argv.index("--sub") + 1])
        cs_arg = 16
        if "--cs" in sys.argv:
            cs_arg = int(sys.argv[sys.argv.index("--cs") + 1])
        ckpt_arg = None
        if "--ckpt" in sys.argv:
            ckpt_arg = sys.argv[sys.argv.index("--ckpt") + 1]
        te_arg = 0.0
        if "--tail-eps" in sys.argv:
            te_arg = float(sys.argv[sys.argv.index("--tail-eps") + 1])
        # sem/ins head top-k (a prefix of the head_topk sort). Default 8
        # since round 4: the on-chip fidelity sweep measured k2=8
        # byte-identical to k2=12 on every probe metric of the analytic
        # field (rgb p99 5.4e-3, 0% argmax mismatch, same head_tail) at
        # +3-5% throughput (analytic 477->499k). Applies to BOTH regimes
        # since tail completion landed: the trained regime's k=24/k2=8
        # point passes the PQ gate with completion (FIDELITY_PQ_bench_point).
        k2_arg = 8
        if "--k2" in sys.argv:
            k2_arg = int(sys.argv[sys.argv.index("--k2") + 1])
        # two-phase head mass bound (calibrate_budgets head_tail_eps);
        # --trained-hterm-eps overrides it for the TRAINED regime only —
        # candidate points must pass tools/pq_fidelity_gate.py first
        hte_arg = 2e-3
        if "--hterm-eps" in sys.argv:
            hte_arg = float(sys.argv[sys.argv.index("--hterm-eps") + 1])
        thte_arg = None
        if "--trained-hterm-eps" in sys.argv:
            thte_arg = float(
                sys.argv[sys.argv.index("--trained-hterm-eps") + 1])
        # appearance head top-k for BOTH regimes. Default 8 since round 5:
        # smallest k passing the PQ gate on all three committed trained
        # checkpoints AND the analytic --r5 fidelity sweep (rgb p99 0.0013,
        # 0% argmax mismatch, +28% vs k=24) — PERFORMANCE.md "Round-5
        # adjudication". Candidate values must pass
        # tools/pq_fidelity_gate.py --head_topk <k> first (completion on).
        tk_arg = 8
        if "--trained-k" in sys.argv:
            tk_arg = int(sys.argv[sys.argv.index("--trained-k") + 1])
        # round-4 adopted defaults (PERFORMANCE.md "Round-4 on-chip A/B"):
        # two-phase termination ON (+8.6%), grouped dispatch 4, head_term
        # calibration ON (fires only where the probe proves >=15% head
        # saving — a no-op on the analytic field, active on trained fields),
        # L2-only selection ON (--l1 restores the segment cascade; the flat
        # grouped-bit test is both faster — 479.9k vs 466.4k in the r4
        # sweep — and strictly more accurate: no segment-budget truncation)
        main(chunk_arg, use_l1="--l1" in sys.argv, pack=pack_arg,
             termination="--no-term" not in sys.argv, group=group_arg,
             sub_stride=sub_arg, coarse_stride=cs_arg, ckpt=ckpt_arg,
             tail_eps=te_arg,
             train_metric="--no-train-metric" not in sys.argv,
             head_term="--no-hterm" not in sys.argv,
             trained_metric="--no-trained-metric" not in sys.argv,
             k2=k2_arg, head_tail_eps=hte_arg, trained_hterm_eps=thte_arg,
             trained_k=tk_arg,
             # A/B: head selection mode in both regimes ("iter" = exact
             # top-k via argmax passes, "rank" = nearest-k above threshold)
             # — adoption waits on the chip A/B (+ PQ gate for "rank")
             head_select=(sys.argv[sys.argv.index("--head-select") + 1]
                          if "--head-select" in sys.argv else "sort"),
             # A/B: span gathers (RenderConfig.fine_span_rows) — exact
             # implementation swap, validated host-side before tracing
             fine_span=(int(sys.argv[sys.argv.index("--fine-span") + 1])
                        if "--fine-span" in sys.argv else 0),
             # A/B: bf16 brick atlas in both regimes (PQ-gate before adopt)
             atlas_bf16=("--atlas-dtype" in sys.argv and sys.argv[
                 sys.argv.index("--atlas-dtype") + 1] == "bfloat16"))
