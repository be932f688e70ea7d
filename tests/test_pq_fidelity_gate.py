"""Metric-level fidelity gate of the production fast path (VERDICT r3 #4).

Trains the tiny-but-real e2e field, checkpoints it, reloads through the
production inference loader, and asserts PQ^scene(fast path) stays within
the BASELINE.json accuracy bar (0.5 pt) of PQ^scene(dense fp32) — the
map-level error probes in PERFORMANCE.md bound this only indirectly.
Reference metric: preprocess_scannet.py:685-705.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.train.loop import Trainer


@pytest.mark.slow
def test_fast_path_pq_within_gate(tmp_path):
    from tools.pq_fidelity_gate import run_gate

    # the test_e2e recipe: small grid-branch-semantics field that actually
    # converges in ~100 steps (see tests/test_e2e.py for the why of each knob)
    scene = make_synthetic_scene(num_spheres=3, num_train=10, num_val=3,
                                 image_dim=(32, 40), num_thing_classes=1,
                                 seed=3)
    cfg = Config(
        batch_size=512, chunk=1024, min_grid_dim=28, max_grid_dim=28,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        max_rays_instances=256, max_labels_per_image=8,
        batch_size_segments=8, max_rays_segments=64,
        late_semantic_optimization=0, instance_optimization_epoch=1,
        segment_optimization_epoch=2, max_epoch=4,
        bbox_aabb_reset_epochs=[], grid_upscale_epochs=[],
        lambda_dist_reg=0.0, image_dim=(32, 40), seed=0,
        save_every_n_train_steps=0, decay_step=[100], lr=2e-3,
        weight_class_0=1.0, lambda_semantics=1.0, semantic_weight_mode="none",
        probabilistic_ce_mode="NoTTAConf",
        use_mlp_for_semantics=False, pe_ins=4, lambda_depth=0.5,
    ).resolve_epochs()

    trainer = Trainer(cfg, scene, tmp_path / "run", log_every=1000)
    for epoch in range(cfg.max_epoch):
        trainer.train_epoch(epoch)
    trainer.save("final", cfg.max_epoch - 1)

    # reload through the PRODUCTION inference loader (2x samples, auto top-k)
    from contrastive_lift_tpu.inference.render import load_model_for_inference
    params, mcfg, rcfg, state_r, meta = load_model_for_inference(
        tmp_path / "run" / "checkpoints" / "final.npz", cfg,
        scene.num_semantic_classes, step_ratio=0.25)

    result = run_gate(params, mcfg, rcfg, state_r, scene, cfg.max_instances,
                      bandwidth=0.15, gate=0.005, chunk=1024)
    assert result["pass"], result
    # the map-level errors should also sit at calibration scale
    assert result["rgb_p99_err"] < 0.03, result
    assert result["sem_argmax_mismatch"] < 0.01, result
