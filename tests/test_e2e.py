"""End-to-end: train slow-fast on the synthetic scene -> render -> mean-shift
cluster -> PQ^scene against the analytic ground truth."""
import numpy as np
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene
from contrastive_lift_tpu.inference.cluster import (
    cluster, create_instances_from_semantics)
from contrastive_lift_tpu.inference.render import render_frames
from contrastive_lift_tpu.metrics.panoptic_quality import panoptic_quality
from contrastive_lift_tpu.train.loop import Trainer


@pytest.mark.slow
def test_train_render_cluster_pq(tmp_path):
    scene = make_synthetic_scene(num_spheres=3, num_train=10, num_val=3,
                                 image_dim=(32, 40), num_thing_classes=1, seed=3)
    cfg = Config(
        batch_size=512, chunk=1024, min_grid_dim=28, max_grid_dim=28,
        max_instances=3, instance_loss_mode="slow_fast", use_DINO_style=True,
        max_rays_instances=256, max_labels_per_image=8,
        batch_size_segments=8, max_rays_segments=64,
        late_semantic_optimization=0, instance_optimization_epoch=1,
        segment_optimization_epoch=2, max_epoch=4,
        bbox_aabb_reset_epochs=[], grid_upscale_epochs=[],
        lambda_dist_reg=0.0, image_dim=(32, 40), seed=0,
        save_every_n_train_steps=0, decay_step=[100],
        lr=2e-3,  # tiny scene + ~100 total steps: converge fast
        # class 0 is a REAL background class here (room shell), so it must
        # carry CE weight — same as the reference's MOS config
        # (weight_class_0: 1.0). The default softmax-composite-log CE pathway
        # needs thousands of steps; for this ~100-step test use the
        # reference's raw-logit mode (semantic_weight_mode: none) and a
        # stronger semantic weight.
        weight_class_0=1.0, lambda_semantics=1.0, semantic_weight_mode="none",
        probabilistic_ce_mode="NoTTAConf",
        # xyz-MLP heads (the paper default) have strong spectral bias and need
        # the reference's ~100k-step budget; this 100-step test uses the
        # grid-branch semantic head (use_mlp_for_semantics=False — the
        # reference's 'allgrid'/'instGRIDsemMLP' configs) which learns locally,
        # and PE on the instance head
        use_mlp_for_semantics=False, pe_ins=4,
        # depth supervision pins the geometry in the tiny step budget (at this
        # model-capacity/pixel ratio pure RGB admits memorization optima that
        # real-scale training escapes statistically)
        lambda_depth=0.5,
    ).resolve_epochs()

    trainer = Trainer(cfg, scene, tmp_path / "run", log_every=1000)
    for epoch in range(cfg.max_epoch):
        trainer.train_epoch(epoch)
    val = trainer.validate(cfg.max_epoch)
    assert val["psnr"] > 17, val
    assert val["iou"] > 0.8, val

    # inference at 2x samples on the val frames
    per_frame = render_frames(trainer.state.params, trainer.mcfg, trainer.rcfg,
                              trainer.state_r, scene.val_frames, chunk=2048)
    sem_cat = np.concatenate([f["semantics"] for f in per_frame])
    inst_cat = np.concatenate([f["instances"] for f in per_frame])
    fast = inst_cat[:, :cfg.max_instances]
    thing_features = create_instances_from_semantics(
        fast, sem_cat, scene.segmentation.fg_classes)
    onehot = cluster(thing_features, bandwidth=0.15,
                     num_images=len(scene.val_frames))

    # PQ^scene: concatenate all val frames
    preds, targets = [], []
    for i, frame in enumerate(scene.val_frames):
        sem_pred = per_frame[i]["semantics"].argmax(-1)
        inst_pred = np.asarray(onehot[i]).argmax(-1)
        preds.append(np.stack([sem_pred, inst_pred], -1))
        targets.append(np.stack([frame.gt_semantics, frame.gt_instances], -1))
    pq, sq, rq = panoptic_quality(
        np.concatenate(preds), np.concatenate(targets),
        set(scene.segmentation.fg_classes), {0},
        allow_unknown_preds_category=True)
    # the synthetic scene is easy; the full pipeline should segment it well
    assert pq > 0.35, (pq, sq, rq)
    # cross-view consistency is the point: number of discovered objects should
    # be close to the true count (3 spheres + background channel)
    num_found = len(np.unique(np.concatenate(
        [np.asarray(onehot[i]).argmax(-1) for i in range(len(scene.val_frames))])))
    assert 2 <= num_found <= 6, num_found
