"""Full CLI integration: synthetic scene -> common layout on disk -> train CLI
-> render CLI (cluster + artifacts) -> evaluate CLI (PQ^scene)."""
import json
from pathlib import Path

import numpy as np
import pytest

from contrastive_lift_tpu.data.preprocessing.common import SceneWriter
from contrastive_lift_tpu.data.synthetic import make_synthetic_scene

PIL = pytest.importorskip("PIL")


def _write_scene_to_disk(root: Path, image_dim=(24, 32)):
    """Serialize a synthetic SceneData into the PanopLi on-disk layout."""
    scene = make_synthetic_scene(num_spheres=3, num_train=8, num_val=2,
                                 image_dim=image_dim, num_thing_classes=1,
                                 seed=21)
    writer = SceneWriter(root)
    h, w = image_dim
    intr4 = np.eye(4)
    intr4[:3, :3] = scene.train_frames[0].intrinsics
    writer.write_intrinsics(intr4)
    names = []
    for frame in scene.train_frames + scene.val_frames:
        writer.add_frame(
            frame.name, (frame.rgbs.reshape(h, w, 3) * 255).astype(np.uint8),
            frame.cam2normscene,
            frame.semantics.reshape(h, w), frame.instances.reshape(h, w),
            frame.probabilities.reshape(h, w, -1),
            frame.confidences.reshape(h, w),
            gt_semantics=frame.gt_semantics.reshape(h, w),
            gt_instance=frame.gt_instances.reshape(h, w),
            segments=frame.instances.reshape(h, w),
            invalid=~frame.mask.reshape(h, w))
        names.append(frame.name)
    writer.write_splits(names[:8], names[8:])
    writer.write_segmentation_data(scene.segmentation.fg_classes, [0],
                                   scene.segmentation.instance_to_semantics)
    return scene


@pytest.mark.slow
def test_cli_train_render_evaluate(tmp_path):
    from contrastive_lift_tpu.cli import evaluate as evaluate_cli
    from contrastive_lift_tpu.cli import render as render_cli
    from contrastive_lift_tpu.cli import train as train_cli

    data_root = tmp_path / "scene"
    _write_scene_to_disk(data_root)

    runs = tmp_path / "runs"
    train_cli.main([
        "--runs-dir", str(runs),
        "dataset_class=panopli", f"dataset_root={data_root}",
        "image_dim=[24, 32]", "batch_size=256", "chunk=512",
        "min_grid_dim=20", "max_grid_dim=20", "max_instances=3",
        "instance_loss_mode=slow_fast", "use_DINO_style=true",
        "max_rays_instances=128", "max_labels_per_image=8",
        "batch_size_segments=4", "max_rays_segments=32",
        "late_semantic_optimization=0", "instance_optimization_epoch=1",
        "segment_optimization_epoch=1", "max_epoch=2",
        "bbox_aabb_reset_epochs=[]", "grid_upscale_epochs=[]",
        "weight_class_0=1.0", "semantic_weight_mode=none",
        "probabilistic_ce_mode=NoTTAConf", "use_mlp_for_semantics=false",
        "lr=0.002", "save_every_n_train_steps=0", "seed=0",
        "lambda_dist_reg=0.0",
    ])
    run_dir = next(runs.iterdir())
    ckpt = run_dir / "checkpoints" / "last.npz"
    assert ckpt.exists()
    assert (run_dir / "config.json").exists()
    assert (run_dir / "code.zip").exists()

    out_dir = tmp_path / "render_out"
    render_cli.main([
        "--ckpt_path", str(ckpt), "--image_dim", "24", "32",
        "--bandwidth", "0.15", "--output_dir", str(out_dir),
        "--chunk", "1024",
    ])
    assert (out_dir / "instance_features.npy").exists()
    assert (out_dir / "thing_features.npy").exists()
    assert (out_dir / "slow_features.npy").exists()
    sem_pngs = list((out_dir / "pred_semantics").iterdir())
    assert len(sem_pngs) == 2
    assert len(list((out_dir / "pred_surrogateid").iterdir())) == 2
    # uint16 surrogate ids (reference artifact contract)
    from PIL import Image
    img = Image.open(next((out_dir / "pred_surrogateid").iterdir()))
    assert img.mode in ("I", "I;16")

    evaluate_cli.main([
        "--root_path", str(data_root), "--exp_path", str(out_dir),
        "--image_size", "24", "32",
    ])
    metrics = (out_dir / "metrics.txt").read_text()
    assert "pq:" in metrics

    # legacy argmax-channel render CLI (reference render_panopli_original.py)
    from contrastive_lift_tpu.cli import render_legacy as legacy_cli
    legacy_out = tmp_path / "legacy_out"
    legacy_cli.main([
        "--ckpt_path", str(ckpt), "--image_dim", "24", "32",
        "--output_dir", str(legacy_out), "--chunk", "1024",
    ])
    assert len(list((legacy_out / "pred_semantics").iterdir())) == 2
    assert len(list((legacy_out / "pred_surrogateid").iterdir())) == 2
    img = Image.open(next((legacy_out / "pred_surrogateid").iterdir()))
    assert np.asarray(img).max() < 3  # argmax over max_instances channels

    # trajectory variant: renders a spherical orbit instead of the test split
    traj_out = tmp_path / "legacy_traj"
    legacy_cli.main([
        "--ckpt_path", str(ckpt), "--image_dim", "24", "32",
        "--output_dir", str(traj_out), "--chunk", "1024",
        "--render_trajectory", "--trajectory_frames", "3",
    ])
    assert len(list((traj_out / "pred_semantics").iterdir())) == 3

    # bandwidth-sweep CLI main (reference find_bandwidth.py)
    from contrastive_lift_tpu.cli import find_bandwidth as bw_cli
    bw_out = tmp_path / "bw_out"
    bw_cli.main([
        "--ckpt_path", str(ckpt), "--image_dim", "24", "32",
        "--output_dir", str(bw_out), "--chunk", "1024",
    ])
    assert (bw_out / "all_thing_features_train.npy").exists()
