"""Round-trip tests: write fake PanopLi / MOS scenes to disk, read them back."""
import json
import pickle

import numpy as np
import pytest

from contrastive_lift_tpu.data.mos import (MOSSceneReader, quaternion_to_rotation,
                                           read_mos_cameras)
from contrastive_lift_tpu.data.panopli import PanopLiSceneReader

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_panopli_scene(root, n_frames=4, hw=(24, 32), num_classes=4):
    rng = np.random.default_rng(0)
    h, w = hw
    for sub in ("color", "pose", "intrinsic", "m2f_semantics", "m2f_instance",
                "m2f_probabilities", "m2f_segments", "rs_semantics", "rs_instance"):
        (root / sub).mkdir(parents=True)
    intr = np.array([[30.0, 0, w / 2, 0], [0, 30.0, h / 2, 0],
                     [0, 0, 1, 0], [0, 0, 0, 1]])
    (root / "intrinsic" / "intrinsic_color.txt").write_text(
        "\n".join(" ".join(str(v) for v in row) for row in intr))
    names = [str(i) for i in range(n_frames)]
    for i, name in enumerate(names):
        angle = 2 * np.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [2 * np.cos(angle), 2 * np.sin(angle), 1.0]
        (root / "pose" / f"{name}.txt").write_text(
            "\n".join(" ".join(str(v) for v in row) for row in c2w))
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(root / "color" / f"{name}.jpg")
        sem = rng.integers(0, num_classes, (h, w)).astype(np.uint8)
        inst = rng.integers(0, 5, (h, w)).astype(np.uint8)
        Image.fromarray(sem).save(root / "m2f_semantics" / f"{name}.png")
        Image.fromarray(inst).save(root / "m2f_instance" / f"{name}.png")
        Image.fromarray(sem).save(root / "rs_semantics" / f"{name}.png")
        Image.fromarray(inst).save(root / "rs_instance" / f"{name}.png")
        Image.fromarray(inst).save(root / "m2f_segments" / f"{name}.png")
        probs = rng.dirichlet(np.ones(num_classes), (h, w)).astype(np.float32)
        conf = rng.uniform(0.5, 1, (h, w)).astype(np.float32)
        np.savez(root / "m2f_probabilities" / f"{name}.npz",
                 probability=probs, confidence=conf)
    (root / "splits.json").write_text(json.dumps(
        {"train": names[:3], "test": names[3:]}))
    pickle.dump({"fg_classes": [1, 2, 3], "bg_classes": [0],
                 "m2f_instance_to_semantic": {1: 1}},
                open(root / "segmentation_data.pkl", "wb"))


def test_panopli_reader_roundtrip(tmp_path):
    _write_panopli_scene(tmp_path)
    reader = PanopLiSceneReader(tmp_path, (16, 20), max_depth=4.0)
    scene = reader.load_scene()
    assert len(scene.train_frames) == 3
    assert len(scene.val_frames) == 1
    f = scene.train_frames[0]
    assert f.rays.shape == (16 * 20, 8)
    assert f.probabilities.shape == (16 * 20, 4)
    assert f.segments is not None
    assert scene.num_semantic_classes == 4
    assert scene.things_filtered == {1, 2, 3}
    # rays normalized: origins inside unit sphere, dirs unit, far = sphere exit
    assert np.all(np.linalg.norm(f.rays[:, :3], axis=-1) < 1.0)
    np.testing.assert_allclose(np.linalg.norm(f.rays[:, 3:6], axis=-1), 1.0,
                               atol=1e-5)
    exit_pts = f.rays[:, :3] + f.rays[:, 7:8] * f.rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(exit_pts, axis=-1), 1.0, atol=1e-4)
    v = scene.val_frames[0]
    assert v.gt_semantics is not None and v.gt_instances is not None


def _write_mos_scene(root, n_frames=5, hw=(20, 20)):
    rng = np.random.default_rng(1)
    h, w = hw
    for sub in ("color", "detic_semantic", "detic_instance",
                "detic_probabilities", "semantic", "instance"):
        (root / sub).mkdir(parents=True)
    positions, quaternions = [], []
    for i in range(n_frames):
        angle = 2 * np.pi * i / n_frames
        positions.append([3 * np.cos(angle), 3 * np.sin(angle), 1.5])
        quaternions.append([1.0, 0.0, 0.0, 0.0])
    meta = {"camera": {"K": [[0.9, 0, -0.5], [0, 0.9, -0.5], [0, 0, 1]],
                       "positions": positions, "quaternions": quaternions}}
    (root / "metadata.json").write_text(json.dumps(meta))
    for i in range(n_frames):
        name = str(i)
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(root / "color" / f"{name}.png")
        sem = rng.integers(0, 2, (h, w)).astype(np.int64)
        inst = rng.integers(0, 30, (h, w)).astype(np.int64)
        np.save(root / "detic_semantic" / f"{name}.npy", sem)
        np.save(root / "detic_instance" / f"{name}.npy", inst)
        np.save(root / "detic_probabilities" / f"{name}.npy",
                rng.uniform(0.2, 1, (h, w)).astype(np.float32))
        np.save(root / "semantic" / f"{name}.npy", sem)
        np.save(root / "instance" / f"{name}.npy", inst)


def test_mos_reader_roundtrip(tmp_path):
    _write_mos_scene(tmp_path)
    reader = MOSSceneReader(tmp_path, (16, 16), max_depth=8.0)
    scene = reader.load_scene()
    # deterministic last-20% split
    assert len(scene.val_frames) == 1
    assert scene.val_frames[0].name == "4"
    assert len(scene.train_frames) == 4
    f = scene.train_frames[0]
    assert scene.num_semantic_classes == 2
    assert scene.things_filtered == {1}
    # background confidence forced to 1.0 before resize
    sem0 = np.load(tmp_path / "detic_semantic" / "0.npy")
    assert f.confidences.shape == (16 * 16,)
    np.testing.assert_allclose(np.linalg.norm(f.rays[:, 3:6], axis=-1), 1.0,
                               atol=1e-5)
    exit_pts = f.rays[:, :3] + f.rays[:, 7:8] * f.rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(exit_pts, axis=-1), 1.0, atol=1e-4)


def test_quaternion_to_rotation():
    # 90 degrees about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = quaternion_to_rotation(q)
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    # identity
    np.testing.assert_allclose(quaternion_to_rotation([1, 0, 0, 0]), np.eye(3),
                               atol=1e-9)


def test_read_mos_cameras_scaling():
    meta = {"camera": {"K": [[0.5, 0, -0.5], [0, 0.5, -0.5], [0, 0, 1]],
                       "positions": [[0, 0, 0]],
                       "quaternions": [[1, 0, 0, 0]]}}
    K, poses = read_mos_cameras(meta, 100, 200)
    np.testing.assert_allclose(K[0, 0], 100.0)  # 0.5 * W
    np.testing.assert_allclose(K[1, 1], 50.0)   # 0.5 * H
    np.testing.assert_allclose(K[0, 2], 100.0)  # abs(-0.5 * W)
    # blender->opencv flips y/z axes of the rotation
    np.testing.assert_allclose(poses[0][:3, :3], np.diag([1.0, -1.0, -1.0]))
