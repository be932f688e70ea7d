"""Preprocessing: common utilities, sens parsing, generic converter round-trip."""
import io
import struct
import zlib

import numpy as np
import pytest

from contrastive_lift_tpu.data.preprocessing.common import (
    SceneWriter, blur_score, fold_semantics, renumber_instances,
    select_keyframes)
from contrastive_lift_tpu.data.preprocessing.sens_reader import (iter_frames,
                                                                 read_header)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_blur_score_orders_sharpness():
    rng = np.random.default_rng(0)
    sharp = rng.uniform(0, 255, (32, 32))          # white noise = very sharp
    blurry = np.ones((32, 32)) * 128               # constant = no gradients
    assert blur_score(sharp) > blur_score(blurry)


def test_select_keyframes():
    scores = [1, 5, 2, 9, 0, 3, 7, 1]
    assert select_keyframes(scores, window=4) == [3, 6]


def test_fold_semantics():
    labels = np.array([0, 3, 7, 12, 99])
    mapping = {3: 1, 7: 2, 12: 1}
    out = fold_semantics(labels, mapping)
    np.testing.assert_array_equal(out, [0, 1, 2, 1, 0])


def test_renumber_instances_consistent_ids():
    sem = [np.array([[1, 1], [0, 2]]), np.array([[1, 2], [2, 0]])]
    inst = [np.array([[5, 5], [0, 9]]), np.array([[5, 9], [9, 0]])]
    new, inst_to_sem = renumber_instances(inst, sem, thing_classes={1, 2})
    # same (raw_id, class) pair keeps the same new id across frames
    assert new[0][0, 0] == new[1][0, 0]
    assert new[0][1, 1] == new[1][0, 1]
    assert inst_to_sem[int(new[0][0, 0])] == 1
    assert inst_to_sem[int(new[0][1, 1])] == 2


def _write_fake_sens(path, num_frames=6, chw=(16, 20)):
    h, w = chw
    buf = io.BytesIO()
    buf.write(struct.pack("I", 4))
    name = b"fake"
    buf.write(struct.pack("Q", len(name)))
    buf.write(name)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    for mat in (intr, np.eye(4, dtype=np.float32), intr, np.eye(4, dtype=np.float32)):
        buf.write(np.asarray(mat, np.float32).tobytes())
    buf.write(struct.pack("i", 2))   # jpeg color
    buf.write(struct.pack("i", 1))   # zlib depth
    buf.write(struct.pack("IIII", w, h, w, h))
    buf.write(struct.pack("f", 1000.0))
    buf.write(struct.pack("Q", num_frames))
    rng = np.random.default_rng(0)
    for i in range(num_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = i * 0.1
        buf.write(pose.tobytes())
        buf.write(struct.pack("QQ", i, i))
        img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        jpg = io.BytesIO()
        img.save(jpg, format="JPEG")
        color = jpg.getvalue()
        depth = zlib.compress(
            (rng.uniform(500, 3000, (h, w)).astype(np.uint16)).tobytes())
        buf.write(struct.pack("QQ", len(color), len(depth)))
        buf.write(color)
        buf.write(depth)
    path.write_bytes(buf.getvalue())


def test_sens_reader_roundtrip(tmp_path):
    path = tmp_path / "scene.sens"
    _write_fake_sens(path)
    with open(path, "rb") as f:
        header = read_header(f)
    assert header.num_frames == 6
    assert header.color_compression == "jpeg"
    frames = list(iter_frames(path, frame_skip=2))
    assert len(frames) == 3
    idx, hdr, frame = frames[1]
    assert idx == 2
    np.testing.assert_allclose(frame.camera_to_world[0, 3], 0.2, atol=1e-6)
    rgb = frame.color_image()
    assert rgb.shape == (16, 20, 3)
    depth = frame.depth_image(hdr)
    assert depth.shape == (16, 20)
    assert 0.4 < depth.mean() < 3.5  # meters


def test_generic_preprocess_roundtrip(tmp_path):
    """frames+poses -> common layout -> PanopLiSceneReader reads it back."""
    from contrastive_lift_tpu.data.panopli import PanopLiSceneReader
    from contrastive_lift_tpu.data.preprocessing.generic import preprocess_generic
    rng = np.random.default_rng(1)
    raw = tmp_path / "raw"
    (raw / "frames").mkdir(parents=True)
    (raw / "poses").mkdir()
    (raw / "sem").mkdir()
    (raw / "inst").mkdir()
    h, w = 20, 24
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            raw / "frames" / f"{i}.png")
        pose = np.eye(4)
        angle = 2 * np.pi * i / 5
        pose[:3, 3] = [2 * np.cos(angle), 2 * np.sin(angle), 1]
        np.savetxt(raw / "poses" / f"{i}.txt", pose)
        Image.fromarray(rng.integers(0, 3, (h, w)).astype(np.uint8)).save(
            raw / "sem" / f"{i}.png")
        Image.fromarray(rng.integers(0, 4, (h, w)).astype(np.uint8)).save(
            raw / "inst" / f"{i}.png")
    intr = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
    np.savetxt(raw / "intrinsics.txt", intr)

    out = tmp_path / "scene"
    info = preprocess_generic(raw / "frames", raw / "poses",
                              raw / "intrinsics.txt", out,
                              gt_semantics_dir=raw / "sem",
                              gt_instance_dir=raw / "inst",
                              num_classes=3, thing_classes=[1, 2])
    assert info["frames"] == 5
    reader = PanopLiSceneReader(out, (16, 16), max_depth=5.0)
    scene = reader.load_scene()
    assert len(scene.train_frames) == 4
    assert len(scene.val_frames) == 1
    assert scene.num_semantic_classes == 3
    assert scene.val_frames[0].gt_semantics is not None


def test_scene_writer_mos_independence(tmp_path):
    writer = SceneWriter(tmp_path / "s")
    rng = np.random.default_rng(2)
    writer.add_frame("0", rng.integers(0, 255, (8, 8, 3), dtype=np.uint8),
                     np.eye(4), np.zeros((8, 8), np.uint8),
                     np.zeros((8, 8), np.uint8),
                     np.zeros((8, 8, 2), np.float32),
                     np.ones((8, 8), np.float32))
    writer.write_intrinsics(np.eye(4))
    writer.write_splits(["0"], [])
    writer.write_segmentation_data([1], [0], {0: 0})
    assert (tmp_path / "s" / "segmentation_data.pkl").exists()
