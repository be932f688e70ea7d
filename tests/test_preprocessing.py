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


# ---------------------------------------------------------------------------
# Raw Mask2Former panoptic dump -> m2f_* conversion (reference
# map_panoptic_coco, preprocess_scannet.py:429-517)
# ---------------------------------------------------------------------------

def _write_m2f_fixture(scene, names, fmt="npz"):
    """Tiny raw-panoptic fixture: seg 0 = no prediction (invalid), wall
    (stuff, class 1), two chairs (thing, class 5 'chair' in the reduced set).
    """
    import gzip
    import json as _json
    dumps = scene / "panoptic"
    dumps.mkdir(parents=True)
    for fi, name in enumerate(names):
        mask = np.zeros((8, 8), np.int32)
        mask[0:4, :] = 7          # wall segment
        mask[4:8, 0:4] = 9        # chair A
        mask[5:8, 5:8] = 12       # chair B
        segments = [
            {"id": 7, "category_id": 1, "category_name": "wall-brick"},
            {"id": 9, "category_id": 5, "category_name": "chair"},
            {"id": 12, "category_id": 5, "category_name": "chair"},
        ]
        probs = np.full((8, 8, 6), 1 / 6, np.float32)
        conf = np.full((8, 8), 0.9, np.float32)
        conf_nt = np.full((8, 8), 0.8, np.float32)
        if fmt == "npz":
            np.savez_compressed(
                dumps / f"{name}.npz", mask=mask, mask_notta=mask,
                segments=_json.dumps(segments),
                segments_notta=_json.dumps(segments),
                probabilities=probs, confidences=conf,
                confidences_notta=conf_nt)
        else:
            import torch
            data = {"mask": torch.from_numpy(mask),
                    "mask_notta": torch.from_numpy(mask),
                    "segments": segments, "segments_notta": segments,
                    "probabilities": torch.from_numpy(probs),
                    "confidences": torch.from_numpy(conf),
                    "confidences_notta": torch.from_numpy(conf_nt)}
            with gzip.open(dumps / f"{name}.ptz", "wb") as f:
                torch.save(data, f)
    return dumps


@pytest.mark.parametrize("fmt", ["npz", "ptz"])
def test_map_panoptic_outputs_roundtrip(tmp_path, fmt):
    from PIL import Image
    from contrastive_lift_tpu.data.preprocessing import m2f

    scene = tmp_path / "scene"
    names = ["0000", "0001"]
    _write_m2f_fixture(scene, names, fmt)
    tables = m2f.map_panoptic_outputs(scene, frame_names=names)

    sem = np.array(Image.open(scene / "m2f_semantics" / "0000.png"))
    inst0 = np.array(Image.open(scene / "m2f_instance" / "0000.png"))
    inst1 = np.array(Image.open(scene / "m2f_instance" / "0001.png"))
    inv = np.array(Image.open(scene / "m2f_invalid" / "0000.png"))
    segm0 = np.array(Image.open(scene / "m2f_segments" / "0000.png"))
    segm1 = np.array(Image.open(scene / "m2f_segments" / "0001.png"))

    assert sem[0, 0] == 1 and sem[5, 1] == 5 and sem[6, 6] == 5
    assert sem[4, 4] == 0                       # unlabeled pixel -> void
    # wall is stuff -> instance 0; chairs get scene-wide ids 1..4
    assert inst0[0, 0] == 0
    assert inst0[5, 1] == 1 and inst0[6, 6] == 2
    assert inst1[5, 1] == 3 and inst1[6, 6] == 4
    assert tables["m2f_instance_to_semantic"] == {1: 5, 2: 5, 3: 5, 4: 5}
    # invalid marks only prediction-free pixels
    assert inv[4, 4] == 255 and inv[0, 0] == 0
    # 2D segment ids are scene-wide unique
    assert segm0.max() == 3 and segm1.min() in (0, 4) and segm1.max() == 6
    # probabilities npz keeps the reference keys
    npz = np.load(scene / "m2f_probabilities" / "0000.npz")
    assert set(npz.files) >= {"probability", "confidence", "confidence_notta"}
    # segmentation_data.pkl got the instance->semantic table
    import pickle
    pkl = pickle.loads((scene / "segmentation_data.pkl").read_bytes())
    assert pkl["m2f_instance_to_semantic"] == {1: 5, 2: 5, 3: 5, 4: 5}


def test_map_panoptic_coco_name_remap(tmp_path):
    """COCO category names fold through the shipped csv: 'wall-brick' -> wall
    (class 1), 'chair' -> chair (class 5, thing)."""
    from PIL import Image
    from contrastive_lift_tpu.data.preprocessing import m2f

    mapping = m2f.load_coco_to_scannet()
    assert mapping["wall-brick"] == 1
    assert mapping["chair"] == 5
    flags = m2f.load_thing_flags()
    assert flags[0] is False and flags[5] is True   # void, chair
    names = m2f.load_class_names()
    assert names[0] == "void" and names[5] == "chair"

    scene = tmp_path / "scene"
    _write_m2f_fixture(scene, ["0000"])
    # corrupt category_id to prove the remap path uses names, not ids
    import json as _json
    npz = np.load(scene / "panoptic" / "0000.npz", allow_pickle=False)
    segs = _json.loads(str(npz["segments"]))
    for s in segs:
        s["category_id"] = 999
    np.savez_compressed(
        scene / "panoptic" / "0000.npz", mask=npz["mask"],
        mask_notta=npz["mask_notta"], segments=_json.dumps(segs),
        segments_notta=_json.dumps(segs), probabilities=npz["probabilities"],
        confidences=npz["confidences"],
        confidences_notta=npz["confidences_notta"])
    m2f.map_panoptic_outputs(scene, use_coco_remap=True,
                             frame_names=["0000"])
    sem = np.array(Image.open(scene / "m2f_semantics" / "0000.png"))
    assert sem[0, 0] == 1 and sem[5, 1] == 5


def test_dmnerf_export_matches_reference_loop(tmp_path):
    """Vectorized dm-nerf combined-mask export equals the reference's
    per-class masking loop (preprocess_scannet.py:839-855) on a mixed
    stuff/thing frame, and the full driver writes the expected artifacts."""
    from contrastive_lift_tpu.data.preprocessing.exports import (
        create_instances_for_dmnerf, dmnerf_instance_map, write_replica_traj,
        export_for_semantic_nerf)
    from contrastive_lift_tpu.data.preprocessing.m2f import load_thing_flags

    rng = np.random.default_rng(0)
    thing_flags = load_thing_flags()
    stuff_classes = [i for i, t in enumerate(thing_flags) if not t]
    thing_classes = [i for i, t in enumerate(thing_flags) if t]
    sem = rng.choice(stuff_classes[:4] + thing_classes[:3], (16, 20))
    inst = np.where(np.isin(sem, thing_classes), rng.integers(1, 5, (16, 20)),
                    0)

    # reference-style oracle loop
    want = np.zeros_like(inst)
    for c in np.unique(sem):
        if c in stuff_classes:
            want[sem == c] = stuff_classes.index(c)
        else:
            for u in np.unique(inst[sem == c]):
                if u != 0:
                    want[inst == u] = len(stuff_classes) + u
    i2s = {}
    got = dmnerf_instance_map(sem, inst, stuff_classes, i2s)
    np.testing.assert_array_equal(got, want)
    for u in np.unique(inst[inst != 0]):
        assert (len(stuff_classes) + int(u)) in i2s

    # driver + companion exports on a tiny scene layout
    scene = tmp_path / "scene"
    for sub in ("m2f_notta_semantics", "m2f_notta_instance", "color", "pose",
                "intrinsic"):
        (scene / sub).mkdir(parents=True)
    for i in range(3):
        Image.fromarray(sem.astype(np.uint8)).save(
            scene / "m2f_notta_semantics" / f"{i}.png")
        Image.fromarray(inst.astype(np.uint8)).save(
            scene / "m2f_notta_instance" / f"{i}.png")
        Image.fromarray(np.zeros((16, 20, 3), np.uint8)).save(
            scene / "color" / f"{i}.jpg")
        np.savetxt(scene / "pose" / f"{i}.txt", np.eye(4))
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", np.eye(4))
    (scene / "splits.json").write_text('{"train": ["0", "1"], "val": ["2"]}')

    out = create_instances_for_dmnerf(scene)
    assert len(list(out.iterdir())) == 3
    assert (scene / "dmnerf_i2s_no_correspondences.pkl").exists()
    traj = write_replica_traj(scene)
    rows = traj.read_text().strip().splitlines()
    assert len(rows) == 3 and len(rows[0].split()) == 16
    sn = export_for_semantic_nerf(scene, tmp_path / "sn" / "Sequence_1")
    assert (sn / "rgb" / "0000.jpg").exists()
    assert (sn / "traj_w_c.txt").exists()
    import json as _json
    assert _json.loads((sn / "splits.json").read_text())["train"] == ["0000",
                                                                     "0001"]


def test_bbox_importers_roundtrip(tmp_path):
    """GT + mmdet 3D-box ingestion into segmentation_data.pkl
    (reference preprocess_scannet.py:519-592): thing filter, 1-based
    instance ids, per-call annotation fixes, min/max corner reduction,
    and the editor-consumable schema."""
    import pickle

    from contrastive_lift_tpu.data.preprocessing.bboxes import (
        import_gt_bboxes, import_mmdet_bboxes)
    from contrastive_lift_tpu.data.preprocessing.common import SceneWriter
    from contrastive_lift_tpu.data.preprocessing.m2f import load_class_names

    scene = tmp_path / "s"
    writer = SceneWriter(scene)
    writer.write_segmentation_data([4, 5], [0, 1], {1: 4})

    names = load_class_names()
    chair, sofa, wall = names.index("chair"), names.index("sofa"), 1

    # raw label ids 40/41/50 fold via the mapping; 99 is unknown -> void;
    # the id fix overrides instance 3's raw label (reference :533-535)
    raw_to_reduced = {40: chair, 41: wall, 50: sofa}
    annot = np.array([
        [0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 40, 0],   # chair (thing) - kept
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 41, 1],   # wall (stuff) - dropped
        [2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 99, 2],   # unknown -> void - dropped
        [3.0, 3.0, 3.0, 1.0, 1.0, 1.0, 41, 3],   # fixed to 50 -> sofa - kept
    ], np.float32)
    np.save(tmp_path / "scene_bbox.npy", annot)
    boxes = import_gt_bboxes(tmp_path / "scene_bbox.npy", scene,
                             raw_to_reduced, object_id_fixes={4: 50},
                             visualize=True)
    assert [b["class"] for b in boxes.values()] == [chair, sofa]
    np.testing.assert_allclose(boxes[0]["extent"], [1, 2, 3])
    assert (scene / "visualized_gtboxes" / f"{chair}_0.obj").exists()
    pkl = pickle.loads((scene / "segmentation_data.pkl").read_bytes())
    assert set(pkl["gt_bboxes"]) == {0, 1}
    assert pkl["fg_classes"] == [4, 5]  # existing keys preserved

    # mmdet: corners -> min/max box; stuff ('picture'->otherprop) dropped;
    # the export fix (pure translation) is inverted before reduction
    corners = (np.array([[sx, sy, sz] for sx in (0, 2) for sy in (0, 4)
                         for sz in (0, 6)], np.float64) + [10, 10, 10])
    dets = [{"corners": corners.tolist(), "label": "chair"},
            {"corners": corners.tolist(), "label": "picture"}]
    import json as _json
    (tmp_path / "dets.json").write_text(_json.dumps(dets))
    boxes_m = import_mmdet_bboxes(tmp_path / "dets.json", scene,
                                  export_fix={"translation": [10, 10, 10]})
    assert len(boxes_m) == 1 and boxes_m[0]["class"] == chair
    np.testing.assert_allclose(boxes_m[0]["position"], [1, 2, 3])
    np.testing.assert_allclose(boxes_m[0]["extent"], [2, 4, 6])
    pkl = pickle.loads((scene / "segmentation_data.pkl").read_bytes())
    assert set(pkl["mmdet_bboxes"]) == {0}

    # the stored schema feeds the scene editor directly
    from contrastive_lift_tpu.renderer.editing import points_in_oriented_box
    import jax.numpy as jnp
    inside = points_in_oriented_box(jnp.asarray([[1.0, 2.0, 3.0],
                                                 [9.0, 9.0, 9.0]]),
                                    boxes_m[0]["extent"],
                                    boxes_m[0]["position"],
                                    boxes_m[0]["orientation"])
    assert inside.tolist() == [True, False]


def test_hypersim_preprocess_roundtrip(tmp_path):
    """HyperSim HDF5 capture -> common layout (reference
    preprocess_hypersim.py): tonemap, pose assembly (orientation flip +
    meters-per-unit scale), NYU40 thing split, and scene-wide renumbered
    instance ids that exceed 255 must widen, not wrap."""
    h5py = pytest.importorskip("h5py")
    from contrastive_lift_tpu.data.panopli import PanopLiSceneReader
    from contrastive_lift_tpu.data.preprocessing.hypersim import (
        preprocess_hypersim)

    rng = np.random.default_rng(3)
    scene = tmp_path / "ai_001_001"
    img_dir = scene / "images" / "scene_cam_00_final_hdf5"
    geo_dir = scene / "images" / "scene_cam_00_geometry_hdf5"
    detail = scene / "_detail" / "cam_00"
    for d in (img_dir, geo_dir, detail):
        d.mkdir(parents=True)
    h, w, n = 12, 16, 5
    for fid in range(n):
        with h5py.File(img_dir / f"frame.{fid:04d}.color.hdf5", "w") as f:
            f["dataset"] = rng.uniform(0, 4, (h, w, 3)).astype(np.float32)
        sem = np.full((h, w), 1, np.int16)        # wall (stuff)
        sem[4:, 4:] = 5                           # chair (NYU40 thing)
        inst = np.zeros((h, w), np.int32)
        inst[4:, 4:] = 300 + fid                  # raw ids past uint8
        with h5py.File(geo_dir / f"frame.{fid:04d}.semantic.hdf5", "w") as f:
            f["dataset"] = sem
        with h5py.File(geo_dir / f"frame.{fid:04d}.semantic_instance.hdf5",
                       "w") as f:
            f["dataset"] = inst
    with h5py.File(detail / "camera_keyframe_positions.hdf5", "w") as f:
        f["dataset"] = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    orients = np.stack([np.eye(3, dtype=np.float32)] * n)
    with h5py.File(detail / "camera_keyframe_orientations.hdf5", "w") as f:
        f["dataset"] = orients
    (scene / "_detail" / "metadata_scene.csv").write_text(
        "parameter_name,parameter_value\nmeters_per_asset_unit,0.5\n")

    out = tmp_path / "converted"
    info = preprocess_hypersim(scene, out, image_hw=(h, w))
    assert info["frames"] == n
    # renumbered GT instance ids must round-trip past uint8
    ids = np.asarray(Image.open(out / "rs_instance" / "0000.png"))
    assert ids.max() >= 1  # renumbered densely from 1
    raw = np.asarray(Image.open(out / "m2f_instance" / "0000.png"))
    assert raw.max() == 300  # raw id preserved, not 300 % 256 == 44

    reader = PanopLiSceneReader(out, (h, w), max_depth=5.0)
    sc = reader.load_scene()
    assert sc.num_semantic_classes == 41
    assert len(sc.train_frames) == 4 and len(sc.val_frames) == 1
    # pose scale applied: translations are half the raw asset units
    assert np.isfinite(sc.train_frames[0].cam2normscene).all()


def test_generic_preprocess_wide_instance_ids(tmp_path):
    """Scenes with >255 GT instances must survive the renumbered rs_instance
    write (review r3: the generic/Replica path still uint8-wrapped after the
    SceneWriter fix; ids 256+ fused into 0/1...)."""
    from contrastive_lift_tpu.data.preprocessing.generic import (
        preprocess_generic)
    rng = np.random.default_rng(5)
    raw = tmp_path / "raw"
    for sub in ("frames", "poses", "sem", "inst"):
        (raw / sub).mkdir(parents=True)
    h, w = 18, 20
    n_inst = 300  # > uint8
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            raw / "frames" / f"{i}.png")
        np.savetxt(raw / "poses" / f"{i}.txt", np.eye(4))
        sem = np.ones((h, w), np.int32)  # all thing class 1
        # every pixel its own instance id, 1..360 (shared across frames)
        inst = (np.arange(h * w, dtype=np.int32).reshape(h, w) % n_inst) + 1
        Image.fromarray(sem).save(raw / "sem" / f"{i}.png")
        Image.fromarray(inst).save(raw / "inst" / f"{i}.png")
    np.savetxt(raw / "intrinsics.txt",
               np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]]))
    out = tmp_path / "scene"
    preprocess_generic(raw / "frames", raw / "poses", raw / "intrinsics.txt",
                       out, gt_semantics_dir=raw / "sem",
                       gt_instance_dir=raw / "inst", num_classes=2,
                       thing_classes=[1])
    ids0 = np.asarray(Image.open(out / "rs_instance" / "0.png"))
    ids1 = np.asarray(Image.open(out / "rs_instance" / "1.png"))
    assert int(ids0.max()) == n_inst  # renumbered densely 1..300, no wrap
    # the same raw id keeps the same renumbered id across frames
    np.testing.assert_array_equal(ids0, ids1)
