"""Folder evaluation: PanopLi (png GT) and MOS (npy GT) layouts."""
import numpy as np
import pytest

from contrastive_lift_tpu.inference.evaluate import (
    calculate_panoptic_quality_per_frame_folders, evaluate_folders)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_pair(root, exp, mos: bool, n=3, hw=(16, 16)):
    rng = np.random.default_rng(0)
    gt_sem_dir = root / ("semantic" if mos else "rs_semantics")
    gt_inst_dir = root / ("instance" if mos else "rs_instance")
    for d in (gt_sem_dir, gt_inst_dir, exp / "pred_semantics",
              exp / "pred_surrogateid"):
        d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        sem = rng.integers(0, 2, hw).astype(np.int64)
        inst = rng.integers(0, 4, hw).astype(np.int64)
        name = f"{i:04d}"
        if mos:
            np.save(gt_sem_dir / f"{name}.npy", sem)
            np.save(gt_inst_dir / f"{name}.npy", inst)
        else:
            Image.fromarray(sem.astype(np.uint8)).save(gt_sem_dir / f"{name}.png")
            Image.fromarray(inst.astype(np.uint8)).save(gt_inst_dir / f"{name}.png")
        Image.fromarray(sem.astype(np.uint8)).save(
            exp / "pred_semantics" / f"{name}.png")
        Image.fromarray(inst.astype(np.uint16)).save(
            exp / "pred_surrogateid" / f"{name}.png")


def test_evaluate_folders_panopli_layout(tmp_path):
    root, exp = tmp_path / "scene", tmp_path / "pred"
    _write_pair(root, exp, mos=False)
    m = evaluate_folders(exp, root, things={1}, stuff={0}, image_size=(16, 16))
    assert m["pq"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(1.0)


def test_evaluate_folders_mos_layout(tmp_path):
    root, exp = tmp_path / "scene", tmp_path / "pred"
    _write_pair(root, exp, mos=True)
    m = evaluate_folders(exp, root, things={1}, stuff={0}, image_size=(16, 16))
    assert m["pq"] == pytest.approx(1.0)


def test_mos_background_errors_are_counted(tmp_path):
    """MOS layout: class 0 is a real class — wrong predictions on background
    pixels must hurt the metrics (reference evaluates with an all-valid mask,
    preprocess_scannet.py:708-732). Guards the round-1 inflation bug where
    pred[target==0]=0 made background predictions always perfect."""
    root, exp = tmp_path / "scene", tmp_path / "pred"
    hw = (16, 16)
    for d in (root / "semantic", root / "instance",
              exp / "pred_semantics", exp / "pred_surrogateid"):
        d.mkdir(parents=True)
    sem = np.zeros(hw, np.int64)
    sem[:8] = 1  # top half foreground
    inst = np.where(sem == 1, 1, 0).astype(np.int64)
    np.save(root / "semantic" / "0000.npy", sem)
    np.save(root / "instance" / "0000.npy", inst)
    # prediction: everything foreground — background entirely wrong
    Image.fromarray(np.ones(hw, np.uint8)).save(
        exp / "pred_semantics" / "0000.png")
    Image.fromarray(np.ones(hw, np.uint16)).save(
        exp / "pred_surrogateid" / "0000.png")
    m = evaluate_folders(exp, root, things={1}, stuff={0}, image_size=hw)
    assert m["iou"] < 0.9  # bg IoU 0, fg IoU 0.5 -> miou 0.25
    assert m["pq"] < 0.9


def test_panopli_faulty_pixels_are_dropped(tmp_path):
    """PanopLi layout: GT class 0 pixels are dropped entirely, so arbitrary
    predictions there must not change the metrics (reference valid_mask,
    preprocess_scannet.py:628-634,693-704)."""
    root, exp = tmp_path / "scene", tmp_path / "pred"
    hw = (16, 16)
    for d in (root / "rs_semantics", root / "rs_instance",
              exp / "pred_semantics", exp / "pred_surrogateid"):
        d.mkdir(parents=True)
    sem = np.zeros(hw, np.int64)
    sem[:8] = 1
    sem[8:] = 0  # faulty region
    inst = np.where(sem == 1, 1, 0).astype(np.int64)
    Image.fromarray(sem.astype(np.uint8)).save(root / "rs_semantics" / "0000.png")
    Image.fromarray(inst.astype(np.uint8)).save(root / "rs_instance" / "0000.png")
    # prediction: correct on valid pixels, garbage on faulty pixels
    pred_sem = sem.copy()
    pred_sem[8:] = 7
    pred_inst = inst.copy()
    pred_inst[8:] = 9
    Image.fromarray(pred_sem.astype(np.uint8)).save(
        exp / "pred_semantics" / "0000.png")
    Image.fromarray(pred_inst.astype(np.uint16)).save(
        exp / "pred_surrogateid" / "0000.png")
    m = evaluate_folders(exp, root, things={1}, stuff={0}, image_size=hw)
    assert m["pq"] == pytest.approx(1.0)
    assert m["iou"] == pytest.approx(1.0)


def test_per_frame_pq_folders(tmp_path):
    root, exp = tmp_path / "scene", tmp_path / "pred"
    _write_pair(root, exp, mos=False)
    pq, sq, rq = calculate_panoptic_quality_per_frame_folders(
        exp / "pred_semantics", exp / "pred_surrogateid",
        root / "rs_semantics", root / "rs_instance",
        {1}, {0}, image_size=(16, 16))
    assert pq == pytest.approx(1.0)
