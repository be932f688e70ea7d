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


def test_per_frame_pq_folders(tmp_path):
    root, exp = tmp_path / "scene", tmp_path / "pred"
    _write_pair(root, exp, mos=False)
    pq, sq, rq = calculate_panoptic_quality_per_frame_folders(
        exp / "pred_semantics", exp / "pred_surrogateid",
        root / "rs_semantics", root / "rs_instance",
        {1}, {0}, image_size=(16, 16))
    assert pq == pytest.approx(1.0)
