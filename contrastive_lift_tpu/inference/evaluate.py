"""Offline evaluation: folder-vs-folder mIoU + PQ^scene.

The reference's headline metric is PQ^scene: predictions and GT of ALL test
frames are concatenated into one tensor before a single PQ computation, so
instance ids must be consistent across views (reference:
dataset/preprocessing/preprocess_scannet.py:685-732, inference/evaluate.py:14-37).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Set, Tuple

import numpy as np

from ..metrics.metrics import ConfusionMatrix
from ..metrics.panoptic_quality import panoptic_quality


def _load_label_png(path, image_size: Tuple[int, int]) -> np.ndarray:
    """Label map from png (predictions / PanopLi GT) or npy (MOS GT —
    reference preprocess_scannet.py:708-732 reads detic/GT npy files)."""
    from PIL import Image
    path = Path(path)
    if not path.exists() and path.with_suffix(".npy").exists():
        path = path.with_suffix(".npy")
    if path.suffix == ".npy":
        arr = np.load(path)
        img = Image.fromarray(arr.astype(np.int32), mode="I")
    else:
        img = Image.open(path)
    if img.size != (image_size[1], image_size[0]):
        img = img.resize((image_size[1], image_size[0]), Image.NEAREST)
    return np.array(img).astype(np.int64)


def calculate_iou_folders(path_pred: Path, path_target: Path,
                          image_size=(512, 512), num_classes: int = 256,
                          ignore_class=(0,)) -> float:
    """mIoU over matching PNG names; class 0 + non-robust classes ignored.

    Reference: preprocess_scannet.py:622-655.
    """
    cm = ConfusionMatrix(num_classes, ignore_class=list(ignore_class))
    for pred_file in sorted(Path(path_pred).iterdir()):
        tgt_file = Path(path_target) / pred_file.name
        pred = _load_label_png(pred_file, image_size)
        target = _load_label_png(tgt_file, image_size)
        pred[target == 0] = 0  # faulty GT regions masked, like the reference
        cm.add_batch(target, pred)
    return cm.get_miou()


def calculate_panoptic_quality_folders(
        path_pred_sem: Path, path_pred_inst: Path,
        path_target_sem: Path, path_target_inst: Path,
        things: Set[int], stuff: Set[int], image_size=(512, 512)):
    """PQ^scene: all frames concatenated before one PQ pass.

    Reference: preprocess_scannet.py:685-705 (concat at :700-704).
    """
    preds, targets = [], []
    for pred_file in sorted(Path(path_pred_sem).iterdir()):
        name = pred_file.name
        sem_p = _load_label_png(pred_file, image_size)
        inst_p = _load_label_png(Path(path_pred_inst) / name, image_size)
        sem_t = _load_label_png(Path(path_target_sem) / name, image_size)
        inst_t = _load_label_png(Path(path_target_inst) / name, image_size)
        sem_p[sem_t == 0] = 0
        preds.append(np.stack([sem_p, inst_p], -1).reshape(-1, 2))
        targets.append(np.stack([sem_t, inst_t], -1).reshape(-1, 2))
    pred = np.concatenate(preds)
    target = np.concatenate(targets)
    return panoptic_quality(pred, target, things, stuff,
                            allow_unknown_preds_category=True)


def calculate_panoptic_quality_per_frame_folders(
        path_pred_sem: Path, path_pred_inst: Path,
        path_target_sem: Path, path_target_inst: Path,
        things: Set[int], stuff: Set[int], image_size=(512, 512)):
    """Per-frame PQ averaged (reference: preprocess_scannet.py:735-760)."""
    rows = []
    for pred_file in sorted(Path(path_pred_sem).iterdir()):
        name = pred_file.name
        sem_p = _load_label_png(pred_file, image_size)
        inst_p = _load_label_png(Path(path_pred_inst) / name, image_size)
        sem_t = _load_label_png(Path(path_target_sem) / name, image_size)
        inst_t = _load_label_png(Path(path_target_inst) / name, image_size)
        sem_p[sem_t == 0] = 0
        rows.append(panoptic_quality(
            np.stack([sem_p, inst_p], -1), np.stack([sem_t, inst_t], -1),
            things, stuff, allow_unknown_preds_category=True))
    arr = np.asarray(rows)
    return tuple(arr.mean(axis=0))


def evaluate_folders(root_pred: Path, root_target: Path, things: Set[int],
                     stuff: Set[int], image_size=(512, 512),
                     faulty_classes=(0,)) -> dict:
    """The evaluate.py CLI core: mIoU + PQ/SQ/RQ^scene (reference:
    inference/evaluate.py:14-37). Autodetects the GT layout: PanopLi
    (rs_semantics/rs_instance pngs) or MOS (semantic/instance npys —
    reference preprocess_scannet.py:708-732)."""
    root_target = Path(root_target)
    if (root_target / "rs_semantics").exists():
        gt_sem, gt_inst = root_target / "rs_semantics", root_target / "rs_instance"
    else:  # MOS layout
        gt_sem, gt_inst = root_target / "semantic", root_target / "instance"
    miou = calculate_iou_folders(
        Path(root_pred) / "pred_semantics", gt_sem,
        image_size, ignore_class=list(faulty_classes))
    pq, sq, rq = calculate_panoptic_quality_folders(
        Path(root_pred) / "pred_semantics", Path(root_pred) / "pred_surrogateid",
        gt_sem, gt_inst, things, stuff, image_size)
    return {"iou": miou, "pq": pq, "sq": sq, "rq": rq}
