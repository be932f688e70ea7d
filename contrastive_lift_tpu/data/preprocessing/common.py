"""Shared preprocessing utilities: the common on-disk layout, keyframe
selection, label folding, instance renumbering.

The reference's per-dataset preprocessing scripts (reference:
dataset/preprocessing/preprocess_{scannet,replica,hypersim,itw}.py, ~2200 LoC)
all funnel raw captures into one layout that the readers consume:

    color/ pose/ intrinsic/intrinsic_color.txt
    m2f_semantics/ m2f_instance/ m2f_probabilities/ m2f_segments/
    rs_semantics/ rs_instance/ splits.json segmentation_data.pkl

This module holds the dataset-independent machinery; the per-dataset drivers
(scannet.py etc.) handle raw-format parsing.
"""
from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Keyframe selection (reference: preprocess_scannet.py:31-55 — subsample by
# pose spacing, break ties toward the least blurry frame)
# ---------------------------------------------------------------------------

def numeric_stem_key(stem: str) -> tuple:
    """Type-stable sort key for frame-file stems: numeric stems first in
    numeric order, then the rest lexically. A mixed directory ('0001.png'
    next to 'frame_extra.png') must sort, not raise — a bare
    ``int(s) if s.isnumeric() else s`` key makes sorted() compare int
    against str and crash. isdecimal (not isnumeric) guards the int():
    isnumeric admits Unicode numerics like '½' that int() rejects."""
    s = str(stem)
    return (0, int(s), "") if s.isdecimal() else (1, 0, s)


def save_id_image(ids: np.ndarray, path) -> None:
    """Write an integer label/id map as PNG, widening past uint8 when needed.

    Replica object ids and scene-wide renumbered instance ids can exceed
    255; a silent uint8 cast would wrap id 256 -> 0 (void) and fuse distinct
    objects in the segment-grouping labels. PIL round-trips uint16 PNGs
    ('I;16'), and the readers load via np.array(Image.open(...)) which
    preserves the width."""
    from PIL import Image
    ids = np.asarray(ids)
    hi = int(ids.max(initial=0))
    lo = int(ids.min(initial=0))
    if lo < 0 or hi > int(np.iinfo(np.uint16).max):
        raise ValueError(f"id image outside PNG range: [{lo}, {hi}]")
    dtype = np.uint8 if hi <= int(np.iinfo(np.uint8).max) else np.uint16
    Image.fromarray(ids.astype(dtype)).save(path)


def blur_score(image: np.ndarray) -> float:
    """Variance of a 3x3 Laplacian response (higher = sharper).

    Pure-numpy stand-in for the reference's cv2.Laplacian().var().
    """
    gray = np.asarray(image, np.float32)
    if gray.ndim == 3:
        gray = gray.mean(-1)
    lap = (-4 * gray[1:-1, 1:-1] + gray[:-2, 1:-1] + gray[2:, 1:-1]
           + gray[1:-1, :-2] + gray[1:-1, 2:])
    return float(lap.var())


def select_keyframes(blur_scores: Sequence[float], window: int = 8) -> List[int]:
    """Pick the sharpest frame from every consecutive window."""
    scores = np.asarray(blur_scores, np.float64)
    picks = []
    for start in range(0, len(scores), window):
        chunk = scores[start:start + window]
        picks.append(start + int(np.argmax(chunk)))
    return picks


# ---------------------------------------------------------------------------
# Label folding (reference: preprocess_scannet.py:255-297 — raw dataset
# classes -> a reduced class set -> thing/stuff flags)
# ---------------------------------------------------------------------------

def fold_semantics(labels: np.ndarray, mapping: Dict[int, int],
                   default: int = 0) -> np.ndarray:
    """Apply a raw->reduced class mapping via a LUT (unknown -> default)."""
    labels = np.asarray(labels, np.int64)
    max_id = max(int(labels.max(initial=0)), max(mapping, default=0))
    lut = np.full(max_id + 1, default, np.int64)
    for src, dst in mapping.items():
        lut[src] = dst
    return lut[labels]


def renumber_instances(all_instances: List[np.ndarray],
                       all_semantics: List[np.ndarray],
                       thing_classes: set) -> tuple:
    """Make instance ids dense and consistent: ids on stuff pixels -> 0, thing
    instances renumbered 1..K scene-wide; returns (new_instances,
    instance_to_semantics). Reference: preprocess_scannet.py:299-354.
    """
    pair_to_new: Dict[tuple, int] = {}
    inst_to_sem: Dict[int, int] = {0: 0}
    out = []
    for inst, sem in zip(all_instances, all_semantics):
        inst = np.asarray(inst, np.int64)
        sem = np.asarray(sem, np.int64)
        new = np.zeros_like(inst)
        for raw_id in np.unique(inst):
            if raw_id == 0:
                continue
            mask = inst == raw_id
            # majority semantic class of the raw instance
            cls_ids, counts = np.unique(sem[mask], return_counts=True)
            cls = int(cls_ids[np.argmax(counts)])
            if cls not in thing_classes:
                continue
            key = (int(raw_id), cls)
            if key not in pair_to_new:
                pair_to_new[key] = len(pair_to_new) + 1
                inst_to_sem[pair_to_new[key]] = cls
            new[mask] = pair_to_new[key]
        out.append(new)
    return out, inst_to_sem


# ---------------------------------------------------------------------------
# Layout writer
# ---------------------------------------------------------------------------

class SceneWriter:
    """Writes the common scene layout that PanopLiSceneReader consumes."""

    def __init__(self, out_dir):
        self.root = Path(out_dir)
        for sub in ("color", "pose", "intrinsic", "m2f_semantics",
                    "m2f_instance", "m2f_probabilities", "m2f_segments",
                    "rs_semantics", "rs_instance", "depth", "invalid"):
            (self.root / sub).mkdir(parents=True, exist_ok=True)
        self.names: List[str] = []

    def add_frame(self, name: str, rgb: np.ndarray, cam2world: np.ndarray,
                  m2f_semantics: np.ndarray, m2f_instance: np.ndarray,
                  probabilities: np.ndarray, confidence: np.ndarray,
                  gt_semantics: Optional[np.ndarray] = None,
                  gt_instance: Optional[np.ndarray] = None,
                  segments: Optional[np.ndarray] = None,
                  depth: Optional[np.ndarray] = None,
                  invalid: Optional[np.ndarray] = None) -> None:
        from PIL import Image
        self.names.append(name)
        Image.fromarray(np.asarray(rgb, np.uint8)).save(
            self.root / "color" / f"{name}.jpg", quality=95)
        np.savetxt(self.root / "pose" / f"{name}.txt", np.asarray(cam2world))
        save_id_image(m2f_semantics,
                      self.root / "m2f_semantics" / f"{name}.png")
        save_id_image(m2f_instance,
                      self.root / "m2f_instance" / f"{name}.png")
        np.savez_compressed(self.root / "m2f_probabilities" / f"{name}.npz",
                            probability=np.asarray(probabilities, np.float32),
                            confidence=np.asarray(confidence, np.float32))
        if segments is not None:
            save_id_image(segments,
                          self.root / "m2f_segments" / f"{name}.png")
        if gt_semantics is not None:
            save_id_image(gt_semantics,
                          self.root / "rs_semantics" / f"{name}.png")
        if gt_instance is not None:
            save_id_image(gt_instance,
                          self.root / "rs_instance" / f"{name}.png")
        if depth is not None:
            depth_mm = (np.asarray(depth, np.float32) * 1000).astype(np.uint16)
            Image.fromarray(depth_mm).save(self.root / "depth" / f"{name}.png")
        if invalid is not None:
            Image.fromarray((np.asarray(invalid) > 0).astype(np.uint8) * 255).save(
                self.root / "invalid" / f"{name}.jpg")

    def write_intrinsics(self, intrinsics_4x4: np.ndarray) -> None:
        np.savetxt(self.root / "intrinsic" / "intrinsic_color.txt",
                   np.asarray(intrinsics_4x4))

    def write_splits(self, train_names: Sequence[str],
                     test_names: Sequence[str]) -> None:
        (self.root / "splits.json").write_text(json.dumps(
            {"train": list(train_names), "test": list(test_names)}))

    def write_segmentation_data(self, fg_classes, bg_classes,
                                instance_to_semantics) -> None:
        with open(self.root / "segmentation_data.pkl", "wb") as f:
            pickle.dump({
                "fg_classes": sorted(fg_classes),
                "bg_classes": sorted(bg_classes),
                "m2f_instance_to_semantic": dict(instance_to_semantics),
            }, f)
