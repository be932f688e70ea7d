"""Dataset dispatch (reference: dataset/__init__.py:9-110)."""
from __future__ import annotations

from pathlib import Path

from .base import (FrameData, InstanceBundleSampler, RayPoolSampler, SceneData,
                   SegmentBundleSampler, SegmentationData)


def load_scene(cfg, split_dims=None, load_train: bool = True,
               load_val: bool = True, use_gt_inssem: bool = False) -> SceneData:
    """Build a SceneData for cfg.dataset_class at cfg.image_dim.

    use_gt_inssem switches machine labels (m2f/detic) for GT labels, like the
    reference's get_dataset(use_gt_inssem=True).
    """
    image_dim = split_dims or cfg.image_dim
    from . import native
    native.set_num_threads(getattr(cfg, "num_workers", 0))
    if cfg.dataset_class == "panopli":
        from .panopli import PanopLiSceneReader
        sem_dir, inst_dir, key = (("rs_semantics", "rs_instance",
                                   "rs_instance_to_semantic") if use_gt_inssem
                                  else ("m2f_semantics", "m2f_instance",
                                        "m2f_instance_to_semantic"))
        reader = PanopLiSceneReader(
            Path(cfg.dataset_root), image_dim, cfg.max_depth,
            semantics_dir=sem_dir, instance_dir=inst_dir,
            instance_to_semantic_key=key,
            load_feat=(cfg.use_distilled_features_semantic
                       or cfg.use_distilled_features_instance),
            feature_type=cfg.feature_type,
            subsample_frames=cfg.subsample_frames, overfit=cfg.overfit)
        return reader.load_scene(load_train, load_val)
    if cfg.dataset_class == "mos":
        from .mos import MOSSceneReader
        sem_dir, inst_dir = (("semantic", "instance") if use_gt_inssem
                             else ("detic_semantic", "detic_instance"))
        reader = MOSSceneReader(
            Path(cfg.dataset_root), image_dim, cfg.max_depth,
            semantics_dir=sem_dir, instance_dir=inst_dir,
            subsample_frames=cfg.subsample_frames, overfit=cfg.overfit)
        return reader.load_scene(load_train, load_val)
    if cfg.dataset_class == "synthetic":
        from .synthetic import make_synthetic_scene
        return make_synthetic_scene(image_dim=image_dim, seed=cfg.seed or 0)
    raise NotImplementedError(cfg.dataset_class)
