"""Checkpoint save/load with shape-morphing metadata.

The reference's hairiest state is the grid geometry: parameter shapes change
during training (upsample/shrink), so resume must rebuild the model at the
stored resolution before loading weights (reference:
trainer/train_panopli_tensorf.py:461-470, inference/render_panopli.py:91-98).
Here every checkpoint stores ``grid_dim`` + ``bbox_aabb`` + epoch/step in its
metadata and the loader reconstructs the pytree directly from the arrays, so
no replay is needed.

Format: a single .npz of flattened pytree leaves + a JSON metadata blob.
(orbax is available but brings directory-per-step layout; a flat npz keeps
checkpoints single-file and trivially portable.)
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    return str(entry)


def _unflatten_from_paths(flat: dict) -> dict:
    """Rebuild a nested dict/tuple-free pytree from path keys.

    Integer path components become list indices; everything else dict keys.
    Lists are converted to tuples at the end only for 'planes'/'lines' (the
    factor-grid containers), matching init_tensorf's structure.
    """
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if part not in node:
                node[part] = {}
            node = node[part]
        node[parts[-1]] = value

    def normalize(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            seq = [normalize(node[str(i)]) for i in range(len(keys))]
            return seq
        return {k: normalize(v) for k, v in node.items()}

    out = normalize(root)

    def tupleize(node):
        if isinstance(node, dict):
            return {k: (tuple(tupleize(x) for x in v)
                        if k in ("planes", "lines") and isinstance(v, list)
                        else tupleize(v))
                    for k, v in node.items()}
        if isinstance(node, list):
            return [tupleize(x) for x in node]
        return node

    return tupleize(out)


def save_checkpoint(path, params, *, grid_dim, bbox_aabb, epoch: int,
                    global_step: int, config_dict: Optional[dict] = None,
                    extra: Optional[dict] = None,
                    opt_state: Any = None) -> None:
    """Params + geometry metadata, optionally with optimizer state.

    The optimizer state (both optax chains) is stored as ordered leaves; the
    loader re-pairs them with a freshly init'ed state of the same treedef —
    the reference equivalent is Lightning storing optimizer state_dicts
    (SURVEY §5.4, trainer/__init__.py:87-92).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten_with_paths(params)
    n_opt = 0
    if opt_state is not None:
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"__opt__{i:05d}"] = np.asarray(leaf)
        n_opt = len(leaves)
    meta = {
        "grid_dim": [int(g) for g in grid_dim],
        "bbox_aabb": np.asarray(bbox_aabb).tolist(),
        "epoch": int(epoch),
        "global_step": int(global_step),
        "config": config_dict or {},
        "extra": extra or {},
        "n_opt_leaves": n_opt,
        "format_version": 2,
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **flat)


def load_checkpoint(path) -> Tuple[dict, dict]:
    """Returns (params, metadata). Params arrive at the stored grid shapes.
    Optimizer leaves (if stored) are under metadata['opt_leaves']."""
    with np.load(Path(path), allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        flat = {k: data[k] for k in data.files
                if k != "__meta__" and not k.startswith("__opt__")}
        opt_keys = sorted(k for k in data.files if k.startswith("__opt__"))
        if opt_keys:
            meta["opt_leaves"] = [data[k] for k in opt_keys]
    params = _unflatten_from_paths(flat)
    return params, meta


def restore_opt_state(template_opt_state, opt_leaves):
    """Re-pair stored leaves with a freshly initialized optimizer state's
    treedef. Shapes must match — callers rebuild the model at the checkpoint's
    grid_dim first (reference replays grid growth before restore,
    train_panopli_tensorf.py:461-470)."""
    treedef = jax.tree_util.tree_structure(template_opt_state)
    template_leaves = jax.tree_util.tree_leaves(template_opt_state)
    if len(template_leaves) != len(opt_leaves):
        raise ValueError(
            f"optimizer state leaf count mismatch: checkpoint has "
            f"{len(opt_leaves)}, fresh init has {len(template_leaves)} "
            "(config/optimizer setup changed since the checkpoint was saved)")
    for t, s in zip(template_leaves, opt_leaves):
        if getattr(t, "shape", None) != s.shape:
            raise ValueError(
                f"optimizer leaf shape mismatch: {s.shape} vs {t.shape} — "
                "rebuild the model at the checkpoint grid_dim before restoring")
    return jax.tree_util.tree_unflatten(treedef, list(opt_leaves))
