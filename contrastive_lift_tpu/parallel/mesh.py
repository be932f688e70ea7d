"""Device mesh + sharding layout for multi-chip training and rendering.

The reference's only distribution strategy is single-node DDP: replicated
parameters, ray batches split across GPUs, NCCL all-reduce after backward
(reference: trainer/__init__.py:93-108, SURVEY §2.5). The TPU-native mapping:

  * one mesh axis ``data`` over all chips (ICI);
  * parameters + optimizer state replicated (the VM factor grids are small —
    tens of MB — so replication beats sharding them);
  * every per-ray batch axis sharded over ``data``; XLA GSPMD inserts the
    gradient psum over ICI inside the jitted step — the NCCL all-reduce
    equivalent, but fused into the compiled program;
  * the per-image axis of instance bundles also shards over ``data`` (each
    chip owns whole images — the contrastive loss needs full intra-image
    ray-pair matrices, so splitting *within* an image would force all-gathers).

Multi-pod (DCN) follows the same layout: jax.distributed initializes the
global device list and the ``data`` axis simply spans pods.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (rays or images) over the data axis."""
    return NamedSharding(mesh, P(axis))


def group_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 1 of a [G, chunk, ...] chunk stack over the data axis —
    grouped-dispatch rendering keeps the ray axis sharded while lax.map
    iterates the replicated group axis (inference/render.py)."""
    return NamedSharding(mesh, P(None, axis))


def shard_main_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_instance_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Instance bundles are [I, R, ...]; shard the image axis I."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def pad_batch_to_multiple(batch: dict, multiple: int, axis: int = 0) -> dict:
    """Pad axis-0 so it divides the mesh; padded rows must be masked upstream."""
    out = {}
    for k, v in batch.items():
        n = v.shape[axis]
        pad = (-n) % multiple
        if pad:
            widths = [(0, 0)] * v.ndim
            widths[axis] = (0, pad)
            v = np.pad(v, widths)
        out[k] = v
    return out
