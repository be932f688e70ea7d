"""Baked inference heads: position-only head MLPs precomputed at voxel nodes.

At inference every head except appearance is a pure function of position —
semantics/instances/distilled read xyz and/or grid features; only the rgb
head sees the view direction. Baking runs those MLPs ONCE per scene on the
g^3 voxel nodes and stores the OUTPUTS as per-cell corner rows (lane-padded
bf16, compacted to occupied bricks like the appearance features), so the
per-sample head cost collapses from ~0.5-1 MFLOP of small-KN MXU work to one
256-lane row gather plus the same trilinear corner product the density path
uses.

The rendered maps become trilinear interpolations of node-exact head outputs
instead of head evaluations of interpolated inputs — a controlled
approximation (both agree at nodes; between nodes the difference is the
head's nonlinearity within one voxel). Fidelity is measured, not assumed:
tests/test_bake_heads.py bounds the drift on a trained surface-peaked field.

MEASURED OUTCOME (v5e, tools/microbench_candidates.py --which baked): the
baked row gather (256-lane bf16, ~2M compact rows at ~55M rows/s) costs MORE
than the exact sem + fast/slow MLP stacks at every head_topk tried (k=24:
25.0 vs 23.9 ms full pass; k=64: 38.8 vs 36.4; k=128: 59.6 vs 56.6) — the
small-KN MLPs ride the MXU faster than the gather wall. Kept as a tested
opt-in (render_frames(bake_heads=True)) and a regression reference, like
ops/pallas_interp.py; OFF by default.

TPU-perf design; no reference equivalent (the reference evaluates the head
MLPs per ray sample: model/renderer/panopli_tensoRF_renderer.py:103-176).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import tensorf as tf
from ..ops.fused_grid import FusedGrids, _corner_pad, build_dense_feature


def baked_width(mcfg) -> int:
    """Lanes of the baked payload: [semantic logits, instance features]."""
    return mcfg.num_semantic_classes + mcfg.dim_feature_instance


def _node_head_outputs(params, mcfg, xyz, grid_feats, compute_dtype):
    """Head outputs at [P, 3] normalized node coords.

    ``grid_feats``: dict of pre-densified branch features at the same nodes
    (cheaper than re-sampling the VM factors point-wise). Mirrors
    renderer.render_rays's head calls (semantics logits pre-softmax;
    instances [fast, slow] concat).
    """
    distilled = None
    if mcfg.use_distilled:
        distilled = jnp.tanh(tf.mlp_apply(params["feature_mlp"],
                                          grid_feats["feature"],
                                          compute_dtype))
    if mcfg.use_semantic_mlp:
        sem_feat, sem_pe = xyz, mcfg.pe_sem
    else:
        sem_feat, sem_pe = grid_feats["semantic"], 0
    d = distilled if mcfg.use_distilled_features_semantic else None
    sem_in = tf._head_input(mcfg, sem_pe, sem_feat, d)
    sem = tf.mlp_apply(params["semantic_mlp"], sem_in, compute_dtype)

    if mcfg.use_instance_mlp:
        ins_feat, ins_pe = xyz, mcfg.pe_ins
    else:
        ins_feat, ins_pe = grid_feats["instance"], 0
    d_i = distilled if mcfg.use_distilled_features_instance else None
    ins_in = tf._head_input(mcfg, ins_pe, ins_feat, d_i)
    ins = tf.mlp_apply(params["instance_mlp"]["fast"], ins_in, compute_dtype)
    if mcfg.slow_fast_mode:
        slow = tf.mlp_apply(params["instance_mlp"]["slow"], ins_in,
                            compute_dtype)
        ins = jnp.concatenate([ins, slow], axis=-1)
    return jnp.concatenate([sem, ins], axis=-1)


@functools.lru_cache(maxsize=8)
def _cached_baker(mcfg, grid_dim, capacity_rows: int, sv: int,
                  dtype_name: str, chunk: int):
    """Jitted (params, compact_cells) -> compact baked corner rows."""
    gx, gy, gz = grid_dim
    n = gx * gy * gz
    n_chunks = -(-n // chunk)
    compute_dtype = jnp.dtype(dtype_name)

    def build(params, compact_cells):
        # node coords, padded to whole chunks (pad nodes clamp to the last)
        idx = jnp.minimum(jnp.arange(n_chunks * chunk), n - 1)
        ix = idx // (gy * gz)
        iy = (idx // gz) % gy
        iz = idx % gz
        g1 = jnp.asarray((gx - 1, gy - 1, gz - 1), jnp.float32)
        xyz = jnp.stack([ix, iy, iz], -1).astype(jnp.float32) / g1 * 2.0 - 1.0

        grids = {}
        for name in ("semantic", "instance", "feature"):
            if name in params:
                grids[name] = build_dense_feature(params, name)
                grids[name] = jnp.pad(grids[name],
                                      ((0, n_chunks * chunk - n), (0, 0)))

        def one_chunk(args):
            xyz_c, feats_c = args
            return _node_head_outputs(params, mcfg, xyz_c, feats_c,
                                      compute_dtype).astype(jnp.bfloat16)

        feats_chunks = {k: v.reshape(n_chunks, chunk, -1)
                        for k, v in grids.items()}
        dense = jax.lax.map(one_chunk,
                            (xyz.reshape(n_chunks, chunk, 3), feats_chunks))
        dense = dense.reshape(n_chunks * chunk, -1)[:n]     # [g^3, F] bf16

        # corner rows for the compact cells only (building the full corner
        # table first would transiently cost 8x g^3 rows)
        F = dense.shape[-1]
        pad = _corner_pad(F)
        cyz = (gy - 1) * (gz - 1)
        cx_ = compact_cells // cyz
        cy_ = (compact_cells % cyz) // (gz - 1)
        cz_ = compact_cells % (gz - 1)
        corners = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    node = ((cx_ + dx) * gy + (cy_ + dy)) * gz + (cz_ + dz)
                    c = jnp.take(dense, node, axis=0)
                    corners.append(jnp.pad(c, ((0, 0), (0, pad - F))))
        rows = jnp.concatenate(corners, axis=-1)            # [N, 8*pad]
        sentinel = jnp.zeros((sv ** 3, rows.shape[-1]), rows.dtype)
        return jnp.concatenate([sentinel, rows])

    return jax.jit(build)


def bake_head_tables(params, mcfg, fused: FusedGrids,
                     compute_dtype=jnp.bfloat16,
                     chunk: int = 1 << 17) -> FusedGrids:
    """Attach the baked sem+ins head table to a compacted FusedGrids.

    Host-side driver (one per-scene build, amortized over every chunk
    rendered with the same parameters). Requires the compacted layout
    (``build_render_grids(compact=True)``) — the baked rows share its
    slot_map indirection.
    """
    if fused.compact_cells is None:
        raise ValueError("bake_head_tables needs the compacted fast path "
                         "(build_render_grids(compact=True))")
    grid_dim = tuple(int(g) for g in fused.grid_dim)
    baker = _cached_baker(mcfg, grid_dim, int(fused.compact_cells.shape[0]),
                          int(fused.supervoxel), jnp.dtype(compute_dtype).name,
                          chunk)
    table = baker(params, fused.compact_cells)
    return fused._replace(compact_feature_cells={
        **fused.compact_feature_cells, "baked": table})
