"""TPU-accelerated mean-shift clustering (flat-kernel, sklearn-compatible).

The reference clusters rendered instance embeddings post-hoc with
``sklearn.cluster.MeanShift(bandwidth, bin_seeding=True, min_bin_freq=10,
cluster_all=False)`` on CPU (reference: inference/render_panopli.py:225-232) —
tens of seconds for 50k points. Here the O(seeds x points x iters) shift loop
runs as one jitted XLA program (matmul-based distances on the MXU, seeds
blocked to bound memory); only the cheap, data-dependent parts — bin seeding
and mode dedup — stay on the host.

Semantics matched to sklearn:
  * seeds = centers of bandwidth-sized bins holding >= min_bin_freq points;
  * each seed iterates mean-of-neighbors-within-bandwidth until the shift is
    < 1e-3 * bandwidth (or max_iter);
  * modes sorted by window population, deduped within bandwidth (greedy);
  * fit labels: nearest center if within bandwidth else -1 (cluster_all=False);
  * predict labels: nearest center, no radius check.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def silverman_bandwidth(n: int, d: int) -> float:
    """scipy.stats.gaussian_kde(..., 'silverman').covariance_factor()
    (reference: render_panopli.py:220-222 uses the raw factor as bandwidth)."""
    return (n * (d + 2) / 4.0) ** (-1.0 / (d + 4))


def bin_seeds(points: np.ndarray, bin_size: float, min_bin_freq: int = 1) -> np.ndarray:
    """Histogram seeding on a bandwidth-sized lattice (host-side numpy)."""
    binned = np.round(points / bin_size)
    uniq, counts = np.unique(binned, axis=0, return_counts=True)
    seeds = uniq[counts >= min_bin_freq] * bin_size
    if len(seeds) == len(points) or len(seeds) == 0:
        return points.astype(np.float32)
    return seeds.astype(np.float32)


@partial(jax.jit, static_argnames=("max_iter", "block"))
def _shift_seeds(points: jnp.ndarray, seeds: jnp.ndarray, bandwidth,
                 max_iter: int = 300, block: int = 256):
    """Iterate all seeds to their modes. Returns (modes [S,d], n_within [S]).

    Seeds are processed in blocks of ``block`` via lax.map so the [block, N]
    distance matrix stays small enough for VMEM-friendly tiling.
    """
    bw2 = bandwidth * bandwidth
    stop_thresh = 1e-3 * bandwidth
    n_seeds = seeds.shape[0]
    pad = (-n_seeds) % block
    seeds_p = jnp.pad(seeds, ((0, pad), (0, 0)))
    blocks = seeds_p.reshape(-1, block, seeds.shape[1])
    pt_sq = jnp.sum(points * points, axis=1)  # [N]

    def one_block(seed_blk):
        def dist2(s):
            # [block, N] via matmul: |p|^2 - 2 s.p + |s|^2
            cross = s @ points.T
            s_sq = jnp.sum(s * s, axis=1, keepdims=True)
            return pt_sq[None, :] - 2.0 * cross + s_sq

        def cond(carry):
            s, prev_shift, it = carry
            return (it < max_iter) & (prev_shift >= stop_thresh)

        def body(carry):
            s, _, it = carry
            within = (dist2(s) <= bw2).astype(points.dtype)  # [block, N]
            counts = jnp.sum(within, axis=1, keepdims=True)
            new_s = (within @ points) / jnp.maximum(counts, 1.0)
            new_s = jnp.where(counts > 0, new_s, s)
            shift = jnp.max(jnp.linalg.norm(new_s - s, axis=1))
            return new_s, shift, it + 1

        final_s, _, _ = jax.lax.while_loop(
            cond, body, (seed_blk, jnp.asarray(jnp.inf, points.dtype), 0))
        n_within = jnp.sum(dist2(final_s) <= bw2, axis=1)
        return final_s, n_within

    modes, n_within = jax.lax.map(one_block, blocks)
    return (modes.reshape(-1, seeds.shape[1])[:n_seeds],
            n_within.reshape(-1)[:n_seeds])


@partial(jax.jit, static_argnames=("within_only",))
def _nearest_center(points: jnp.ndarray, centers: jnp.ndarray, bandwidth,
                    within_only: bool = False):
    """Label each point with its nearest center (optionally -1 outside bw)."""
    cross = points @ centers.T
    d2 = (jnp.sum(points * points, 1)[:, None] - 2 * cross
          + jnp.sum(centers * centers, 1)[None, :])
    labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
    if within_only:
        best = jnp.take_along_axis(d2, labels[:, None], axis=1)[:, 0]
        labels = jnp.where(best <= bandwidth * bandwidth, labels, -1)
    return labels


class MeanShiftTPU:
    """Drop-in functional equivalent of sklearn MeanShift for this pipeline."""

    def __init__(self, bandwidth: float, bin_seeding: bool = True,
                 min_bin_freq: int = 10, cluster_all: bool = False,
                 max_iter: int = 300):
        self.bandwidth = float(bandwidth)
        self.bin_seeding = bin_seeding
        self.min_bin_freq = min_bin_freq
        self.cluster_all = cluster_all
        self.max_iter = max_iter
        self.cluster_centers_: np.ndarray | None = None
        self.labels_: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "MeanShiftTPU":
        X = np.asarray(X, np.float32)
        seeds = (bin_seeds(X, self.bandwidth, self.min_bin_freq)
                 if self.bin_seeding else X)
        modes, n_within = _shift_seeds(jnp.asarray(X), jnp.asarray(seeds),
                                       self.bandwidth, self.max_iter)
        modes = np.asarray(modes)
        n_within = np.asarray(n_within)
        keep = n_within > 0
        modes, n_within = modes[keep], n_within[keep]
        if len(modes) == 0:
            raise ValueError("No point was within bandwidth of any seed.")
        # dedup modes within bandwidth, richest window first (sklearn order)
        order = np.argsort(-n_within, kind="stable")
        modes = modes[order]
        unique = np.ones(len(modes), bool)
        for i in range(len(modes)):
            if unique[i]:
                d = np.linalg.norm(modes - modes[i], axis=1)
                unique &= ~((d < self.bandwidth) & (np.arange(len(modes)) > i))
        self.cluster_centers_ = modes[unique]
        self.labels_ = np.asarray(_nearest_center(
            jnp.asarray(X), jnp.asarray(self.cluster_centers_), self.bandwidth,
            within_only=not self.cluster_all))
        return self

    def predict(self, X: np.ndarray, chunk: int = 4_000_000) -> np.ndarray:
        assert self.cluster_centers_ is not None, "fit first"
        X = np.asarray(X, np.float32)
        out = np.empty(len(X), np.int32)
        centers = jnp.asarray(self.cluster_centers_)
        for i in range(0, len(X), chunk):
            out[i:i + chunk] = np.asarray(_nearest_center(
                jnp.asarray(X[i:i + chunk]), centers, self.bandwidth))
        return out
