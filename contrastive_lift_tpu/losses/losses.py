"""Training losses: TV, (symmetric) cross-entropy, contrastive, slow-fast.

Static-shape JAX formulations of the reference's loss zoo
(reference: model/loss/loss.py, trainer/train_panopli_tensorf.py:230-354).
Variable-size constructs (unique labels, per-label masks, ragged segment
groups) become fixed-capacity segment reductions with validity masks.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Simple regression / regularizer losses
# ---------------------------------------------------------------------------

def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def tv_loss_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Total variation of a [C, H, W] factor plane.

    Matches the reference TVLoss applied to a [1,C,H,W] tensor
    (reference: model/loss/loss.py:9-26): 2*(h_tv/count_h + w_tv/count_w).
    """
    c, h, w = x.shape
    count_h = c * (h - 1) * w + 1e-4
    count_w = c * h * (w - 1) + 1e-4
    h_tv = jnp.sum((x[:, 1:, :] - x[:, :-1, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:] - x[:, :, :-1]) ** 2)
    return 2.0 * (h_tv / count_h + w_tv / count_w)


def tv_loss_1d(x: jnp.ndarray) -> jnp.ndarray:
    """TV of a [C, L] factor line — the reference stores lines as [1,C,L,1]
    so only the 'h' (L) direction contributes."""
    c, l = x.shape
    count_h = c * (l - 1) * 1 + 1e-4
    h_tv = jnp.sum((x[:, 1:] - x[:, :-1]) ** 2)
    return 2.0 * (h_tv / count_h)


def branch_tv(params: dict, name: str, plane_scale: float, line_scale: float) -> jnp.ndarray:
    """Sum of plane (and optionally line) TV for one grid branch.

    Reference: tensoRF.py:248-279 (density/appearance use planes*1e-2 only;
    semantics/instances/features add lines*1e-3).
    """
    total = 0.0
    grid = params.get(name)
    if grid is None:
        return jnp.asarray(0.0)
    for plane in grid["planes"]:
        total = total + tv_loss_2d(plane) * plane_scale
    if line_scale > 0:
        for line in grid["lines"]:
            total = total + tv_loss_1d(line) * line_scale
    return total


def total_tv_loss(params: dict, cfg, epoch: int) -> jnp.ndarray:
    """Epoch-gated weighted TV over all branches (reference: tensoRF.py:281-290)."""
    loss = branch_tv(params, "density", 1e-2, 0.0) * cfg.lambda_tv_density
    loss = loss + branch_tv(params, "appearance", 1e-2, 0.0) * cfg.lambda_tv_appearance
    if epoch >= cfg.late_semantic_optimization:
        loss = loss + branch_tv(params, "semantic", 1e-2, 1e-3) * cfg.lambda_tv_semantics
    if epoch >= cfg.instance_optimization_epoch:
        loss = loss + branch_tv(params, "instance", 1e-2, 1e-3) * cfg.lambda_tv_instances
    return loss


# ---------------------------------------------------------------------------
# Semantic losses
# ---------------------------------------------------------------------------

def get_semantic_weights(reweight_fg: bool, fg_classes, num_classes: int,
                         weight_class_0: float = 0.0) -> jnp.ndarray:
    """Per-class CE weights (reference: loss.py:29-33 + trainer :70)."""
    weights = jnp.ones((num_classes,), jnp.float32)
    if reweight_fg:
        weights = weights.at[jnp.asarray(list(fg_classes))].set(2.0)
    return weights.at[0].set(weight_class_0)


def weighted_ce_with_logits(logits, target, class_weights=None):
    """Per-example weighted cross entropy, torch.nn.CrossEntropyLoss semantics.

    target: int labels [N] or probabilities [N, C]. Returns per-example loss [N]
    (for int targets, scaled by the class weight like torch with reduction='none').
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == logits.ndim:  # probability targets
        if class_weights is not None:
            logp = logp * class_weights[None, :]
        return -jnp.sum(target * logp, axis=-1)
    picked = jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        picked = picked * class_weights[target]
    return -picked


def sce_loss(logits, target_probs, alpha: float, beta: float, class_weights):
    """Symmetric cross entropy = alpha*CE + beta*RCE (reference: loss.py:36-59)."""
    ce = weighted_ce_with_logits(logits, target_probs, class_weights)
    pred = jax.nn.softmax(logits * class_weights[None, :], axis=-1)
    pred = jnp.clip(pred, 1e-8, 1.0)
    labels = jnp.clip(target_probs, 1e-8, 1.0)
    rce = jnp.sum(-pred * jnp.log(labels) * class_weights[None, :], axis=-1)
    return alpha * ce + beta * rce


def semantic_loss(logits, semantics, probs, confs, mode: str,
                  class_weights, use_symmetric: bool = False,
                  ce_alpha: float = 0.85, ce_beta: float = 0.15):
    """The three supervision modes (reference: train_panopli_tensorf.py:176-182)."""
    if use_symmetric:
        per = sce_loss(logits, probs, ce_alpha, ce_beta, class_weights)
        return jnp.mean(per * confs)
    if mode == "TTAConf":
        return jnp.mean(weighted_ce_with_logits(logits, probs, class_weights) * confs)
    if mode == "NoTTAConf":
        return jnp.mean(weighted_ce_with_logits(logits, semantics, class_weights) * confs)
    return jnp.mean(weighted_ce_with_logits(logits, semantics, class_weights))


# ---------------------------------------------------------------------------
# Segment-grouping loss
# ---------------------------------------------------------------------------

def segment_grouping_loss(sem_features, group_ids, confidences, num_groups: int,
                          class_weights, mode: str = "argmax_conf",
                          valid: Optional[jnp.ndarray] = None):
    """Group rays by 2D segment, pull each ray toward its segment's mean label.

    sem_features [N, C] (semantic map logits), group_ids [N] in [0, num_groups),
    valid [N] masks padding rays. Reference: train_panopli_tensorf.py:185-195
    (scatter_mean -> argmax target -> conf-weighted CE).
    """
    if valid is None:
        valid = jnp.ones(sem_features.shape[0], bool)
    vf = valid.astype(sem_features.dtype)
    sums = jax.ops.segment_sum(sem_features * vf[:, None], group_ids, num_groups)
    counts = jax.ops.segment_sum(vf, group_ids, num_groups)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    target = jnp.argmax(means, axis=-1)[group_ids]
    per = weighted_ce_with_logits(sem_features, target, class_weights)
    conf = confidences if "conf" in mode and not mode.endswith("noconf") else jnp.ones_like(per)
    per = per * conf * vf
    return jnp.sum(per) / jnp.maximum(jnp.sum(vf), 1.0)


# ---------------------------------------------------------------------------
# Vanilla contrastive loss
# ---------------------------------------------------------------------------

def contrastive_loss(features, instance_labels, temperature: float,
                     valid: Optional[jnp.ndarray] = None):
    """Pairwise Euclidean contrastive loss (reference: loss.py:62-82).

    Positive pairs use ``temperature``, negatives use 1 (reference loss.py:71-74
    applies ``temperature`` where the same-label mask is set — its inline
    comment states the opposite but the code is authoritative); the diagonal is
    excluded from the positive mask.
    """
    n = features.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    same = instance_labels[:, None] == instance_labels[None, :]
    pair_valid = valid[:, None] & valid[None, :]
    masks = same & ~jnp.eye(n, dtype=bool) & pair_valid

    diff = features[:, None, :] - features[None, :, :]
    distance_sq = jnp.sum(diff * diff, axis=-1)
    temp = jnp.where(masks, temperature, 1.0)
    similarity = jnp.exp(-distance_sq / temp)
    logits = jnp.exp(similarity) * pair_valid

    p = jnp.sum(logits * masks, axis=-1)
    z = jnp.sum(logits, axis=-1)
    prob = p / jnp.maximum(z, 1e-12)
    keep = (prob > 0) & valid
    log_prob = jnp.where(keep, jnp.log(jnp.maximum(prob, 1e-12)), 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(log_prob) / denom


# ---------------------------------------------------------------------------
# Slow-fast contrastive loss (THE paper contribution)
# ---------------------------------------------------------------------------

def slow_fast_loss(fast_proj, slow_proj, labels, confidences, num_labels: int,
                   valid: Optional[jnp.ndarray] = None):
    """Slow-fast concentration + contrastive loss, fully static-shape.

    Args:
      fast_proj / slow_proj: [N, d] rendered (optionally projected) embeddings
        from the fast/slow heads for one image's ray bundle. ``slow_proj``
        must already be stop-gradient'ed by the caller.
      labels: [N] int labels compacted to [0, num_labels) host-side.
      confidences: [N].
      num_labels: static capacity for per-label reductions.
      valid: [N] mask for padded rays.

    Semantics follow reference train_panopli_tensorf.py:256-310:
      * batch split into two non-overlapping halves — first half "fast",
        second half "slow";
      * per-label centroids of the slow half;
      * concentration: mean over labels present in BOTH halves of
        -mean_points(exp(-||fast - centroid||^2) * conf);
      * contrastive: label-match matrix fast-vs-slow, sim = exp(-cdist),
        logits = exp(sim), -log(sum_pos/sum_all) averaged over nonzero rows.
    """
    n = labels.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    half = n // 2
    idx = jnp.arange(n)
    fast_mask = (idx < half) & valid
    slow_mask = (idx >= half) & valid

    fm = fast_mask.astype(fast_proj.dtype)
    sm = slow_mask.astype(fast_proj.dtype)

    # per-label counts in each half
    counts_fast = jax.ops.segment_sum(fm, labels, num_labels)
    counts_slow = jax.ops.segment_sum(sm, labels, num_labels)
    label_in_both = (counts_fast > 0) & (counts_slow > 0)
    num_intersecting = jnp.sum(label_in_both)

    # slow centroids per label
    slow_sums = jax.ops.segment_sum(slow_proj * sm[:, None], labels, num_labels)
    centroids = slow_sums / jnp.maximum(counts_slow, 1.0)[:, None]

    # concentration: per-point exp(-d^2)*conf -> per-label mean over fast points
    cent_per_point = centroids[labels]
    dist_sq = jnp.sum((fast_proj - cent_per_point) ** 2, axis=-1)
    point_term = jnp.exp(-dist_sq / 1.0) * confidences * fm
    label_means = (jax.ops.segment_sum(point_term, labels, num_labels)
                   / jnp.maximum(counts_fast, 1.0))
    conc_sum = jnp.sum(jnp.where(label_in_both, -label_means, 0.0))
    loss_conc = jnp.where(num_intersecting > 0, conc_sum / num_intersecting, 0.0)

    # contrastive: dense fast-vs-slow matrices with validity masking
    pair_valid = fast_mask[:, None] & slow_mask[None, :]
    label_match = (labels[:, None] == labels[None, :]) & pair_valid
    diff = fast_proj[:, None, :] - slow_proj[None, :, :]
    cdist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-24))
    logits = jnp.exp(jnp.exp(-cdist / 1.0)) * pair_valid
    pos = jnp.sum(logits * label_match, axis=-1)
    z = jnp.sum(logits, axis=-1)
    prob = pos / jnp.maximum(z, 1e-12)
    keep = prob > 0
    n_keep = jnp.maximum(jnp.sum(keep), 1)
    loss_contrast = -jnp.sum(jnp.where(keep, jnp.log(jnp.maximum(prob, 1e-12)), 0.0)) / n_keep

    # degenerate batch (a half has no labels) contributes zero, like the
    # reference's early return (train_panopli_tensorf.py:284-288)
    ok = (jnp.sum(counts_fast) > 0) & (jnp.sum(counts_slow) > 0)
    return jnp.where(ok, loss_conc + loss_contrast, 0.0)


# ---------------------------------------------------------------------------
# Linear-assignment (Panoptic-Lifting baseline) loss
# ---------------------------------------------------------------------------

def _hungarian_jax(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular linear-sum assignment in lax (min-cost).

    Jonker-Volgenant shortest-augmenting-path with dual potentials — the same
    algorithm scipy.optimize.linear_sum_assignment uses (the reference calls
    scipy at trainer/train_panopli_tensorf.py:338). Requires finite costs and
    n_rows <= n_cols; returns the assigned column per row. Optimal total cost
    always matches scipy; on exact ties an equally-optimal permutation may
    differ. Matrices here are at most [max_instances, C] (<=500^2), and the
    inner Dijkstra exits as soon as a free column is reached, so the sequential
    depth stays modest.
    """
    n_rows, n_cols = cost.shape
    if n_rows > n_cols:
        raise ValueError(f"Hungarian requires n_rows <= n_cols, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    inf = jnp.asarray(jnp.inf, cost.dtype)

    def solve_row(carry, cur_row):
        u, v, row4col, col4row = carry

        # --- Dijkstra over columns from cur_row until a free column (sink).
        def search_cond(st):
            return st[5] < 0

        def search_body(st):
            i, minval, spc, path, scanned_rows, _, scanned_cols = st
            scanned_rows = scanned_rows.at[i].set(True)
            remaining = ~scanned_cols
            cand = minval + cost[i] - u[i] - v
            upd = remaining & (cand < spc)
            spc = jnp.where(upd, cand, spc)
            path = jnp.where(upd, i, path)
            masked = jnp.where(remaining, spc, inf)
            lowest = jnp.min(masked)
            # among minimal remaining columns prefer a free one (scipy's
            # row4col[j]==-1 tie preference)
            eligible = remaining & (masked == lowest)
            free = eligible & (row4col < 0)
            j = jnp.where(jnp.any(free), jnp.argmax(free), jnp.argmax(eligible))
            is_free = row4col[j] < 0
            sink = jnp.where(is_free, j, -1)
            i_next = jnp.where(is_free, i, row4col[j])
            scanned_cols = scanned_cols.at[j].set(True)
            return (i_next, lowest, spc, path, scanned_rows, sink, scanned_cols)

        init = (cur_row, jnp.asarray(0.0, cost.dtype),
                jnp.full((n_cols,), inf, cost.dtype),
                jnp.full((n_cols,), 0, jnp.int32),
                jnp.zeros((n_rows,), bool), jnp.asarray(-1, jnp.int32),
                jnp.zeros((n_cols,), bool))
        (_, lowest, spc, path, scanned_rows, sink, scanned_cols) = \
            jax.lax.while_loop(search_cond, search_body, init)

        # --- dual updates (scipy rectangular_lsap.cpp dual step)
        rows = jnp.arange(n_rows)
        u = u + jnp.where(
            scanned_rows,
            jnp.where(rows == cur_row, lowest, lowest - spc[col4row]),
            0.0)
        v = v - jnp.where(scanned_cols, lowest - spc, 0.0)

        # --- augment along the alternating path ending at sink
        def aug_cond(st):
            return ~st[3]

        def aug_body(st):
            j, row4col, col4row, _ = st
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return (j_next, row4col, col4row, i == cur_row)

        (_, row4col, col4row, _) = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink, row4col, col4row, jnp.asarray(False)))
        return (u, v, row4col, col4row), None

    init = (jnp.zeros((n_rows,), cost.dtype), jnp.zeros((n_cols,), cost.dtype),
            jnp.full((n_cols,), -1, jnp.int32), jnp.full((n_rows,), -1, jnp.int32))
    (_, _, _, col4row), _ = jax.lax.scan(
        solve_row, init, jnp.arange(n_rows, dtype=jnp.int32))
    return col4row


def linear_assignment_loss(instance_logits, labels, confidences, num_labels: int,
                           valid: Optional[jnp.ndarray] = None):
    """Hungarian-matched virtual-GT cross entropy.

    Matches labels (compacted to [0, num_labels)) to prediction channels by
    mean softmax mass, builds virtual GT, then conf-weighted CE — skipped when
    predictions already agree. Reference: train_panopli_tensorf.py:237-242,331-342.
    The assignment is an exact Hungarian (JV) solve, matching scipy's
    linear_sum_assignment up to equal-cost tie permutations.
    """
    n, c = instance_logits.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    vf = valid.astype(instance_logits.dtype)
    probs = jax.nn.softmax(instance_logits, axis=-1)
    sums = jax.ops.segment_sum(probs * vf[:, None], labels, num_labels)
    counts = jax.ops.segment_sum(vf, labels, num_labels)
    cost = -(sums / (counts[:, None] + 1e-4))  # [num_labels, C]
    cost = jnp.where((counts > 0)[:, None], cost, 1e6)  # park empty labels last
    assignment = _hungarian_jax(cost)                    # [num_labels]
    virtual_gt = assignment[labels]

    predicted = jnp.argmax(instance_logits, axis=-1)
    any_mismatch = jnp.any((virtual_gt != predicted) & valid)
    per = weighted_ce_with_logits(instance_logits, virtual_gt) * confidences * vf
    loss = jnp.sum(per) / jnp.maximum(jnp.sum(vf), 1.0)
    return jnp.where(any_mismatch, loss, 0.0)
