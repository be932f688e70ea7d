"""Loss parity tests against independent numpy/torch oracles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from contrastive_lift_tpu.losses import losses as L

torch = pytest.importorskip("torch")


def test_tv_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 9, 11)).astype(np.float32)
    # reference TVLoss on [1, C, H, W]
    xt = torch.from_numpy(x)[None]
    h_x, w_x = xt.size(2), xt.size(3)
    count_h = xt[:, :, 1:, :].numel() + 1e-4
    count_w = xt[:, :, :, 1:].numel() + 1e-4
    h_tv = ((xt[:, :, 1:, :] - xt[:, :, :h_x - 1, :]) ** 2).sum()
    w_tv = ((xt[:, :, :, 1:] - xt[:, :, :, :w_x - 1]) ** 2).sum()
    ref = float(2 * (h_tv / count_h + w_tv / count_w))
    ours = float(L.tv_loss_2d(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(64, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 64)
    weights = rng.uniform(0.5, 2.0, 7).astype(np.float32)
    ours = np.asarray(L.weighted_ce_with_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(weights), reduction="none")(
        torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_weighted_ce_prob_targets_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    probs = rng.dirichlet(np.ones(5), 32).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    ours = np.asarray(L.weighted_ce_with_logits(
        jnp.asarray(logits), jnp.asarray(probs), jnp.asarray(weights)))
    ref = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(weights), reduction="none")(
        torch.from_numpy(logits), torch.from_numpy(probs)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_contrastive_loss_matches_reference_formula():
    """Oracle: direct torch transcription of reference loss.py:62-82 semantics."""
    rng = np.random.default_rng(3)
    n, d = 40, 3
    feats = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 5, n)
    temperature = 100.0

    ft = torch.from_numpy(feats)
    lt = torch.from_numpy(labels)
    masks = lt.view(-1, 1).repeat(1, n).eq(lt.clone())
    masks = masks.fill_diagonal_(0)
    distance_sq = ((ft.unsqueeze(1) - ft.unsqueeze(0)) ** 2).sum(-1)
    temp = torch.where(masks, torch.full_like(distance_sq, temperature),
                       torch.ones_like(distance_sq))
    sim = torch.exp(-distance_sq / temp)
    logits = torch.exp(sim)
    p = (logits * masks).sum(-1)
    z = logits.sum(-1)
    prob = p / z
    prob_masked = prob[prob != 0]
    ref = float(-prob_masked.log().sum() / n)

    ours = float(L.contrastive_loss(jnp.asarray(feats), jnp.asarray(labels), temperature))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def _slow_fast_oracle(fast, slow, labels, confs):
    """Numpy transcription of reference train_panopli_tensorf.py:256-310."""
    n = labels.shape[0]
    fast_mask = np.zeros(n, bool)
    fast_mask[: n // 2] = True
    slow_mask = ~fast_mask
    fast_labels = np.unique(labels[fast_mask])
    slow_labels = np.unique(labels[slow_mask])
    if len(fast_labels) == 0 or len(slow_labels) == 0:
        return 0.0
    centroids = {l: slow[slow_mask & (labels == l)].mean(axis=0) for l in slow_labels}
    intersecting = [l for l in fast_labels if l in slow_labels]
    loss = 0.0
    for l in intersecting:
        m = fast_mask & (labels == l)
        dist_sq = ((fast[m] - centroids[l]) ** 2).sum(-1)
        loss += -1.0 * (np.exp(-dist_sq) * confs[m]).mean()
    if len(intersecting) > 0:
        loss /= len(intersecting)
    label_matrix = labels[fast_mask][:, None] == labels[slow_mask][None, :]
    diff = fast[fast_mask][:, None, :] - slow[slow_mask][None, :, :]
    cdist = np.sqrt((diff ** 2).sum(-1))
    logits = np.exp(np.exp(-cdist))
    prob = (logits * label_matrix).sum(-1) / logits.sum(-1)
    prob_masked = prob[prob != 0]
    loss += -np.log(prob_masked).mean()
    return loss


def test_slow_fast_loss_matches_reference_semantics():
    rng = np.random.default_rng(4)
    n, d = 64, 3
    fast = rng.normal(size=(n, d)).astype(np.float32)
    slow = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 6, n)
    confs = rng.uniform(0.5, 1.0, n).astype(np.float32)
    ref = _slow_fast_oracle(fast, slow, labels, confs)
    ours = float(L.slow_fast_loss(jnp.asarray(fast), jnp.asarray(slow),
                                  jnp.asarray(labels), jnp.asarray(confs),
                                  num_labels=8))
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_slow_fast_loss_with_padding_matches_unpadded():
    rng = np.random.default_rng(5)
    n, d, pad = 32, 3, 16
    fast = rng.normal(size=(n, d)).astype(np.float32)
    slow = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n)
    confs = rng.uniform(0.5, 1.0, n).astype(np.float32)
    unpadded = float(L.slow_fast_loss(jnp.asarray(fast), jnp.asarray(slow),
                                      jnp.asarray(labels), jnp.asarray(confs), 8))
    # pad inside each half so the half-split stays aligned
    def pad_half(x, fill=0.0):
        a, b = x[: n // 2], x[n // 2:]
        pz = np.full((pad // 2, *x.shape[1:]), fill, x.dtype)
        return np.concatenate([a, pz, b, pz], axis=0)
    fast_p = pad_half(fast)
    slow_p = pad_half(slow)
    labels_p = pad_half(labels, 0).astype(np.int32)
    confs_p = pad_half(confs)
    valid = pad_half(np.ones(n, np.float32)).astype(bool)
    padded = float(L.slow_fast_loss(jnp.asarray(fast_p), jnp.asarray(slow_p),
                                    jnp.asarray(labels_p), jnp.asarray(confs_p), 8,
                                    valid=jnp.asarray(valid)))
    np.testing.assert_allclose(padded, unpadded, rtol=2e-4)


def test_slow_fast_degenerate_returns_zero():
    fast = jnp.zeros((4, 3))
    slow = jnp.zeros((4, 3))
    labels = jnp.zeros(4, jnp.int32)
    confs = jnp.ones(4)
    valid = jnp.array([True, True, False, False])  # slow half empty
    out = float(L.slow_fast_loss(fast, slow, labels, confs, 4, valid=valid))
    assert out == 0.0


def test_segment_grouping_loss():
    rng = np.random.default_rng(6)
    n, c, g = 48, 5, 4
    feats = rng.normal(size=(n, c)).astype(np.float32)
    groups = rng.integers(0, g, n)
    confs = rng.uniform(0.2, 1.0, n).astype(np.float32)
    weights = np.ones(c, np.float32)
    ours = float(L.segment_grouping_loss(
        jnp.asarray(feats), jnp.asarray(groups), jnp.asarray(confs), g,
        jnp.asarray(weights)))
    # oracle: scatter_mean -> argmax -> conf-weighted CE mean
    means = np.stack([feats[groups == i].mean(axis=0) if np.any(groups == i)
                      else np.zeros(c) for i in range(g)])
    target = means.argmax(-1)[groups]
    ce = torch.nn.CrossEntropyLoss(reduction="none")(
        torch.from_numpy(feats), torch.from_numpy(target)).numpy()
    ref = float((ce * confs).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_linear_assignment_matches_scipy():
    import scipy.optimize
    rng = np.random.default_rng(7)
    n, c = 96, 8
    logits = rng.normal(size=(n, c)).astype(np.float32) * 3
    labels = rng.integers(0, 5, n)

    # oracle following reference train_panopli_tensorf.py:331-342
    probs = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
    uniq = sorted(np.unique(labels).tolist())[:c]
    cost = np.zeros((len(uniq), c))
    for li, lab in enumerate(uniq):
        cost[li] = -(probs[labels == lab].sum(0) / ((labels == lab).sum() + 1e-4))
    rows, cols = scipy.optimize.linear_sum_assignment(np.nan_to_num(cost))
    virtual = np.zeros_like(labels)
    for aidx, lidx in enumerate(rows):
        virtual[labels == uniq[lidx]] = cols[aidx]
    pred = logits.argmax(-1)
    confs = np.ones(n, np.float32)
    if np.any(virtual != pred):
        ce = torch.nn.CrossEntropyLoss(reduction="none")(
            torch.from_numpy(logits), torch.from_numpy(virtual)).numpy()
        ref = float((ce * confs).mean())
    else:
        ref = 0.0

    ours = float(L.linear_assignment_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(confs), 8))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("shape,seed,ties", [
    ((8, 8), 0, False),
    ((20, 32), 1, False),
    ((50, 50), 2, True),     # tie-heavy: quantized costs, many equal entries
    ((500, 500), 3, False),  # MOS linear_assignment scale (max_instances=500)
    ((128, 500), 4, True),
])
def test_hungarian_exact_vs_scipy(shape, seed, ties):
    """_hungarian_jax must achieve scipy's optimal cost on arbitrary matrices
    (greedy assignment is provably suboptimal on some of these), including
    tie-heavy and 500-label cases (MOS baseline, panopli_MOS.yaml:14)."""
    import scipy.optimize
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=shape).astype(np.float32)
    if ties:
        cost = np.round(cost * 2) / 2  # heavy quantization -> many exact ties
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    ref_total = cost[rows, cols].sum()
    ours = np.asarray(L._hungarian_jax(jnp.asarray(cost)))
    assert len(np.unique(ours)) == shape[0], "assignment must be injective"
    ours_total = cost[np.arange(shape[0]), ours].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5, atol=1e-4)


def test_hungarian_beats_greedy_case():
    """A classic matrix where greedy global-min assignment is suboptimal."""
    import scipy.optimize
    cost = np.array([[1.0, 3.0],
                     [2.0, 100.0]], np.float32)
    # greedy picks (0,0)=1 then (1,1)=100 -> 101; optimal is 3+2=5
    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    ref_total = cost[rows, cols].sum()
    assert ref_total == pytest.approx(5.0)
    ours = np.asarray(L._hungarian_jax(jnp.asarray(cost)))
    ours_total = cost[np.arange(2), ours].sum()
    np.testing.assert_allclose(ours_total, ref_total, rtol=1e-6)


def test_sce_loss_matches_reference_formula():
    rng = np.random.default_rng(8)
    logits = rng.normal(size=(20, 6)).astype(np.float32)
    probs = rng.dirichlet(np.ones(6), 20).astype(np.float32)
    w = rng.uniform(0.5, 1.5, 6).astype(np.float32)
    alpha, beta = 0.85, 0.15
    # oracle (reference loss.py:45-59)
    pt = torch.from_numpy(logits)
    lt = torch.from_numpy(probs)
    wt = torch.from_numpy(w)
    ce = torch.nn.CrossEntropyLoss(weight=wt, reduction="none")(pt, lt)
    pred = torch.softmax(pt * wt.unsqueeze(0), dim=1).clamp(1e-8, 1.0)
    label_clipped = lt.clamp(1e-8, 1.0)
    rce = (-(pred * torch.log(label_clipped) * wt)).sum(1)
    ref = (alpha * ce + beta * rce).numpy()
    ours = np.asarray(L.sce_loss(jnp.asarray(logits), jnp.asarray(probs),
                                 alpha, beta, jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
