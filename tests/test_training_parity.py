"""GOLDEN TRAINING-STEP PARITY (VERDICT r2 missing #4): run the reference
torch model/renderer through the reference trainer's loss WIRING
(trainer/train_panopli_tensorf.py:148-228 phase 1, :256-312 phase 2) on
shared weights and a fixed batch, and require our phase losses AND parameter
gradients to match. Catches lambda-wiring / EMA-placement / TV-gating drift
that per-loss parity tests cannot.

Determinism: perturb=0 on both sides; the reference's random-background coin
is pinned heads-off (monkeypatched torch.rand) and ours by picking a PRNGKey
whose coin lands False.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_reference_parity import _build_pair, _rays  # noqa: E402
from test_reference_parity import ref as ref  # noqa: E402,F401  (fixture)

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _flat_cosine(tree_a, tree_b):
    va = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(tree_a)])
    vb = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(tree_b)])
    if np.linalg.norm(va) < 1e-12 and np.linalg.norm(vb) < 1e-12:
        return 1.0, 0.0  # both exactly zero: agree
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-30))
    rel = float(np.linalg.norm(va - vb) / (np.linalg.norm(vb) + 1e-30))
    return cos, rel


def _grad_sd(model, renderer):
    """state_dict of .grad tensors (zeros where no grad), importable by
    convert_state_dict like a weight checkpoint."""
    sd = {}
    named = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        p = named.get(k)
        g = p.grad if (p is not None and p.grad is not None) else torch.zeros_like(v)
        sd[f"model.{k}"] = g
    sd.update({f"renderer.{k}": v for k, v in renderer.state_dict().items()})
    return sd


def _boost_density(model, renderer, factor=20.0):
    """Random-init density sits ~softplus(-10) so every compositing weight is
    below raymarch_weight_thres and head gradients vanish on BOTH sides
    (vacuous parity). Scaling the shared density factors creates real
    surfaces; re-export so both sides keep identical weights."""
    from contrastive_lift_tpu.io.torch_import import convert_state_dict
    with torch.no_grad():
        for pl in model.density_plane:
            pl.mul_(factor)
        for ln in model.density_line:
            ln.mul_(factor)
    sd = {f"model.{k}": v for k, v in model.state_dict().items()}
    sd.update({f"renderer.{k}": v for k, v in renderer.state_dict().items()})
    params, _ = convert_state_dict(sd)
    return jax.tree.map(jnp.asarray, params)


def _no_coin_key(cfg_perturb=0.0):
    """A PRNGKey whose background coin (2nd split, uniform < 0.5) is False."""
    for seed in range(50):
        key = jax.random.PRNGKey(seed)
        _, rng_bg = jax.random.split(key)
        if float(jax.random.uniform(rng_bg, ())) >= 0.5:
            return key
    raise AssertionError("no key found")


def test_main_phase_golden_parity(ref, monkeypatch):
    """Phase-1 loss (rgb + TV + distortion + semantic CE) and its gradients
    on the main partition match the reference trainer wiring
    (train_panopli_tensorf.py:152-199)."""
    from model.loss.loss import TVLoss

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.io.torch_import import convert_state_dict
    from contrastive_lift_tpu.train.step import TrainGates, main_phase_loss

    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    params = _boost_density(model, renderer)
    classes = mcfg.num_semantic_classes
    rcfg = dataclasses.replace(rcfg, perturb=0.0)
    cfg = Config(max_instances=3, instance_loss_mode="slow_fast",
                 semantic_weight_mode="none", weight_class_0=1.0,
                 probabilistic_ce_mode="NoTTAConf", perturb=0.0, seed=0,
                 ess_train_stride=0).resolve_epochs()
    lambda_dist_reg = 0.01
    epoch = cfg.late_semantic_optimization  # semantics on, instances off

    rng_np = np.random.default_rng(7)
    rays = _rays(n=128, seed=11)
    n = rays.shape[0]
    rgbs = rng_np.random((n, 3)).astype(np.float32)
    sem_t = rng_np.integers(1, classes, n)
    confs = rng_np.random(n).astype(np.float32)
    mask = rng_np.random(n) > 0.1

    # ---- reference wiring ----
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.tensor([0.9]))
    model.train()
    rays_t = torch.tensor(rays)
    out = renderer(model, rays_t, 0.0, False, True)
    out_rgb, out_sem, _, _, _, dist_reg = out
    rgbs_t = torch.tensor(rgbs)
    confs_t = torch.tensor(confs)
    mask_t = torch.tensor(mask)
    out_rgb = out_rgb.clone()
    out_rgb[~mask_t, :] = 0
    rgbs_t[~mask_t, :] = 0
    confs_t[~mask_t] = 0
    loss_rgb = torch.nn.MSELoss()(out_rgb, rgbs_t)
    ref_cfg = type("C", (), dict(
        late_semantic_optimization=cfg.late_semantic_optimization,
        instance_optimization_epoch=cfg.instance_optimization_epoch,
        lambda_tv_density=cfg.lambda_tv_density,
        lambda_tv_appearance=cfg.lambda_tv_appearance,
        lambda_tv_semantics=cfg.lambda_tv_semantics,
        lambda_tv_instances=cfg.lambda_tv_instances))()
    loss_tv = model.total_tv_loss(TVLoss(), ref_cfg, epoch)
    ce = torch.nn.CrossEntropyLoss(reduction="none",
                                   weight=torch.ones(classes))
    loss_sem = (ce(out_sem, torch.tensor(sem_t)) * confs_t).mean()
    loss_ref = (cfg.lambda_rgb * (loss_rgb + loss_tv
                                  + dist_reg * lambda_dist_reg)
                + cfg.lambda_semantics * loss_sem)
    model.zero_grad()
    loss_ref.backward()
    grads_ref, _ = convert_state_dict(_grad_sd(model, renderer))
    grads_ref = jax.tree.map(jnp.asarray, grads_ref)

    # ---- ours ----
    batch = {"rays": jnp.asarray(rays), "rgbs": jnp.asarray(rgbs),
             "semantics": jnp.asarray(sem_t),
             "probabilities": jnp.asarray(np.eye(classes, dtype=np.float32)[sem_t]),
             "confidences": jnp.asarray(confs), "mask": jnp.asarray(mask)}
    gates = TrainGates(semantics_on=True)
    weights = jnp.ones(classes)

    def loss_fn(p):
        return main_phase_loss(p, cfg, mcfg, rcfg, state_r, gates, batch,
                               _no_coin_key(), lambda_dist_reg, weights)[0]

    loss_ours, grads_ours = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-3)

    # gradient parity on the main-partition branches the reference trains;
    # the rgb-head chain must be genuinely exercised, not vacuously zero
    assert float(sum(jnp.linalg.norm(x) for x in
                     jax.tree.leaves(grads_ours["appearance_mlp"]))) > 1e-6
    for branch in ("density", "appearance", "appearance_basis",
                   "appearance_mlp", "semantic_mlp"):
        cos, rel = _flat_cosine(grads_ours[branch], grads_ref[branch])
        assert cos > 0.999 and rel < 3e-2, (branch, cos, rel)


def test_instance_phase_golden_parity(ref, monkeypatch):
    """Phase-2 slow-fast clustering loss + fast-branch gradients + the EMA
    placement match the reference wiring (train_panopli_tensorf.py:213-221,
    256-312: forward BEFORE the per-image EMA; slow detached)."""
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.io.torch_import import convert_state_dict
    from contrastive_lift_tpu.train.step import instance_phase_loss

    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    params = _boost_density(model, renderer)
    rcfg = dataclasses.replace(rcfg, perturb=0.0)
    cfg = Config(max_instances=3, instance_loss_mode="slow_fast",
                 semantic_weight_mode="none", weight_class_0=1.0,
                 perturb=0.0, seed=0, max_labels_per_image=8,
                 ess_train_stride=0).resolve_epochs()

    rng_np = np.random.default_rng(13)
    rays = _rays(n=96, seed=17)
    n = rays.shape[0]
    labels = rng_np.integers(0, 3, n)
    confs = rng_np.random(n).astype(np.float32)

    # ---- reference wiring ----
    model.train()
    feats_t, points_t = renderer.forward_instance_feature(
        model, torch.tensor(rays), 0.0, True)
    half = mcfg.dim_feature_instance // 2
    fast, slow = feats_t.split([half, half], dim=-1)
    slow = slow.detach()
    labels_t = torch.tensor(labels)
    confs_t = torch.tensor(confs)
    fast_mask = torch.zeros_like(labels_t).bool()
    fast_mask[: n // 2] = True
    slow_mask = ~fast_mask
    fast_labels = torch.unique(labels_t[fast_mask])
    slow_labels = torch.unique(labels_t[slow_mask])
    slow_centroids = torch.stack([
        slow[torch.logical_and(slow_mask, labels_t == l)].mean(dim=0)
        for l in slow_labels])
    inter = fast_labels[torch.where(torch.isin(fast_labels, slow_labels))]
    loss_ref = 0
    for l in inter:
        m = torch.logical_and(fast_mask, labels_t == l)
        c = slow_centroids[slow_labels == l]
        dist_sq = torch.pow(fast[m] - c, 2).sum(dim=-1)
        loss_ref += -1.0 * (torch.exp(-dist_sq / 1.0) * confs_t[m]).mean()
    loss_ref = loss_ref / inter.shape[0]
    label_matrix = labels_t[fast_mask].unsqueeze(1) == labels_t[slow_mask].unsqueeze(0)
    sim = torch.exp(-torch.cdist(fast[fast_mask], slow[slow_mask], p=2) / 1.0)
    logits = torch.exp(sim)
    prob = torch.mul(logits, label_matrix).sum(dim=-1) / logits.sum(dim=-1)
    loss_ref = loss_ref + -torch.log(
        torch.masked_select(prob, prob.ne(0))).mean()
    model.zero_grad()
    loss_ref.backward()
    grads_ref, _ = convert_state_dict(_grad_sd(model, renderer))

    # ---- ours (one image; coeff 0.9^0 = identity matches forward-pre-EMA) ----
    batch_inst = {"rays": jnp.asarray(rays)[None],
                  "labels": jnp.asarray(labels)[None],
                  "confidences": jnp.asarray(confs)[None],
                  "valid": jnp.ones((1, n), bool)}

    def loss_fn(p):
        return instance_phase_loss(p, cfg, mcfg, rcfg, state_r, batch_inst,
                                   jax.random.PRNGKey(0))[0]

    loss_ours, grads_ours = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-3)
    cos, rel = _flat_cosine(grads_ours["instance_mlp"]["fast"],
                            jax.tree.map(jnp.asarray,
                                         grads_ref["instance_mlp"]["fast"]))
    # f32 accumulation-order noise through exp/cdist chains puts rel ~3-4%;
    # direction is what catches wiring drift
    assert cos > 0.999 and rel < 6e-2, (cos, rel)


def test_segment_phase_golden_parity(ref):
    """Phase-3 segment-grouping loss + semantic-branch gradients match the
    reference wiring (train_panopli_tensorf.py:185-195: forward_segment_feature
    over the concatenated stream -> scatter_mean by 2D segment -> argmax target
    -> conf-weighted CE), including the stop-grad density
    (panopli_tensoRF_renderer.py:268-271 renders sigma under no_grad)."""
    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.io.torch_import import convert_state_dict
    from contrastive_lift_tpu.train.step import segment_phase_loss

    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    params = _boost_density(model, renderer)
    classes = mcfg.num_semantic_classes
    rcfg = dataclasses.replace(rcfg, perturb=0.0)
    num_groups = 4
    cfg = Config(max_instances=3, instance_loss_mode="slow_fast",
                 semantic_weight_mode="none", weight_class_0=1.0,
                 perturb=0.0, seed=0, batch_size_segments=num_groups,
                 segment_grouping_mode="argmax_conf", chunk_segment=48,
                 ess_train_stride=0).resolve_epochs()

    rng_np = np.random.default_rng(23)
    rays = _rays(n=96, seed=29)
    n = rays.shape[0]
    group = rng_np.integers(0, num_groups, n)
    confs = rng_np.random(n).astype(np.float32)

    # ---- reference wiring (trainer :186-195; scatter_mean emulated with
    # index_add — empty groups keep mean 0, matching torch_scatter) ----
    model.train()
    feats_t = renderer.forward_segment_feature(
        model, torch.tensor(rays), 0.0, True)
    group_t = torch.tensor(group)
    sums = torch.zeros(num_groups, classes).index_add(0, group_t, feats_t)
    counts = torch.zeros(num_groups).index_add(
        0, group_t, torch.ones(n)).clamp(min=1.0)
    batch_target_mean = sums / counts[:, None]
    target = batch_target_mean[group_t].argmax(-1)
    ce = torch.nn.CrossEntropyLoss(reduction="none",
                                   weight=torch.ones(classes))
    loss_ref = (ce(feats_t, target) * torch.tensor(confs)).mean()
    model.zero_grad()
    loss_ref.backward()
    grads_ref, _ = convert_state_dict(_grad_sd(model, renderer))
    grads_ref = jax.tree.map(jnp.asarray, grads_ref)

    # ---- ours (chunk_segment=48 exercises the lax.map chunking: 2 chunks) --
    batch_seg = {"rays": jnp.asarray(rays), "group": jnp.asarray(group),
                 "confidences": jnp.asarray(confs)}
    weights = jnp.ones(classes)

    def loss_fn(p):
        return segment_phase_loss(p, cfg, mcfg, rcfg, state_r, batch_seg,
                                  jax.random.PRNGKey(0), weights)[0]

    loss_ours, grads_ours = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-3)

    # the semantic chain must be genuinely exercised, not vacuously zero
    # (paper xyz-MLP semantics: the 5x256 MLP is the head's only trainable
    # branch — there is no semantic grid in this variant)
    assert float(sum(jnp.linalg.norm(x) for x in
                     jax.tree.leaves(grads_ours["semantic_mlp"]))) > 1e-6
    cos, rel = _flat_cosine(grads_ours["semantic_mlp"],
                            grads_ref["semantic_mlp"])
    assert cos > 0.999 and rel < 3e-2, (cos, rel)
    # density must NOT receive gradient (reference renders sigma under
    # no_grad; ours uses stop-grad fused density)
    dnorm = float(sum(jnp.linalg.norm(x) for x in
                      jax.tree.leaves(grads_ours["density"])))
    assert dnorm == 0.0, dnorm
