"""GOLDEN PARITY: run the ACTUAL reference torch implementation (mounted at
/root/reference) and ours on the SAME weights and rays, and require map-level
agreement. This is the end-to-end guard against silent PQ-changers (softplus
shift, distance_scale, semantic softmax-log epsilons, weight-thres masking,
compositing order) that per-op parity tests cannot catch (VERDICT r1 next #3).

The reference tree is imported read-only with stubs for third-party packages
absent from this environment (imgviz/trimesh/ballpark/transforms3d/
torch_efficient_distloss); the stubbed eff_distloss is the mip-NeRF-360
quadratic definition, mathematically identical to the package's O(N) form.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _eff_distloss(w, m, interval):
    """mip-NeRF-360 distortion: sum_ij w_i w_j |m_i-m_j| + (1/3) sum w^2 d,
    mean over rays — the definition torch_efficient_distloss implements."""
    pair = (w[:, :, None] * w[:, None, :]
            * (m[:, :, None] - m[:, None, :]).abs()).sum(dim=(1, 2))
    uni = (w.pow(2) * interval).sum(-1) / 3.0
    return (pair + uni).mean()


@pytest.fixture(scope="module")
def ref():
    """Import the reference model/renderer with dependency stubs."""
    _stub("imgviz", draw=_stub("imgviz.draw"))
    _stub("trimesh", PointCloud=object)
    _stub("ballpark", business=lambda x: str(x))
    t3d = _stub("transforms3d")
    t3d.euler = _stub("transforms3d.euler", euler2mat=None)
    t3d.axangles = _stub("transforms3d.axangles", axangle2mat=None)
    t3d.quaternions = _stub("transforms3d.quaternions", quat2mat=None)
    _stub("torch_efficient_distloss", eff_distloss=_eff_distloss)
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import model.radiance_field.tensoRF as ref_tensorf
    import model.renderer.panopli_tensoRF_renderer as ref_renderer
    import util.panoptic_quality as ref_pq
    return types.SimpleNamespace(tensorf=ref_tensorf, renderer=ref_renderer,
                                 pq=ref_pq)


def _build_pair(ref, *, use_mlp_semantics, use_mlp_instances, slow_fast,
                semantic_weight_mode, grid=14, classes=6, max_instances=3,
                seed=0, bbox=((-1.2, -0.9, -1.0), (0.8, 1.1, 1.0))):
    """Reference (model, renderer) + our (params, mcfg, rcfg, state_r) sharing
    the reference's randomly initialized weights."""
    torch.manual_seed(seed)
    out_sem = (torch.nn.Softmax(dim=-1) if semantic_weight_mode == "softmax"
               else torch.nn.Identity())
    dim_feat_inst = 2 * max_instances if slow_fast else max_instances
    model = ref.tensorf.TensorVMSplit(
        [grid, grid, grid], num_semantics_comps=(32, 32, 32),
        num_instance_comps=(32, 32, 32), num_semantic_classes=classes,
        dim_feature_instance=dim_feat_inst, output_mlp_semantics=out_sem,
        use_semantic_mlp=use_mlp_semantics, use_instance_mlp=use_mlp_instances,
        slow_fast_mode=slow_fast)
    bbox_t = torch.tensor(bbox, dtype=torch.float32)
    renderer = ref.renderer.TensoRFRenderer(
        bbox_t, [grid, grid, grid], semantic_weight_mode=semantic_weight_mode)
    model.eval()

    sd = {f"model.{k}": v for k, v in model.state_dict().items()}
    sd.update({f"renderer.{k}": v for k, v in renderer.state_dict().items()})

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.factory import make_model_config, make_render_config
    from contrastive_lift_tpu.io.torch_import import convert_state_dict
    from contrastive_lift_tpu.renderer import render as R

    params, meta = convert_state_dict(sd)
    cfg = Config(max_instances=max_instances,
                 instance_loss_mode="slow_fast" if slow_fast else "contrastive",
                 use_mlp_for_semantics=use_mlp_semantics,
                 use_mlp_for_instances=use_mlp_instances,
                 semantic_weight_mode=semantic_weight_mode, seed=0)
    mcfg = make_model_config(cfg, classes)
    bbox_np = np.asarray(bbox, np.float32)
    rcfg = make_render_config(cfg, bbox_np, (grid,) * 3, mcfg)
    state_r = R.make_render_state(bbox_np, (grid,) * 3)
    import jax
    import jax.numpy as jnp
    params = jax.tree.map(jnp.asarray, params)
    assert rcfg.n_samples == renderer.n_samples, (
        f"sample-count mismatch: ours {rcfg.n_samples} vs reference "
        f"{renderer.n_samples}")
    return model, renderer, params, mcfg, rcfg, state_r


def _rays(n=96, seed=3, inside=True):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-0.3, 0.4, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    near = np.full((n, 1), 0.05, np.float32)
    far = np.full((n, 1), 1.6, np.float32)
    return np.concatenate([origins, dirs, near, far], -1).astype(np.float32)


@pytest.mark.parametrize("variant", ["paper_xyz_mlp", "grid_heads", "softmax_mode"])
def test_forward_map_parity(ref, variant):
    """rgb / semantic / instance / depth maps + distortion reg must match the
    reference forward bit-for-bit up to float tolerance
    (reference: panopli_tensoRF_renderer.py:80-176)."""
    kw = dict(use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
              semantic_weight_mode="none")
    if variant == "grid_heads":
        kw.update(use_mlp_semantics=False, use_mlp_instances=False,
                  slow_fast=False)
    if variant == "softmax_mode":
        kw.update(semantic_weight_mode="softmax")
    model, renderer, params, mcfg, rcfg, state_r = _build_pair(ref, **kw)
    rays = _rays()

    with torch.no_grad():
        rgb_t, sem_t, inst_t, depth_t, _, dist_t = renderer(
            model, torch.from_numpy(rays), perturb=False, white_bg=False,
            is_train=False)

    from contrastive_lift_tpu.renderer import render as R
    import jax.numpy as jnp
    out = R.render_rays(params, mcfg, rcfg, state_r, jnp.asarray(rays))

    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_t.numpy(),
                               atol=2e-4, err_msg="rgb map diverged")
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_t.numpy(),
                               atol=2e-4, err_msg="depth map diverged")
    np.testing.assert_allclose(np.asarray(out["semantics"]), sem_t.numpy(),
                               atol=3e-4, err_msg="semantic map diverged")
    np.testing.assert_allclose(np.asarray(out["instances"]), inst_t.numpy(),
                               atol=3e-4, err_msg="instance map diverged")
    np.testing.assert_allclose(float(out["dist_reg"]), float(dist_t),
                               rtol=1e-3, atol=1e-6,
                               err_msg="distortion regularizer diverged")


def test_forward_map_parity_white_bg(ref):
    """The white-background compositing path (reference :164-165)."""
    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    import dataclasses
    rcfg = dataclasses.replace(rcfg, white_bg=True)
    rays = _rays(seed=11)
    with torch.no_grad():
        rgb_t, *_ = renderer(model, torch.from_numpy(rays), perturb=False,
                             white_bg=True, is_train=False)
    from contrastive_lift_tpu.renderer import render as R
    import jax.numpy as jnp
    out = R.render_rays(params, mcfg, rcfg, state_r, jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_t.numpy(), atol=2e-4)


def test_instance_feature_pass_parity(ref):
    """forward_instance_feature: instance embedding map + surface points
    (reference: panopli_tensoRF_renderer.py:178-217)."""
    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    rays = _rays(seed=7)
    with torch.no_grad():
        inst_t, pts_t = renderer.forward_instance_feature(
            model, torch.from_numpy(rays), perturb=False, is_train=False)

    from contrastive_lift_tpu.renderer import render as R
    import jax.numpy as jnp
    feats, pts = R.render_instance_features(params, mcfg, rcfg, state_r,
                                            jnp.asarray(rays), None,
                                            is_train=False)
    np.testing.assert_allclose(np.asarray(feats), inst_t.numpy(), atol=3e-4,
                               err_msg="instance feature map diverged")
    np.testing.assert_allclose(np.asarray(pts), pts_t.numpy(), atol=2e-4,
                               err_msg="surface points diverged")


def test_fused_grid_path_matches_reference(ref):
    """The production inference fast path (fused dense grids + top-k heads)
    must stay within a tight fidelity envelope of the reference forward."""
    model, renderer, params, mcfg, rcfg, state_r = _build_pair(
        ref, use_mlp_semantics=True, use_mlp_instances=True, slow_fast=True,
        semantic_weight_mode="none")
    rays = _rays(seed=5)
    with torch.no_grad():
        rgb_t, sem_t, inst_t, depth_t, _, _ = renderer(
            model, torch.from_numpy(rays), perturb=False, white_bg=False,
            is_train=False)

    import dataclasses
    import jax
    import jax.numpy as jnp
    from contrastive_lift_tpu.ops.fused_grid import build_fused_grids
    from contrastive_lift_tpu.renderer import render as R
    fused = jax.jit(lambda p: build_fused_grids(p, mcfg))(params)
    rcfg_fast = dataclasses.replace(rcfg, head_topk=max(64, rcfg.n_samples // 4))
    out = R.render_rays(params, mcfg, rcfg_fast, state_r, jnp.asarray(rays),
                        fused=fused)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_t.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["semantics"]), sem_t.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["instances"]), inst_t.numpy(),
                               atol=5e-3)


def test_panoptic_quality_matches_reference_impl(ref, monkeypatch):
    """Our vectorized-numpy PQ == the reference torchmetrics-derived PQ on
    random and adversarial label maps (reference: util/panoptic_quality.py:225)."""
    from contrastive_lift_tpu.metrics.panoptic_quality import panoptic_quality
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    rng = np.random.default_rng(0)
    for trial in range(6):
        n = 4096
        sem_p = rng.integers(0, 5, n)
        sem_t = rng.integers(0, 5, n)
        # blocky instances so IoU>0.5 matches actually occur
        inst_p = np.repeat(rng.integers(0, 6, n // 64), 64)
        inst_t = np.repeat(rng.integers(0, 6, n // 64), 64)
        if trial % 2 == 0:  # half-aligned: copy most of target into pred
            keep = rng.random(n) < 0.7
            sem_p = np.where(keep, sem_t, sem_p)
            inst_p = np.where(keep, inst_t, inst_p)
        pred = np.stack([sem_p, inst_p], -1)
        target = np.stack([sem_t, inst_t], -1)
        things, stuff = {1, 2}, {0, 3, 4}
        ref_pq, ref_sq, ref_rq = ref.pq.panoptic_quality(
            torch.from_numpy(pred), torch.from_numpy(target), things, stuff,
            allow_unknown_preds_category=True)
        pq, sq, rq = panoptic_quality(pred, target, things, stuff,
                                      allow_unknown_preds_category=True)
        np.testing.assert_allclose(pq, float(ref_pq), atol=1e-6,
                                   err_msg=f"PQ diverged on trial {trial}")
        np.testing.assert_allclose(sq, float(ref_sq), atol=1e-6)
        np.testing.assert_allclose(rq, float(ref_rq), atol=1e-6)
