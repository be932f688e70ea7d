"""Torch-checkpoint importer: build a reference-shaped state_dict with torch,
convert, and verify numerical equivalence layer by layer."""
import numpy as np
import pytest

import jax.numpy as jnp

from contrastive_lift_tpu.io.torch_import import (convert_state_dict,
                                                  convert_torch_checkpoint)
from contrastive_lift_tpu.models.tensorf import (TensoRFConfig, dino_head_apply,
                                                 mlp_apply)

torch = pytest.importorskip("torch")


def _make_reference_like_state_dict(grid=10, classes=5, max_instances=3):
    """Reference-layout tensors (tensoRF.py:34-106 shapes), random values."""
    g = torch.Generator().manual_seed(0)
    sd = {}
    matrix_mode = [[0, 1], [0, 2], [1, 2]]
    vector_mode = [2, 1, 0]
    def grids(name, c):
        for i in range(3):
            m0, m1 = matrix_mode[i]
            sd[f"model.{name}_plane.{i}"] = torch.randn(1, c, grid, grid, generator=g)
            sd[f"model.{name}_line.{i}"] = torch.randn(1, c, grid, 1, generator=g)
    grids("density", 16)
    grids("appearance", 48)
    sd["model.appearance_basis_mat.weight"] = torch.randn(27, 144, generator=g)
    for i, (din, dout) in enumerate([(150, 128), (128, 128), (128, 3)]):
        sd[f"model.render_appearance_mlp.mlp.{2*i}.weight"] = torch.randn(dout, din, generator=g)
        sd[f"model.render_appearance_mlp.mlp.{2*i}.bias"] = torch.randn(dout, generator=g)
    # xyz-MLP semantic head: 5 linears at indices 0,2,4,6,8
    dims = [(3, 256), (256, 256), (256, 256), (256, 256), (256, classes)]
    for i, (din, dout) in enumerate(dims):
        sd[f"model.render_semantic_mlp.mlp.{2*i}.weight"] = torch.randn(dout, din, generator=g)
        sd[f"model.render_semantic_mlp.mlp.{2*i}.bias"] = torch.randn(dout, generator=g)
    # slow-fast instance MLPs: 4 linears
    dims_i = [(3, 256), (256, 256), (256, 256), (256, max_instances)]
    for which in ("mlp", "slow_mlp"):
        for i, (din, dout) in enumerate(dims_i):
            sd[f"model.render_instance_mlp.{which}.{2*i}.weight"] = torch.randn(dout, din, generator=g)
            sd[f"model.render_instance_mlp.{which}.{2*i}.bias"] = torch.randn(dout, generator=g)
    sd["renderer.bbox_aabb"] = torch.tensor([[-1., -1., -1.], [1., 1., 1.]])
    sd["renderer.grid_dim"] = torch.tensor([grid, grid, grid])
    return sd


def test_convert_state_dict_structure_and_values():
    sd = _make_reference_like_state_dict()
    params, meta = convert_state_dict(sd)
    assert meta["grid_dim"] == [10, 10, 10]
    assert params["density"]["planes"][0].shape == (16, 10, 10)
    assert params["density"]["lines"][2].shape == (16, 10)
    # basis matmul equals torch linear
    x = torch.randn(7, 144)
    ref = torch.nn.functional.linear(x, sd["model.appearance_basis_mat.weight"])
    ours = x.numpy() @ params["appearance_basis"]["w"]
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-4)
    # appearance MLP forward equals torch Sequential
    layers = []
    for i, (din, dout) in enumerate([(150, 128), (128, 128), (128, 3)]):
        lin = torch.nn.Linear(din, dout)
        lin.weight.data = sd[f"model.render_appearance_mlp.mlp.{2*i}.weight"]
        lin.bias.data = sd[f"model.render_appearance_mlp.mlp.{2*i}.bias"]
        layers += [lin, torch.nn.ReLU()]
    seq = torch.nn.Sequential(*layers[:-1])
    x = torch.randn(5, 150)
    ref = seq(x).detach().numpy()
    ours = np.asarray(mlp_apply(params["appearance_mlp"], jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)
    # fast and slow instance MLPs both present with 4 layers
    assert len(params["instance_mlp"]["fast"]["layers"]) == 4
    assert len(params["instance_mlp"]["slow"]["layers"]) == 4


def test_dino_head_import_matches_torch_weight_norm():
    g = torch.Generator().manual_seed(1)
    sd = {
        "p.fast_proj.mlp.weight": torch.randn(8, 3, generator=g),
        "p.fast_proj.mlp.bias": torch.randn(8, generator=g),
        "p.fast_proj.last_layer.weight_v": torch.randn(32, 8, generator=g),
    }
    from contrastive_lift_tpu.io.torch_import import _import_dino_head
    head = _import_dino_head(sd, "p.fast_proj")
    # torch oracle: x -> linear -> l2norm -> weight-normed linear (g=1)
    x = torch.randn(6, 3, generator=g)
    h = torch.nn.functional.linear(x, sd["p.fast_proj.mlp.weight"],
                                   sd["p.fast_proj.mlp.bias"])
    h = torch.nn.functional.normalize(h, dim=-1)
    v = sd["p.fast_proj.last_layer.weight_v"]
    w = v / v.norm(dim=1, keepdim=True)
    ref = (h @ w.T).numpy()
    ours = np.asarray(dino_head_apply(head, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_full_ckpt_roundtrip_renders(tmp_path):
    """Converted checkpoint loads and drives our renderer."""
    sd = _make_reference_like_state_dict()
    ckpt = {"state_dict": sd, "epoch": 7, "global_step": 3500}
    torch.save(ckpt, tmp_path / "ref.ckpt")
    info = convert_torch_checkpoint(tmp_path / "ref.ckpt", tmp_path / "ours.npz")
    assert info["grid_dim"] == [10, 10, 10]

    from contrastive_lift_tpu.config import Config
    from contrastive_lift_tpu.inference.render import load_model_for_inference
    from contrastive_lift_tpu.renderer import render as R
    cfg = Config(max_instances=3, instance_loss_mode="slow_fast",
                 use_mlp_for_semantics=True, use_mlp_for_instances=True, seed=0)
    params, mcfg, rcfg, state_r, meta = load_model_for_inference(
        tmp_path / "ours.npz", cfg, num_semantic_classes=5, head_topk=None)
    rays = np.concatenate([
        np.zeros((4, 3)), np.tile([[0, 0, 1.]], (4, 1)),
        np.full((4, 1), 0.01), np.full((4, 1), 1.0)], -1).astype(np.float32)
    out = R.render_rays(params, mcfg, rcfg, state_r, jnp.asarray(rays))
    assert out["rgb"].shape == (4, 3)
    assert out["instances"].shape == (4, 6)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    # weight-norm variant of the dino head key naming also imports
    sd2 = dict(sd)
    sd2["model.proj_layer.fast_proj.mlp.weight"] = torch.randn(8, 3)
    sd2["model.proj_layer.fast_proj.mlp.bias"] = torch.randn(8)
    sd2["model.proj_layer.fast_proj.last_layer.weight_v"] = torch.randn(32, 8)
    sd2["model.proj_layer.slow_proj.mlp.weight"] = torch.randn(8, 3)
    sd2["model.proj_layer.slow_proj.mlp.bias"] = torch.randn(8)
    sd2["model.proj_layer.slow_proj.last_layer.weight_v"] = torch.randn(32, 8)
    params2, _ = convert_state_dict(sd2)
    assert "proj" in params2
