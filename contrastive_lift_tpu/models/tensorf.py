"""TensoRF VM-decomposition radiance field with panoptic heads (functional).

The field is a pytree of parameters plus a frozen static config; every
``compute_*`` is a pure function ``(params, cfg, inputs) -> outputs`` that jits
and shards cleanly. Mirrors the capability surface of the reference
``TensorVMSplit`` (reference: model/radiance_field/tensoRF.py:32-315):

  * factorized density / appearance / semantic / instance / distilled-feature
    fields, each field(xyz) = sum over 3 axes of plane(x_m0,x_m1) * line(x_v);
  * MLP heads: view-dependent RGB, semantics, slow-fast instance embeddings,
    distilled DINO features, optional DINO projection heads;
  * grid lifecycle: bilinear upsample + AABB shrink (shape-changing, host-side).

Initialization matches torch semantics (factor grids ~ 0.1*N(0,1); Linear
layers kaiming-uniform fan-in) so training dynamics are comparable.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import (MATRIX_MODE, VECTOR_MODE, upsample_line,
                               upsample_plane, vm_density, vm_feature)


@dataclass(frozen=True)
class TensoRFConfig:
    num_semantic_classes: int
    dim_feature_instance: int
    num_density_comps: Tuple[int, int, int] = (16, 16, 16)
    num_appearance_comps: Tuple[int, int, int] = (48, 48, 48)
    num_semantics_comps: Optional[Tuple[int, int, int]] = (32, 32, 32)
    num_instance_comps: Optional[Tuple[int, int, int]] = (32, 32, 32)
    num_feature_comps: Tuple[int, int, int] = (48, 48, 48)
    dim_appearance: int = 27
    dim_semantics: int = 27
    dim_instances: int = 27
    splus_density_shift: float = -10.0
    pe_view: int = 2
    pe_feat: int = 2
    pe_sem: int = 0
    pe_ins: int = 0
    dim_mlp_color: int = 128
    dim_mlp_semantics: int = 128
    dim_mlp_instance: int = 256
    semantic_output_softmax: bool = True  # Softmax head iff semantic_weight_mode=="softmax"
    use_semantic_mlp: bool = True
    use_instance_mlp: bool = True
    use_distilled_features_semantic: bool = False
    use_distilled_features_instance: bool = False
    slow_fast_mode: bool = False
    use_proj: bool = False

    @property
    def use_distilled(self) -> bool:
        return self.use_distilled_features_semantic or self.use_distilled_features_instance

    @property
    def instance_out_channels(self) -> int:
        # each of fast/slow outputs half the rendered embedding in slow_fast mode
        return self.dim_feature_instance // 2 if self.slow_fast_mode else self.dim_feature_instance


def positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """[..., D] -> [..., 2*freqs*D]; per-dim frequencies vary fastest.

    Reference: tensoRF.py:413-418.
    """
    bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * bands).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


# ---------------------------------------------------------------------------
# Initializers (torch-parity)
# ---------------------------------------------------------------------------

def _linear_init(key, din: int, dout: int, bias: bool = True, zero_bias: bool = False):
    """torch.nn.Linear default init: U(-1/sqrt(din), 1/sqrt(din))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(din)
    params = {"w": jax.random.uniform(kw, (din, dout), jnp.float32, -bound, bound)}
    if bias:
        b = jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound)
        params["b"] = jnp.zeros((dout,)) if zero_bias else b
    return params


def _mlp_init(key, din: int, dim: int, dout: int, n_layers: int, zero_last_bias: bool = False):
    """n_layers Linears with ReLU between; mirrors the reference head builders."""
    keys = jax.random.split(key, n_layers)
    layers = [_linear_init(keys[0], din, dim if n_layers > 1 else dout)]
    for i in range(1, n_layers - 1):
        layers.append(_linear_init(keys[i], dim, dim))
    if n_layers > 1:
        layers.append(_linear_init(keys[-1], dim, dout, zero_bias=zero_last_bias))
    return {"layers": layers}


def _mlp_apply_raw(params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    layers = params["layers"]
    h = x.astype(compute_dtype)
    for i, layer in enumerate(layers):
        h = h @ layer["w"].astype(compute_dtype) + layer["b"].astype(compute_dtype)
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)


# Rematerialized: head MLPs run on millions of samples per step, so storing
# every inter-layer activation for backward OOMs at the reference training
# scale (e.g. the segment pass alone is 32k rays x 443 samples -> 3x13.7 GB of
# [P,256] activations). jax.checkpoint keeps only the MLP inputs and
# recomputes the layers in the backward pass — FLOPs for HBM, the standard
# trade (SURVEY §7).
_mlp_apply_ckpt = jax.checkpoint(_mlp_apply_raw, static_argnums=(2,))


def mlp_apply(params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    return _mlp_apply_ckpt(params, x, compute_dtype)


def _svd_grid_init(key, comps, grid_dim, scale: float = 0.1):
    """Per-axis plane [C, g_m1, g_m0] and line [C, g_v] factor grids ~ scale*N(0,1).

    Reference: tensoRF.py:99-106 (we drop torch's trailing singleton dims).
    """
    planes, lines = [], []
    for i in range(3):
        m0, m1 = MATRIX_MODE[i]
        v = VECTOR_MODE[i]
        key, kp, kl = jax.random.split(key, 3)
        planes.append(scale * jax.random.normal(kp, (comps[i], grid_dim[m1], grid_dim[m0])))
        lines.append(scale * jax.random.normal(kl, (comps[i], grid_dim[v])))
    return {"planes": tuple(planes), "lines": tuple(lines)}


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _dino_head_init(key, din: int, dout: int, bottleneck: int = 8):
    """DINOHead with nlayers=1: Linear(din, bottleneck) -> l2norm -> weight-normed
    Linear(bottleneck, dout, no bias) with fixed unit gain. Reference: tensoRF.py:514-548.
    """
    k1, k2 = jax.random.split(key)
    mlp = {"w": _trunc_normal(k1, (din, bottleneck)), "b": jnp.zeros((bottleneck,))}
    last_v = _linear_init(k2, bottleneck, dout, bias=False)["w"]
    return {"mlp": mlp, "last_v": last_v}


def dino_head_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    h = x @ params["mlp"]["w"] + params["mlp"]["b"]
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-12)
    v = params["last_v"]
    w = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12)  # unit-norm per output
    return h @ w


# ---------------------------------------------------------------------------
# Model init
# ---------------------------------------------------------------------------

def init_tensorf(key, cfg: TensoRFConfig, grid_dim) -> dict:
    """Initialize the full parameter pytree at a given grid resolution."""
    grid_dim = tuple(int(g) for g in grid_dim)
    keys = iter(jax.random.split(key, 24))
    params = {}
    params["density"] = _svd_grid_init(next(keys), cfg.num_density_comps, grid_dim)
    params["appearance"] = _svd_grid_init(next(keys), cfg.num_appearance_comps, grid_dim)
    params["appearance_basis"] = _linear_init(
        next(keys), sum(cfg.num_appearance_comps), cfg.dim_appearance, bias=False)
    # appearance MLP: in = feat + viewdir + PE(feat) + PE(viewdir); zero last bias
    in_app = (cfg.dim_appearance + 3 + 2 * cfg.pe_feat * cfg.dim_appearance
              + 2 * cfg.pe_view * 3)
    params["appearance_mlp"] = _mlp_init(
        next(keys), in_app, cfg.dim_mlp_color, 3, 3, zero_last_bias=True)

    extra = 64 if cfg.use_distilled_features_semantic else 0
    if cfg.use_semantic_mlp:
        in_sem = 3 + 2 * cfg.pe_sem * 3 + extra
        params["semantic_mlp"] = _mlp_init(next(keys), in_sem, 256, cfg.num_semantic_classes, 5)
    elif cfg.num_semantics_comps is not None:
        params["semantic"] = _svd_grid_init(next(keys), cfg.num_semantics_comps, grid_dim)
        params["semantic_basis"] = _linear_init(
            next(keys), sum(cfg.num_semantics_comps), cfg.dim_semantics, bias=False)
        in_sem = cfg.dim_semantics + extra
        params["semantic_mlp"] = _mlp_init(
            next(keys), in_sem, cfg.dim_mlp_semantics, cfg.num_semantic_classes, 3)

    extra_i = 64 if cfg.use_distilled_features_instance else 0
    ins_out = cfg.instance_out_channels
    if cfg.use_instance_mlp:
        in_ins = 3 + 2 * cfg.pe_ins * 3 + extra_i
        params["instance_mlp"] = {"fast": _mlp_init(next(keys), in_ins, cfg.dim_mlp_instance, ins_out, 4)}
        if cfg.slow_fast_mode:
            params["instance_mlp"]["slow"] = _mlp_init(next(keys), in_ins, cfg.dim_mlp_instance, ins_out, 4)
    elif cfg.num_instance_comps is not None:
        params["instance"] = _svd_grid_init(next(keys), cfg.num_instance_comps, grid_dim)
        params["instance_basis"] = _linear_init(
            next(keys), sum(cfg.num_instance_comps), cfg.dim_instances, bias=False)
        in_ins = cfg.dim_instances + extra_i
        params["instance_mlp"] = {"fast": _mlp_init(next(keys), in_ins, cfg.dim_mlp_instance, ins_out, 3)}
        if cfg.slow_fast_mode:
            params["instance_mlp"]["slow"] = _mlp_init(next(keys), in_ins, cfg.dim_mlp_instance, ins_out, 3)

    if cfg.use_distilled:
        params["feature"] = _svd_grid_init(next(keys), cfg.num_feature_comps, grid_dim)
        params["feature_basis"] = _linear_init(next(keys), sum(cfg.num_feature_comps), 96, bias=False)
        params["feature_mlp"] = _mlp_init(next(keys), 96, 256, 64, 3)

    if cfg.use_proj:
        params["proj"] = {"fast": _dino_head_init(next(keys), ins_out, 32),
                          "slow": _dino_head_init(next(keys), ins_out, 32)}
    return params


# ---------------------------------------------------------------------------
# Field evaluation (flat [P, ...] points, xyz already normalized to [-1,1])
# ---------------------------------------------------------------------------

def compute_density_raw(params, cfg: TensoRFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """Pre-activation density + shift. Reference: tensoRF.py:114-122."""
    d = params["density"]
    return vm_density(d["planes"], d["lines"], xyz) + cfg.splus_density_shift


def compute_density(params, cfg: TensoRFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(compute_density_raw(params, cfg, xyz))


def _branch_feature(params, name: str, xyz: jnp.ndarray) -> jnp.ndarray:
    g = params[name]
    feat = vm_feature(g["planes"], g["lines"], xyz)
    return feat @ params[f"{name}_basis"]["w"]


def render_appearance(params, cfg: TensoRFConfig, viewdirs, xyz,
                      compute_dtype=jnp.float32, feats=None) -> jnp.ndarray:
    """RGB head. Input order: [feat, viewdirs, PE(feat), PE(viewdirs)]
    (reference: tensoRF.py:400-411). ``feats`` may be precomputed (fused grid)."""
    if feats is None:
        feats = _branch_feature(params, "appearance", xyz)
    indata = [feats, viewdirs]
    if cfg.pe_feat > 0:
        indata.append(positional_encoding(feats, cfg.pe_feat))
    if cfg.pe_view > 0:
        indata.append(positional_encoding(viewdirs, cfg.pe_view))
    out = mlp_apply(params["appearance_mlp"], jnp.concatenate(indata, -1), compute_dtype)
    return jax.nn.sigmoid(out)


def render_distilled(params, cfg: TensoRFConfig, xyz, feats=None) -> jnp.ndarray:
    """64-d tanh distilled-feature head. Reference: tensoRF.py:90-94,139-140."""
    if feats is None:
        feats = _branch_feature(params, "feature", xyz)
    return jnp.tanh(mlp_apply(params["feature_mlp"], feats))


def _head_input(cfg, pe, xyz_or_feat, distilled):
    indata = [xyz_or_feat]
    if pe > 0:
        indata.append(positional_encoding(xyz_or_feat, pe))
    if distilled is not None:
        indata.append(distilled)
    return jnp.concatenate(indata, -1)


def semantic_backbone_feats(params, cfg: TensoRFConfig, xyz) -> jnp.ndarray:
    """Penultimate (backbone) features of the semantic MLP — the hook for the
    feature-regularization variant (reference: tensoRF.py:597-626, which uses
    a 384-d backbone + linear class head; here = all layers but the last)."""
    feat = xyz if cfg.use_semantic_mlp else _branch_feature(params, "semantic", xyz)
    pe = cfg.pe_sem if cfg.use_semantic_mlp else 0
    h = _head_input(cfg, pe, feat, None)
    layers = params["semantic_mlp"]["layers"]
    for layer in layers[:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    return h


def render_semantics(params, cfg: TensoRFConfig, xyz, distilled=None,
                     compute_dtype=jnp.float32, feats=None) -> jnp.ndarray:
    """Semantic head over xyz (use_semantic_mlp) or grid features.

    Reference: tensoRF.py:565-594 and 142-145.
    """
    if cfg.use_semantic_mlp:
        feat = xyz
        pe = cfg.pe_sem
    else:
        feat = feats if feats is not None else _branch_feature(params, "semantic", xyz)
        pe = 0
    d = distilled if cfg.use_distilled_features_semantic else None
    out = mlp_apply(params["semantic_mlp"], _head_input(cfg, pe, feat, d), compute_dtype)
    if cfg.semantic_output_softmax:
        out = jax.nn.softmax(out, axis=-1)
    return out


def render_instances(params, cfg: TensoRFConfig, xyz, distilled=None,
                     compute_dtype=jnp.float32, feats=None) -> jnp.ndarray:
    """Instance head; in slow_fast mode returns [fast, slow] concatenated.

    Reference: tensoRF.py:462-511 and 152-156.
    """
    if cfg.use_instance_mlp:
        feat = xyz
        pe = cfg.pe_ins
    else:
        feat = feats if feats is not None else _branch_feature(params, "instance", xyz)
        pe = 0
    d = distilled if cfg.use_distilled_features_instance else None
    mlp_in = _head_input(cfg, pe, feat, d)
    out = mlp_apply(params["instance_mlp"]["fast"], mlp_in, compute_dtype)
    if cfg.slow_fast_mode:
        slow = mlp_apply(params["instance_mlp"]["slow"], mlp_in, compute_dtype)
        out = jnp.concatenate([out, slow], axis=-1)
    return out


def apply_proj(params, fast_x, slow_x):
    """Optional DINO projection heads. Reference: tensoRF.py:551-562."""
    return (dino_head_apply(params["proj"]["fast"], fast_x),
            dino_head_apply(params["proj"]["slow"], slow_x))


# ---------------------------------------------------------------------------
# Grid lifecycle (host-side, shape-changing)
# ---------------------------------------------------------------------------

_GRID_BRANCHES = ("density", "appearance", "semantic", "instance", "feature")


def upsample_volume_grid(params: dict, res_target) -> dict:
    """Bilinear upsample all factor grids to a new resolution.

    Reference: tensoRF.py:179-197.
    """
    res = tuple(int(r) for r in res_target)
    out = dict(params)
    for name in _GRID_BRANCHES:
        if name not in params:
            continue
        g = params[name]
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MATRIX_MODE[i]
            v = VECTOR_MODE[i]
            planes.append(upsample_plane(g["planes"][i], (res[m1], res[m0])))
            lines.append(upsample_line(g["lines"][i], res[v]))
        out[name] = {"planes": tuple(planes), "lines": tuple(lines)}
    return out


def shrink_volume_grid(params: dict, t_l, b_r) -> dict:
    """Crop all factor grids to voxel range [t_l, b_r) per axis.

    Reference: tensoRF.py:158-177.
    """
    t_l = [int(x) for x in t_l]
    b_r = [int(x) for x in b_r]
    out = dict(params)
    for name in _GRID_BRANCHES:
        if name not in params:
            continue
        g = params[name]
        planes, lines = [], []
        for i in range(3):
            m0, m1 = MATRIX_MODE[i]
            v = VECTOR_MODE[i]
            planes.append(g["planes"][i][:, t_l[m1]:b_r[m1], t_l[m0]:b_r[m0]])
            lines.append(g["lines"][i][:, t_l[v]:b_r[v]])
        out[name] = {"planes": tuple(planes), "lines": tuple(lines)}
    return out


def grid_dim_of(params: dict) -> Tuple[int, int, int]:
    """Recover (gx, gy, gz) from the density factor shapes."""
    planes = params["density"]["planes"]
    # plane 0 is [C, g1, g0]; line 0 is [C, g2]
    g0, g1 = planes[0].shape[2], planes[0].shape[1]
    g2 = params["density"]["lines"][0].shape[1]
    return (g0, g1, g2)
