"""Latent-conditioned TensoRF variant (functional).

Capability match for the reference's ``ConditionalTensorVMSplit`` +
``ConditionalMLPRenderFeature`` (reference: tensoRF.py:319-459; unused by the
paper's main path): every branch is conditioned on a per-scene/object latent
code — density goes through a (latent-aware) MLP instead of the plain
softplus, and the appearance MLP receives the latent alongside features +
view directions.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import tensorf as tf


@dataclass(frozen=True)
class ConditionalConfig:
    base: tf.TensoRFConfig
    latent_dim: int = 16
    dim_density: int = 12
    dim_mlp_density: int = 32


def init_conditional(key, ccfg: ConditionalConfig, grid_dim) -> dict:
    """Base params + density basis/MLP + latent-aware appearance MLP."""
    params = tf.init_tensorf(key, ccfg.base, grid_dim)
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 7), 3)
    params["density_basis"] = tf._linear_init(
        k1, sum(ccfg.base.num_density_comps), ccfg.dim_density, bias=False)
    # density MLP: in = feat + latent; final layer bias-free (softplus output)
    in_d = ccfg.dim_density + ccfg.latent_dim
    mlp = tf._mlp_init(k2, in_d, ccfg.dim_mlp_density, 1, 3)
    mlp["layers"][-1].pop("b", None)
    params["density_mlp"] = mlp
    # appearance MLP re-initialized with +latent input channels
    base = ccfg.base
    in_app = (base.dim_appearance + 3 + 2 * base.pe_feat * base.dim_appearance
              + 2 * base.pe_view * 3 + ccfg.latent_dim)
    params["appearance_mlp"] = tf._mlp_init(
        k3, in_app, base.dim_mlp_color, 3, 3, zero_last_bias=True)
    return params


def _mlp_no_last_bias(params_mlp, x):
    layers = params_mlp["layers"]
    h = x
    for i, layer in enumerate(layers):
        h = h @ layer["w"]
        if "b" in layer:
            h = h + layer["b"]
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    return h


def compute_density_conditional(params, ccfg: ConditionalConfig, xyz, latents):
    """softplus(MLP([grid_feature, latent]) + shift). Reference: tensoRF.py:361-363."""
    d = params["density"]
    from ..ops.grid_sample import vm_feature
    feat = vm_feature(d["planes"], d["lines"], xyz) @ params["density_basis"]["w"]
    mlp_in = jnp.concatenate([feat, latents], axis=-1)
    raw = _mlp_no_last_bias(params["density_mlp"], mlp_in)[..., 0]
    return jax.nn.softplus(raw + ccfg.base.splus_density_shift)


def render_appearance_conditional(params, ccfg: ConditionalConfig, viewdirs,
                                  xyz, latents):
    """sigmoid(MLP([feat, viewdirs, PE(feat), PE(view), latent]))."""
    base = ccfg.base
    feats = tf._branch_feature(params, "appearance", xyz)
    indata = [feats, viewdirs]
    if base.pe_feat > 0:
        indata.append(tf.positional_encoding(feats, base.pe_feat))
    if base.pe_view > 0:
        indata.append(tf.positional_encoding(viewdirs, base.pe_view))
    indata.append(latents)
    out = tf.mlp_apply(params["appearance_mlp"], jnp.concatenate(indata, -1))
    return jax.nn.sigmoid(out)
