"""Volume-rendering compositing primitives (alpha, transmittance, distortion).

Static-shape, fully vectorized; fp32 kept for the transmittance cumprod.
"""
from __future__ import annotations

import jax.numpy as jnp


def raw_to_alpha(sigma: jnp.ndarray, dist: jnp.ndarray):
    """(alpha, weights, bg_weight) from density and scaled segment lengths.

    sigma, dist: [R, S]. alpha = 1-exp(-sigma*dist); T = cumprod(1-alpha+1e-10)
    shifted by one; weights = alpha*T. Reference:
    model/renderer/panopli_tensoRF_renderer.py:626-631.
    """
    sigma = sigma.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    alpha = 1.0 - jnp.exp(-sigma * dist)
    ones = jnp.ones((*alpha.shape[:-1], 1), alpha.dtype)
    t = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1)
    weights = alpha * t[..., :-1]
    return alpha, weights, t[..., -1:]


def distortion_loss(weights: jnp.ndarray, midpoints: jnp.ndarray,
                    intervals: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF-360 distortion regularizer, O(S) prefix-sum form.

    loss = mean_r[ sum_{i,j} w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 d_i ]

    Same value as the reference's external ``torch_efficient_distloss
    .eff_distloss`` (used at panopli_tensoRF_renderer.py:30,101); JAX autodiff
    provides the backward, no custom VJP needed at these sizes.
    """
    w = weights.astype(jnp.float32)
    m = midpoints.astype(jnp.float32)
    loss_uni = (1.0 / 3.0) * jnp.mean(jnp.sum(w * w * intervals, axis=-1))
    wm = w * m
    w_cum = jnp.cumsum(w, axis=-1)
    wm_cum = jnp.cumsum(wm, axis=-1)
    loss_bi = 2.0 * jnp.mean(jnp.sum(
        wm[..., 1:] * w_cum[..., :-1] - w[..., 1:] * wm_cum[..., :-1], axis=-1))
    return loss_bi + loss_uni


def composite(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum over the sample axis: [R,S],[R,S,C] -> [R,C]."""
    return jnp.sum(weights[..., None] * values, axis=-2)
