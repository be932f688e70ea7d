"""Pallas TPU kernel: in-VMEM trilinear interpolation over brick-atlas rows.

The two-level fine density pass gathers, per sample, one 128-lane row holding
the 5x5x5 corner lattice of the sample's 4-voxel brick (lane a*25+b*5+c =
corner (a,b,c); lanes 125-127 pad). The trilinear value is

    sum_{a,b,c} row[a,b,c] * hat(px-a) * hat(py-b) * hat(pz-c),

where (px,py,pz) in [0,4) is the in-brick position and hat(t)=max(0,1-|t|):
exactly the 8-corner trilinear interpolation of the sample's cell, written as
a dense 125-lane reduction so no dynamic lane indexing is needed.

Status (measured on v5e, PERFORMANCE.md): the production path is the SAME
lane formulation written in plain XLA (ops/fused_grid.py::
sample_density_brick) — XLA fuses gather + weight build + reduction into one
pass (15.8 ms / 3.1M samples), while calling this kernel forces the gathered
[P,128] rows to materialize in HBM first (gather 16 ms + kernel 15.5 ms; the
kernel's own floor is ~10.7 ms of grid/pipeline overhead even as a pure
copy-reduce). The kernel is kept as the measured alternative and regression
reference (tests/test_brick_atlas.py) — revisit if the fine pass ever needs
per-sample work XLA refuses to fuse (e.g. in-kernel DMA of segment bricks).

Replaces the hot inner loop of the reference's grid_sample marcher
(reference: model/radiance_field/tensoRF.py:114-134 via F.grid_sample).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048


def default_interpret() -> bool:
    """Interpreter mode off only on real TPU backends (CPU tests interpret)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _interp_kernel(rows_ref, frac_ref, out_ref):
    rows = rows_ref[:]                                  # [B, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    a = (lane // 25).astype(jnp.float32)
    b = ((lane // 5) % 5).astype(jnp.float32)
    c = (lane % 5).astype(jnp.float32)
    px = frac_ref[:, 0:1]                               # [B, 1]
    py = frac_ref[:, 1:2]
    pz = frac_ref[:, 2:3]
    w = (jnp.maximum(0.0, 1.0 - jnp.abs(px - a))
         * jnp.maximum(0.0, 1.0 - jnp.abs(py - b))
         * jnp.maximum(0.0, 1.0 - jnp.abs(pz - c)))
    t = rows.astype(jnp.float32) * w                    # [B, 128]
    val = jnp.sum(t, axis=1, keepdims=True)             # [B, 1]
    out_ref[:] = jnp.broadcast_to(val, out_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brick_interp(rows: jnp.ndarray, frac: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """[P, 128] brick rows + [P, 3] in-brick positions -> [P] trilinear values.

    ``interpret`` runs the kernel in interpreter mode (CPU tests).
    """
    P = rows.shape[0]
    pad = (-P) % _BLOCK
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        frac = jnp.pad(frac, ((0, pad), (0, 0)))
    frac8 = jnp.pad(frac.astype(jnp.float32), ((0, 0), (0, 5)))
    n = rows.shape[0] // _BLOCK
    out = pl.pallas_call(
        _interp_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 8), jnp.float32),
        interpret=interpret,
    )(rows, frac8)
    return out[:P, 0]
