"""Randomized conservative-occupancy fuzz: every empty-space-skipping mode at
full budgets must reproduce the dense fused render EXACTLY on discrete fields.

The contract under test (ops/fused_grid.py occupancy builders +
renderer/render.py selection): any sample carrying compositing weight lies
inside a selected segment/sub-segment — the occupancy upper bounds
(block-dilated L1, tight-margin L2, grouped rows, bit-packed rows) are
conservative for the step geometry at BOTH step ratios (0.5 train, 0.25
inference; tight_occ_pads derives the margins). Fields use a raw -20
background so skipped space contributes exactly zero and any non-conservative
window/pad/grouping off-by-one shows up as a hard mismatch, not a tolerance
blur. Complements the targeted tests in test_two_level.py with random
geometry x mode coverage."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contrastive_lift_tpu.config import Config
from contrastive_lift_tpu.factory import build_model
from contrastive_lift_tpu.ops import fused_grid as fg
from contrastive_lift_tpu.renderer import render as R

GRID = 33


def _random_field(rng) -> jnp.ndarray:
    """A few random occupied boxes/shells on an exactly-empty background."""
    lin = np.linspace(-1, 1, GRID, dtype=np.float32)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    occ = np.zeros((GRID,) * 3, bool)
    for _ in range(rng.integers(2, 5)):
        kind = rng.integers(0, 2)
        c = rng.uniform(-0.6, 0.6, 3)
        if kind == 0:  # box
            half = rng.uniform(0.05, 0.25, 3)
            occ |= ((np.abs(X - c[0]) < half[0]) & (np.abs(Y - c[1]) < half[1])
                    & (np.abs(Z - c[2]) < half[2]))
        else:  # thin shell — the hard case for tight margins
            r0 = rng.uniform(0.15, 0.6)
            rr = np.sqrt((X - c[0]) ** 2 + (Y - c[1]) ** 2 + (Z - c[2]) ** 2)
            occ |= np.abs(rr - r0) < rng.uniform(0.04, 0.1)
    dens = rng.uniform(3.0, 14.0)
    return jnp.asarray(np.where(occ, dens, -20.0).astype(np.float32))


def _random_rays(rng, n=48):
    o = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([o, d, np.full((n, 1), 0.01, np.float32),
                           np.full((n, 1), 2.5, np.float32)], axis=-1)


@pytest.mark.parametrize("step_ratio", [0.25, 0.5])
@pytest.mark.parametrize("cs,sub", [(8, 4), (16, 8), (16, 4), (8, None)])
def test_full_budget_ess_matches_dense(step_ratio, cs, sub):
    cfg = Config(min_grid_dim=GRID, max_instances=3,
                 instance_loss_mode="slow_fast", use_DINO_style=True,
                 seed=0).resolve_epochs()
    mcfg, params, rcfg, state_r = build_model(cfg, 5, grid_dim=(GRID,) * 3,
                                              step_ratio=step_ratio)
    rng = np.random.default_rng(hash((step_ratio, cs, sub or 0)) % 2**31)
    dense_field = _random_field(rng)
    S = rcfg.n_samples
    full = dataclasses.replace(
        rcfg, coarse_stride=cs, sub_stride=sub,
        max_segments=-(-S // cs),
        max_subsegments=(-(-S // sub) if sub else 4))
    # the PRODUCTION builder (derives the tight-occupancy pads from the
    # actual step geometry — the round-2 advisor contract)
    fused = fg.build_render_grids(params, mcfg, full, state_r, compact=True,
                                  dense_override=dense_field)
    rays = _random_rays(rng)

    # dense reference: same fused density source, no ESS
    dense_cfg = dataclasses.replace(rcfg, coarse_stride=None, sub_stride=None)
    ref = R.render_rays(params, mcfg, dense_cfg, state_r, rays, None, False,
                        fused=fused)
    variants = {"cascade": R.occ_grouping_for(full, state_r)}
    if sub is not None:
        variants["l2only"] = dataclasses.replace(variants["cascade"],
                                                 use_l1=False)
        variants["term"] = dataclasses.replace(variants["cascade"],
                                               term_first=6,
                                               term_fraction=1.0)
    for name, rc in variants.items():
        out = R.render_rays(params, mcfg, rc, state_r, rays, None, False,
                            fused=fused)
        for k in ("rgb", "depth", "opacity", "semantics", "instances"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5,
                err_msg=f"{name}/{k} (ratio={step_ratio}, cs={cs}, sub={sub})")
        assert float(out["budget_tail"]) <= 1e-5, name
