"""Train state: parameter partitions + the two optimizer chains.

The reference uses two torch optimizers under Lightning "manual optimization"
(reference: trainer/train_panopli_tensorf.py:89,98-103,148-228): a main Adam
(betas 0.9/0.99) over density/appearance/semantic/feature branches with grids
at lr*20, and an instance Adam (betas 0.9/0.999) over the instance branch,
excluding the EMA slow net in DINO-style training. Here both become optax
partitions over one parameter pytree; a single jitted step applies phase-1 and
phase-2 updates.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

# partition labels
MAIN_GRID_WD = "main_grid_wd"   # density grids: lr*20 + weight decay
MAIN_GRID = "main_grid"          # appearance/semantic/feature grids: lr*20
MAIN_NET = "main_net"            # basis mats + appearance/semantic/feature MLPs
INST_GRID = "inst_grid"          # instance grids: lr*20
INST_NET = "inst_net"            # instance basis + fast MLP + fast proj
INST_SLOW = "inst_slow"          # slow MLP + slow proj (optimizer-trained unless DINO)
FROZEN = "frozen"

_MAIN_GRID_BRANCHES = ("appearance", "semantic", "feature")
_MAIN_NET_KEYS = ("appearance_basis", "appearance_mlp", "semantic_basis",
                  "semantic_mlp", "feature_basis", "feature_mlp")


def build_labels(params: dict, use_dino_style: bool) -> dict:
    """Label pytree aligned with ``params`` for optax.multi_transform."""
    def fill(tree, label):
        return jax.tree.map(lambda _: label, tree)

    labels: dict = {}
    for key, sub in params.items():
        if key == "density":
            labels[key] = fill(sub, MAIN_GRID_WD)
        elif key in _MAIN_GRID_BRANCHES:
            labels[key] = fill(sub, MAIN_GRID)
        elif key in _MAIN_NET_KEYS:
            labels[key] = fill(sub, MAIN_NET)
        elif key == "instance":
            labels[key] = fill(sub, INST_GRID)
        elif key == "instance_basis":
            labels[key] = fill(sub, INST_NET)
        elif key == "instance_mlp":
            labels[key] = {"fast": fill(sub["fast"], INST_NET)}
            if "slow" in sub:
                labels[key]["slow"] = fill(
                    sub["slow"], FROZEN if use_dino_style else INST_SLOW)
        elif key == "proj":
            labels[key] = {"fast": fill(sub["fast"], INST_NET),
                           "slow": fill(sub["slow"],
                                        FROZEN if use_dino_style else INST_SLOW)}
        else:
            raise KeyError(f"Unlabelled param branch {key!r}")
    return labels


def _adam(lr: float, b1: float, b2: float, weight_decay: float = 0.0):
    chain = [optax.scale_by_adam(b1=b1, b2=b2)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def make_optimizers(cfg, params: dict):
    """(main_tx, inst_tx, labels) matching the reference's param groups.

    Reference: tensoRF.py:199-246 (grids lr*20, nets lr; density weight decay),
    trainer/__init__.py:134-139 (Adam betas).
    """
    labels = build_labels(params, cfg.use_DINO_style)
    zero = optax.set_to_zero()
    main_tx = optax.multi_transform({
        MAIN_GRID_WD: _adam(cfg.lr * 20, 0.9, 0.99, cfg.weight_decay),
        MAIN_GRID: _adam(cfg.lr * 20, 0.9, 0.99),
        MAIN_NET: _adam(cfg.lr, 0.9, 0.99),
        INST_GRID: zero, INST_NET: zero, INST_SLOW: zero, FROZEN: zero,
    }, labels)
    inst_tx = optax.multi_transform({
        INST_GRID: _adam(cfg.lr * 20, 0.9, 0.999),
        INST_NET: _adam(cfg.lr, 0.9, 0.999),
        INST_SLOW: _adam(cfg.lr, 0.9, 0.999),
        MAIN_GRID_WD: zero, MAIN_GRID: zero, MAIN_NET: zero, FROZEN: zero,
    }, labels)
    return main_tx, inst_tx, labels


class TrainState(NamedTuple):
    params: Any
    opt_state_main: Any
    opt_state_inst: Any
    step: jnp.ndarray


def init_train_state(cfg, params: dict) -> TrainState:
    main_tx, inst_tx, _ = make_optimizers(cfg, params)
    return TrainState(
        params=params,
        opt_state_main=main_tx.init(params),
        opt_state_inst=inst_tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def ema_update_slow(params: dict, momentum: float = 0.9, use_proj: bool = False) -> dict:
    """slow <- momentum*slow + (1-momentum)*fast for the instance MLP (and proj).

    Reference: train_panopli_tensorf.py:258-266,325-329 (constant momentum 0.9).
    """
    def ema(slow_tree, fast_tree):
        return jax.tree.map(lambda s, f: momentum * s + (1 - momentum) * f,
                            slow_tree, fast_tree)

    out = dict(params)
    imlp = dict(params["instance_mlp"])
    imlp["slow"] = ema(imlp["slow"], jax.lax.stop_gradient(imlp["fast"]))
    out["instance_mlp"] = imlp
    if use_proj and "proj" in params:
        proj = dict(params["proj"])
        proj["slow"] = ema(proj["slow"], jax.lax.stop_gradient(proj["fast"]))
        out["proj"] = proj
    return out
