"""Train CLI (reference entry: trainer/train_panopli_tensorf.py:473-489).

Usage:
    python -m contrastive_lift_tpu.cli.train --config path/to/config.yaml \
        [key=value overrides...]

The experiment directory snapshot (config.json + metrics.jsonl + checkpoints/)
plays the role of the reference's FilesystemLogger run dir; inference CLIs
read the snapshotted config.
"""
from __future__ import annotations

import argparse
import datetime
import random
import string
from pathlib import Path

from ..config import load_config, parse_cli_overrides
from ..data import load_scene
from ..train.loop import Trainer


def generate_experiment_name(name: str, cfg) -> str:
    """MMDDHHMM_name_scene_experiment_randomsuffix (reference: trainer/__init__.py:48-58)."""
    stamp = datetime.datetime.now().strftime("%m%d%H%M")
    scene = Path(cfg.dataset_root).stem
    suffix = "".join(random.choices(string.ascii_lowercase, k=4))
    return f"{stamp}_{name}_{scene}_{cfg.experiment}_{suffix}"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--runs-dir", type=str, default="runs")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, parse_cli_overrides(args.overrides))
    cfg = cfg.resolve_epochs()
    name = {"panopli": "PanopLi", "mos": "MOS",
            "synthetic": "Synthetic"}.get(cfg.dataset_class, cfg.dataset_class)
    exp_name = generate_experiment_name(name, cfg)
    run_dir = Path(args.runs_dir) / exp_name
    print(f"experiment: {exp_name}")

    scene = load_scene(cfg)
    trainer = Trainer(cfg, scene, run_dir)
    if cfg.resume:
        trainer.restore(cfg.resume)
    trainer.fit()
    print(f"done; artifacts in {run_dir}")


if __name__ == "__main__":
    main()
