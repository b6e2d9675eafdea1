#!/usr/bin/env python
"""Training entry point.

CLI parity with `/root/reference/scripts/run.py`: seeds everything, loads
the YAML config, injects ``train.gpus/debug/save`` from flags, then
``Experiment(config, use_wandb, sweep=False, ckpt_path).run()``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="ViT training runner (TPU)")
    # "--config"/"--gpu" are the reference's long names (`run.py:16-19`);
    # kept as aliases so reference command lines work verbatim.
    p.add_argument("-f", "--file", "--config", dest="file", type=str,
                   required=True, help="YAML config path")
    p.add_argument("-w", "--wandb", type=int, default=0, help="1 = log to W&B")
    p.add_argument("--save", action="store_true", help="save checkpoints")
    p.add_argument("--ckpt", type=str, default=None, help="resume checkpoint (best|last|path)")
    p.add_argument("-g", "--gpus", "--gpu", dest="gpus", type=int, default=None,
                   help="device count (mesh size)")
    p.add_argument("-d", "--debug", type=int, nargs="?", const=1, default=0,
                   help="fast dev run (1 batch)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from vit_tpu.config import load_config
    from vit_tpu.train.loop import Experiment
    from vit_tpu.utils import seed_everything

    seed_everything(args.seed)
    config = load_config(args.file)
    train_cfg = config.setdefault("train", {})
    if args.gpus is not None:
        train_cfg["gpus"] = args.gpus
    if args.debug:
        train_cfg["debug"] = 1
    if args.save:
        train_cfg["save"] = True

    exp = Experiment(
        config,
        use_wandb=bool(args.wandb),
        sweep=False,
        ckpt_path=args.ckpt,
        seed=args.seed,
    )
    exp.run()


if __name__ == "__main__":
    main()
