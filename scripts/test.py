#!/usr/bin/env python
"""Evaluation entry point.

CLI parity with `/root/reference/scripts/test.py`: same seeding, forces
``train.save=False``, evaluates a checkpoint (``best | last | <path>``) on
the test split and prints/plots the metrics.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="ViT evaluation runner (TPU)")
    # "--config"/"--gpu" aliases: the reference's long names (`test.py:17-19`).
    p.add_argument("-f", "--file", "--config", dest="file", type=str,
                   required=True, help="YAML config path")
    p.add_argument("--ckpt", type=str, default="best", help="best | last | checkpoint path")
    p.add_argument("-w", "--wandb", type=int, default=0)
    p.add_argument("-g", "--gpus", "--gpu", dest="gpus", type=int, default=None)
    p.add_argument("-d", "--debug", type=int, nargs="?", const=1, default=0)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main() -> None:
    args = parse_args()
    from vit_tpu.config import load_config
    from vit_tpu.train.loop import Experiment
    from vit_tpu.utils import seed_everything

    seed_everything(args.seed)
    config = load_config(args.file)
    config.setdefault("train", {})["save"] = False
    # Reference propagates --debug into train.debug (`test.py:39`).
    config["train"]["debug"] = args.debug
    if args.gpus is not None:
        config["train"]["gpus"] = args.gpus

    exp = Experiment(config, use_wandb=bool(args.wandb), sweep=False, seed=args.seed)
    metrics = exp.test(ckpt=args.ckpt)
    print({k: round(v, 6) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
