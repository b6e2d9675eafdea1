#!/usr/bin/env python
"""Checkpoint converter: orbax <-> torch state-dict.

The north-star interchange contract: our orbax checkpoints and the
reference's torch/Lightning checkpoints are convertible both ways at the
state-dict level (:mod:`vit_tpu.train.torch_bridge`).

Examples:
  # export the best orbax checkpoint as a torch .pt state dict
  python scripts/convert.py -f cfg.yaml --export --ckpt best --out model.pt
  # import a reference Lightning checkpoint into an orbax params dir
  python scripts/convert.py -f cfg.yaml --import-pt ref.ckpt --out ckpt_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="orbax <-> torch checkpoint converter")
    p.add_argument("-f", "--file", required=True, help="YAML config (defines the model)")
    p.add_argument("--export", action="store_true", help="orbax -> torch .pt")
    p.add_argument("--import-pt", type=str, default=None, help="torch ckpt -> orbax")
    p.add_argument("--ckpt", type=str, default="best", help="orbax source: best|last|path")
    p.add_argument("--out", type=str, required=True, help="output path")
    args = p.parse_args()

    import jax

    from vit_tpu.config import load_config
    from vit_tpu.train.checkpoint import CheckpointManager
    from vit_tpu.train.loop import Experiment
    from vit_tpu.train.torch_bridge import load_torch_checkpoint, save_torch_checkpoint

    config = load_config(args.file)
    config.setdefault("train", {})["save"] = False
    exp = Experiment(config, use_wandb=False)
    exp.datamodule.setup("fit" if args.import_pt else "test")

    from vit_tpu.train.optim import OptSpec, build_optimizer

    spec = OptSpec.from_config(config, 1, monitor_metric=exp.monitor)
    tx = build_optimizer(spec)
    exp.state = exp._init_state(tx)

    if args.export:
        restored = CheckpointManager.restore(exp.ckpt.resolve(args.ckpt), exp.state)
        save_torch_checkpoint(
            jax.device_get(restored.params), exp.bundle.vit_config, args.out
        )
        print(f"[convert] exported {args.ckpt} -> {args.out}")
    elif args.import_pt:
        params = load_torch_checkpoint(
            args.import_pt, jax.device_get(exp.state.params), exp.bundle.vit_config
        )
        state = exp.state.replace(params=jax.device_put(params, exp.repl_shard))
        exp.ckpt.enabled = True
        os.makedirs(args.out, exist_ok=True)
        exp.ckpt._save(os.path.abspath(args.out), state)
        print(f"[convert] imported {args.import_pt} -> {args.out}")
    else:
        p.error("specify --export or --import-pt")


if __name__ == "__main__":
    main()
