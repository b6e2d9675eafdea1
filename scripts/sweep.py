#!/usr/bin/env python
"""W&B sweep agent runner.

CLI parity with `/root/reference/scripts/sweep.py`: resolves the base config
from ``wandb.config['vit_config']`` or ``$VIT_CONFIG``, applies dotted-key
deep overrides from the sweep parameters onto the nested YAML dict, caps
host thread oversubscription, runs ``Experiment(use_wandb=True, sweep=True)``
and renames the W&B run to the model name. Can self-register as an agent
with ``--sweep_id`` or run a single trial under ``wandb.init``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Thread-oversubscription guards (reference `scripts/sweep.py:12-14`).
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("NUMEXPR_NUM_THREADS", "1")

RESERVED_KEYS = {"vit_config", "_wandb"}


def train_fn() -> None:
    import wandb

    from vit_tpu.config import deep_set, load_config
    from vit_tpu.train.loop import Experiment
    from vit_tpu.utils import seed_everything

    run = wandb.init()
    # Resolution order matches the reference (`sweep.py:17-26`):
    # wandb.config > $VIT_CONFIG > the reference's default path.
    base_path = (
        wandb.config.get("vit_config")
        or os.environ.get("VIT_CONFIG", "configs/vit.yaml")
    )
    config = load_config(os.path.expandvars(base_path))

    # Dotted-key deep overrides (reference `scripts/sweep.py:29-50`).
    for key, value in dict(wandb.config).items():
        if key in RESERVED_KEYS:
            continue
        deep_set(config, key, value)

    seed_everything(42)
    exp = Experiment(config, use_wandb=True, sweep=True, num_devices=1)
    try:
        run.name = exp.bundle.model_name
    except Exception:
        pass
    exp.run()


def main() -> None:
    p = argparse.ArgumentParser(description="W&B sweep agent (TPU)")
    p.add_argument("--sweep_id", type=str, default=None, help="register as agent for this sweep")
    p.add_argument("--count", type=int, default=None, help="max trials for this agent")
    p.add_argument("-e", "--entity", type=str, default=os.environ.get("WANDB_ENTITY"))
    p.add_argument("-p", "--project", type=str, default=os.environ.get("WANDB_PROJECT"))
    p.add_argument("--vit_config", type=str, default=None,
                   help="base YAML for trials (reference `sweep.py:103`)")
    args, _unknown = p.parse_known_args()  # sweep params arrive via wandb.config
    if args.vit_config:
        # train_fn resolves wandb.config > $VIT_CONFIG; surface the CLI value
        # through the env so agent-spawned trials see it too.
        os.environ["VIT_CONFIG"] = args.vit_config

    try:
        import wandb
    except ImportError:
        print("wandb is not installed; `launch.sh sweep` requires it. "
              "Use `launch.sh lr` for the local parallel sweep instead.")
        sys.exit(2)

    if args.sweep_id:
        wandb.agent(
            args.sweep_id,
            function=train_fn,
            entity=args.entity,
            project=args.project,
            count=args.count,
        )
    else:
        train_fn()


if __name__ == "__main__":
    main()
