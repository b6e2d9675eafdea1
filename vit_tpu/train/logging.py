"""Experiment logging: console always, W&B when available and requested.

Reference parity: ``WandbLogger(project=config['project'], name=model_name,
save_dir=$WANDB_DIR)`` (`/root/reference/src/vit.py:443-458`) with the same
metric key names (``train_loss``, ``val_mae``, ``lr``, ``num_params(M)``).
wandb is an optional dependency — absent (as in this image), logging falls
back to console only, keeping the CLI surface identical.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(
        self,
        project: str = "vit-tpu",
        name: str = "run",
        use_wandb: bool = False,
        config: Optional[dict] = None,
        save_artifacts: bool = False,
    ) -> None:
        self.name = name
        self._wandb = None
        # Reference `WandbLogger(log_model=save)` (`vit.py:450-456`): upload
        # checkpoints as W&B model artifacts when saving is on.
        self.save_artifacts = bool(save_artifacts)
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project,
                    name=name,
                    dir=os.environ.get("WANDB_DIR"),
                    config=config,
                    reinit=True,
                )
            except ImportError:
                print("[logger] wandb not installed — console logging only")
            except Exception as e:  # offline/service failures must not kill training
                print(f"[logger] wandb init failed ({e}) — console logging only")

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_epoch(self, epoch: int, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        )
        print(f"[{self.name}] epoch {epoch}: {parts}", flush=True)
        self.log(metrics, step=step)

    def log_checkpoint(self, path: str, alias: str, metadata: Optional[dict] = None) -> None:
        """Upload a checkpoint directory as a W&B model artifact.

        Mirrors Lightning's ``WandbLogger(log_model=True)`` end-of-training
        upload (`/root/reference/src/vit.py:450-456`); no-op without a live
        run or when artifact saving is off.
        """
        if self._wandb is None or not self.save_artifacts:
            return
        if not os.path.isdir(path):
            return
        try:
            import wandb

            art = wandb.Artifact(f"model-{self.name}", type="model", metadata=metadata)
            art.add_dir(path)
            self._wandb.log_artifact(art, aliases=[alias])
        except Exception as e:  # artifact failures must not kill training
            print(f"[logger] wandb artifact upload skipped: {e}")

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
