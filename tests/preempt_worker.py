"""Worker for the preemption-safety integration test.

Launched by ``tests/test_preempt.py``: trains a long run (many epochs) with
``train.save`` on; the parent sends SIGTERM after the first epoch line and
asserts the process stops at an epoch boundary with exit code 0, leaving a
resumable ``last`` checkpoint (the production preemptible-TPU flow).

argv: <dataset.h5> <ckpt_dir>
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

from vit_tpu.train.loop import Experiment  # noqa: E402


def main() -> None:
    h5, ckpt_dir = sys.argv[1], sys.argv[2]
    os.environ["CKPT_DIR"] = ckpt_dir
    cfg = {
        "project": "vit-tpu-test",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 512,
            "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
        },
        # per-epoch dispatches (no multi-epoch blocks): the boundary the
        # guard polls comes every epoch, so the signal lands mid-run
        "train": {"batch_size": 16, "ep": 500, "save": True,
                  "epochs_per_dispatch": 1},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"file_path": h5, "val_path": h5, "num_samples": 96,
                 "param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    # Reached only via the clean preemption break (500 epochs would take
    # minutes): report the stopping step for the parent's resume check.
    print(f"WORKER_DONE step={int(exp.state.step)} "
          f"train_loss={metrics['train_loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
