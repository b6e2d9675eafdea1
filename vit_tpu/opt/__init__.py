"""Hyperparameter search: vmapped parallel LR/scheduler sweeps."""

from vit_tpu.opt.parallel_sweep import ParallelSweepRunner, SweepConfig, SweepResult  # noqa: F401
