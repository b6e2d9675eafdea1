"""Hyperparameter search: vmapped parallel LR/scheduler sweeps.

Lazy re-exports: eagerly importing ``parallel_sweep`` here makes
``python -m vit_tpu.opt.parallel_sweep`` emit a runpy double-import warning.
"""

__all__ = ["ParallelSweepRunner", "SweepConfig", "SweepResult"]


def __getattr__(name):
    if name in __all__:
        from vit_tpu.opt import parallel_sweep

        return getattr(parallel_sweep, name)
    raise AttributeError(f"module 'vit_tpu.opt' has no attribute '{name}'")
