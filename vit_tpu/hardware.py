"""Hardware detection and input-pipeline tuning.

TPU-native equivalent of `/root/reference/src/hardware_utils.py`: the
reference detects GPUs via nvidia-smi and picks a Lightning strategy plus
DataLoader worker counts (`:19-241`); here accelerators come from
``jax.devices()``, the "strategy" is always the sharded mesh
(:mod:`vit_tpu.parallel.mesh`), and the worker heuristics become a prefetch
depth for the host->device pipeline (data is in-memory numpy — there is no
worker pool to size).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

__all__ = [
    "detect_accelerators",
    "select_accelerator_and_devices",
    "get_training_strategy",
    "get_prefetch_depth",
    "enable_compilation_cache",
]


_CACHE_ENABLED_DIR: Optional[str] = None


def enable_compilation_cache(config: Optional[dict] = None) -> Optional[str]:
    """Persistent XLA compilation-cache setup (``jax_compilation_cache_dir``).

    Remote TPU compiles cost 20 s–3 min per program in this deployment
    (BASELINE.md protocol notes); the persistent cache stores serialized
    executables on disk so every re-run of an already-compiled
    (program, shapes) pair skips XLA entirely — measured through the axon
    tunnel it turns the verify-config first epoch from ~12 s into
    sub-second. No reference analogue (torch recompiles kernels per
    process; `/root/reference/src/hardware_utils.py` has no cache).

    Enabled by default for every entry point (``Experiment``,
    ``Predictor.from_checkpoint``, ``bench.py``); disable with
    ``train.compilation_cache: false`` or ``VIT_TPU_NO_CACHE=1``. Location:
    ``$JAX_CACHE_DIR`` > ``$XDG_CACHE_HOME/vit_tpu/xla`` >
    ``~/.cache/vit_tpu/xla``. Returns the cache dir, or None if disabled.
    Idempotent; first call wins (jax pins the dir at first use).
    """
    global _CACHE_ENABLED_DIR
    train_cfg = (config or {}).get("train", {}) or {}
    if not bool(train_cfg.get("compilation_cache", True)):
        return None
    if os.environ.get("VIT_TPU_NO_CACHE"):
        return None
    if _CACHE_ENABLED_DIR is not None:
        return _CACHE_ENABLED_DIR
    cache_dir = os.environ.get("JAX_CACHE_DIR")
    if not cache_dir:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        cache_dir = os.path.join(base, "vit_tpu", "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (OSError, AttributeError) as e:  # unwritable dir / old jax
        print(f"[hardware] compilation cache disabled ({e})")
        return None
    _CACHE_ENABLED_DIR = cache_dir
    return cache_dir


def detect_accelerators() -> Dict[str, object]:
    """Describe the attached accelerators (kind, count, memory if known)."""
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "device_kind": devices[0].device_kind if devices else "none",
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
    }


def select_accelerator_and_devices(num_devices: Optional[int] = None):
    """(backend_name, device_list): TPU > GPU > CPU by jax's own ordering
    (the reference's CUDA > MPS > CPU pick, `hardware_utils.py:44-83`)."""
    import jax

    devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[: int(num_devices)]
    return jax.default_backend(), devices


def get_training_strategy(num_devices: int) -> str:
    """'data_parallel' iff >1 device else 'single' — the reference's
    `'ddp' iff >1 GPU` rule (`hardware_utils.py:86-95`) in mesh terms."""
    return "data_parallel" if num_devices > 1 else "single"


def get_prefetch_depth(config: Optional[dict] = None) -> int:
    """Host->device prefetch depth (replaces DataLoader worker heuristics).

    ``$NUM_WORKERS`` env override honored for parity with the reference's
    `hardware_utils.py:203`; otherwise 2 (double buffering) — enough to hide
    transfer latency for fully in-memory arrays.
    """
    env = os.environ.get("NUM_WORKERS")
    if env is not None:
        return max(1, min(8, int(env)))
    cfg = ((config or {}).get("train", {}) or {}).get("num_workers")
    if cfg is not None:
        return max(1, min(8, int(cfg)))
    return 2
