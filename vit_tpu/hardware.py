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
]


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
