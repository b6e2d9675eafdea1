"""Shared utilities: covariance-stats cache, hardware/mesh info, seeding.

Covariance-cache parity with the reference (`/root/reference/src/utils.py:14-83`
``load_cov_stats`` / ``clear_cov_cache``): a process-global cache keyed by the
resolved path, validating the required keys ``{mean, cov, eigvals, eigvecs}``.
This rebuild stores artifacts as ``.npz`` natively, but also reads the
reference's torch ``.pt`` format (torch-cpu is available) so existing
``cov_path`` configs keep working.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

__all__ = [
    "load_cov_stats",
    "clear_cov_cache",
    "save_cov_stats",
    "seed_everything",
    "count_params",
]

_COV_REQUIRED_KEYS = ("mean", "cov", "eigvals", "eigvecs")
_cov_cache: Dict[str, dict] = {}


def _to_numpy(x) -> np.ndarray:
    """Convert torch tensors / arrays to float32-preserving numpy arrays."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor without importing torch eagerly
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _load_stats_file(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    if path.endswith((".pt", ".pth")):
        import torch  # local import: only needed for reference-format artifacts

        raw = torch.load(path, map_location="cpu", weights_only=True)
        return {k: _to_numpy(v) for k, v in raw.items()}
    raise ValueError(f"Unsupported covariance stats format: {path} (use .npz or .pt)")


def load_cov_stats(path: str, use_cache: bool = True) -> dict:
    """Load covariance statistics ``{mean, cov, eigvals, eigvecs, ...}``.

    Values are returned as numpy arrays; results are cached per resolved path.
    Raises ``KeyError`` if required keys are missing (reference
    `utils.py:64-67` semantics).
    """
    resolved = os.path.realpath(os.path.expanduser(os.path.expandvars(str(path))))
    if use_cache and resolved in _cov_cache:
        return _cov_cache[resolved]
    if not os.path.exists(resolved):
        raise FileNotFoundError(f"Covariance stats file not found: {resolved}")
    stats = _load_stats_file(resolved)
    missing = [k for k in _COV_REQUIRED_KEYS if k not in stats]
    if missing:
        raise KeyError(
            f"Covariance stats at {resolved} missing required keys {missing}; "
            f"found {sorted(stats.keys())}"
        )
    stats = {k: _to_numpy(v) for k, v in stats.items()}
    if use_cache:
        _cov_cache[resolved] = stats
    return stats


def clear_cov_cache() -> None:
    """Drop the process-global covariance cache."""
    _cov_cache.clear()


def load_patch_pca_stats(path: str) -> dict:
    """Load a patch-PCA artifact ``{components|eigvecs|V, mean, ...}``.

    Accepts the schema written by ``prepca.compute_pca`` /
    ``compute_patch_pca_images`` (``.npz`` native or ``.pt`` torch interop,
    reference ``$PCA_DIR/pca_patch_{P}_s{S}.pt`` files). The basis is
    normalized to the ``components`` key, (patch_dim, k) with columns as
    principal directions.
    """
    resolved = os.path.realpath(os.path.expanduser(os.path.expandvars(str(path))))
    if not os.path.exists(resolved):
        raise FileNotFoundError(f"Patch-PCA stats file not found: {resolved}")
    stats = {k: _to_numpy(v) for k, v in _load_stats_file(resolved).items()}
    basis = None
    for key in ("components", "eigvecs", "V"):
        if key in stats:
            basis = stats[key]
            break
    if basis is None:
        raise KeyError(
            f"Patch-PCA stats at {resolved} need one of components/eigvecs/V; "
            f"found {sorted(stats.keys())}"
        )
    stats["components"] = np.asarray(basis, np.float32)
    return stats


def save_cov_stats(stats: dict, path: str) -> str:
    """Save covariance statistics; ``.npz`` native, ``.pt`` for torch interop."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {k: _to_numpy(v) for k, v in stats.items()}
    if path.endswith(".npz"):
        np.savez(path, **arrays)
    elif path.endswith((".pt", ".pth")):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in arrays.items()}, path)
    else:
        raise ValueError(f"Unsupported covariance stats format: {path}")
    return path


def seed_everything(seed: int = 42) -> int:
    """Seed python/numpy RNGs (the jax RNG is explicit via PRNGKey threading).

    Equivalent role to the reference's ``L.seed_everything`` +
    cudnn-deterministic switches (`scripts/run.py:27-30`): jax programs are
    deterministic by construction, so only host-side RNGs need seeding.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def count_params(params) -> int:
    """Total number of scalar parameters in a pytree."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
