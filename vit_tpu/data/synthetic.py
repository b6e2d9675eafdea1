"""Synthetic stellar-spectra generator and HDF5 fixture writer.

Re-designed from the *idea* of the reference's ``make_dummy_spectra``
(`/root/reference/src/utils.py:131-139`): continuum + Gaussian absorption
lines + noise, with stellar parameters that correlate with the line depths
so regression/classification tasks are actually learnable. Used by the test
suite and for running the full pipeline without real BOSZ data.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import h5py
import numpy as np

from vit_tpu.data.hdf5 import ERROR_KEY, FLUX_KEY, WAVE_KEY

__all__ = ["make_dummy_spectra", "write_dummy_h5"]


def make_dummy_spectra(
    n: int = 64,
    length: int = 4096,
    seed: int = 0,
    n_lines: int = 12,
    noise_floor: float = 0.01,
) -> Dict[str, np.ndarray]:
    """Generate ``n`` synthetic spectra of ``length`` pixels.

    Returns ``{wave, flux, error, params}`` where ``params`` is a dict of
    stellar-parameter columns (``T_eff, log_g, M_H, a_M, C_M, redshift, mag,
    snr``). Line depths are driven by ``log_g`` and ``M_H`` so a model can
    recover them.
    """
    rng = np.random.default_rng(seed)
    wave = np.linspace(3800.0, 9000.0, length).astype(np.float32)

    t_eff = rng.uniform(3500.0, 9000.0, size=n)
    log_g = rng.uniform(0.0, 5.0, size=n)
    m_h = rng.uniform(-2.5, 0.5, size=n)
    a_m = rng.uniform(-0.25, 0.5, size=n)
    c_m = rng.uniform(-0.5, 0.5, size=n)
    redshift = rng.uniform(0.0, 1e-4, size=n)
    mag = rng.uniform(16.0, 22.0, size=n)

    # Smooth blackbody-ish continuum, normalized to ~1.
    t_norm = (t_eff[:, None] - 3500.0) / 5500.0
    x = (wave[None, :] - wave[0]) / (wave[-1] - wave[0])
    continuum = 1.0 + 0.3 * (t_norm - 0.5) * (x - 0.5)

    # Fixed line positions (shared across the set), depths modulated by params.
    centers = rng.uniform(wave[0] + 100, wave[-1] - 100, size=n_lines)
    widths = rng.uniform(2.0, 15.0, size=n_lines)
    base_strength = rng.uniform(0.1, 0.6, size=n_lines)

    flux = continuum.copy()
    logg_n = log_g / 5.0
    mh_n = (m_h + 2.5) / 3.0
    for j in range(n_lines):
        depth = base_strength[j] * (
            0.35 + 0.45 * logg_n + 0.20 * mh_n
        )  # (n,)
        profile = np.exp(-0.5 * ((wave[None, :] - centers[j]) / widths[j]) ** 2)
        flux = flux - depth[:, None] * profile

    error = np.full_like(flux, noise_floor, dtype=np.float32)
    error += noise_floor * rng.random(flux.shape).astype(np.float32)
    flux = flux + rng.standard_normal(flux.shape).astype(np.float32) * noise_floor
    flux = np.clip(flux, 0.0, None).astype(np.float32)

    snr = np.linalg.norm(flux, axis=-1) / np.linalg.norm(error, axis=-1)
    params = {
        "T_eff": t_eff,
        "log_g": log_g,
        "M_H": m_h,
        "a_M": a_m,
        "C_M": c_m,
        "redshift": redshift,
        "mag": mag,
        "snr": snr,
    }
    return {
        "wave": wave,
        "flux": flux,
        "error": error.astype(np.float32),
        "params": {k: v.astype(np.float64) for k, v in params.items()},
    }


def write_dummy_h5(
    path: str,
    n: int = 64,
    length: int = 4096,
    seed: int = 0,
    data: Optional[Dict[str, np.ndarray]] = None,
) -> str:
    """Write a synthetic dataset in the reference's HDF5 key schema.

    Spectra go under ``spectrumdataset/wave`` + ``dataset/arrays/*/value``;
    parameters are written both as a flat ``params/`` group (our native
    layout) and as a PyTables-style ``stellar_params/table`` structured array
    so the fallback readers in :mod:`vit_tpu.data.hdf5` are exercised.
    """
    if data is None:
        data = make_dummy_spectra(n=n, length=length, seed=seed)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset(WAVE_KEY, data=data["wave"])
        f.create_dataset(FLUX_KEY, data=data["flux"])
        f.create_dataset(ERROR_KEY, data=data["error"])
        params = data["params"]
        for k, v in params.items():
            f.create_dataset(f"params/{k}", data=v)
        # PyTables-table-compatible structured array (index + columns).
        names = list(params.keys())
        n_rows = len(next(iter(params.values())))
        dtype = np.dtype([("index", np.int64)] + [(k, np.float64) for k in names])
        table = np.empty(n_rows, dtype=dtype)
        table["index"] = np.arange(n_rows)
        for k in names:
            table[k] = params[k]
        f.create_dataset("stellar_params/table", data=table)
    return path
