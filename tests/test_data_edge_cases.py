"""Data-layer edge cases: NaN handling, clipping, -1 sample counts."""

import h5py
import numpy as np

from vit_tpu.data.datasets import RegSpecDataset, _fill_nan_with_nearest
from vit_tpu.data.hdf5 import ERROR_KEY, FLUX_KEY, load_spectra
from vit_tpu.data.synthetic import write_dummy_h5


def test_fill_nan_with_nearest_edges_and_interior():
    arr = np.array([[np.nan, 1.0, 2.0, np.nan],
                    [0.5, np.nan, 1.5, 2.5]], dtype=np.float32)
    out = _fill_nan_with_nearest(arr)
    assert not np.isnan(out).any()
    assert out[0, 0] == 1.0  # first column <- second
    assert out[0, 3] == 2.0  # last column <- second-to-last
    # interior NaN filled with the median of remaining values
    assert np.isfinite(out[1, 1])


def test_flux_clipping_and_nan_error(tmp_path):
    path = str(tmp_path / "d.h5")
    write_dummy_h5(path, n=8, length=64, seed=0)
    with h5py.File(path, "a") as f:
        flux = f[FLUX_KEY][()]
        flux[0, 0] = -5.0  # negative flux
        del f[FLUX_KEY]
        f.create_dataset(FLUX_KEY, data=flux)
        err = f[ERROR_KEY][()]
        err[:, 0] = np.nan
        err[:, -1] = np.nan
        del f[ERROR_KEY]
        f.create_dataset(ERROR_KEY, data=err)
    ds = RegSpecDataset(file_path=path, num_samples=8, param="log_g")
    ds.load_data("fit")
    assert ds.flux.min() >= 0.0
    assert not np.isnan(ds.error).any()


def test_num_samples_minus_one_loads_all(tmp_path):
    path = str(tmp_path / "d.h5")
    write_dummy_h5(path, n=24, length=32, seed=1)
    out = load_spectra(path, -1)
    assert out["flux"].shape[0] == 24
    out2 = load_spectra(path, None)
    assert out2["flux"].shape[0] == 24


def test_snr_computed_per_spectrum(tmp_path):
    path = str(tmp_path / "d.h5")
    write_dummy_h5(path, n=8, length=64, seed=2)
    ds = RegSpecDataset(file_path=path, num_samples=8, param="log_g")
    ds.load_data("fit")
    assert ds.snr.shape == (8,)
    assert np.all(ds.snr > 0)
