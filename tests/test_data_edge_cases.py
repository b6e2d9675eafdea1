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


def test_missing_error_dataset_raises(tmp_path):
    """Reference parity (`dataloader/base.py:232`): a file without the error
    dataset is malformed and must raise — zero-filling silently disabled
    noise augmentation while reporting 'noisy' evaluation."""
    import h5py
    import numpy as np
    import pytest

    from vit_tpu.data.datasets import RegSpecDataset

    path = str(tmp_path / "noerr.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("spectrumdataset/wave", data=np.linspace(4000, 7000, 64))
        f.create_dataset("dataset/arrays/flux/value", data=np.ones((8, 64), np.float32))
        g = f.create_group("params")
        g.create_dataset("log_g", data=np.ones(8))
    ds = RegSpecDataset(file_path=path, num_samples=8, param="log_g")
    with pytest.raises(KeyError, match="error"):
        ds.load_data("fit")


def test_image_dataset_missing_configured_path_raises(tmp_path):
    """A configured-but-missing image path must raise, not silently train on
    synthetic noise (only a config with NO path gets the synthetic set)."""
    import pytest

    from vit_tpu.data.images import ImageDataset

    ds = ImageDataset(file_path=str(tmp_path / "nope.npz"), num_samples=16)
    with pytest.raises(FileNotFoundError):
        ds.load_data("fit")
    ds2 = ImageDataset(num_samples=16)  # no path -> synthetic is fine
    ds2.load_data("fit")
    assert len(ds2) == 16


def test_epoch_permutation_empty_dataset_raises():
    import pytest

    from vit_tpu.data.pipeline import epoch_permutation

    with pytest.raises(ValueError, match="empty"):
        epoch_permutation(0, 64, 1, 0, 0)


def test_eval_only_skips_train_load_without_label_norm(tmp_path):
    """setup('test') with label_norm 'none' must not load the training split
    (it only existed to propagate normalization stats)."""
    from vit_tpu.data.datasets import SpecDataModule
    from vit_tpu.data.synthetic import write_dummy_h5

    h5 = str(tmp_path / "d.h5")
    write_dummy_h5(h5, n=32, length=64, seed=0)
    cfg = {
        "model": {"task_type": "reg"},
        "data": {"file_path": h5, "test_path": h5, "num_samples": 32,
                 "num_test_samples": 8, "param": "log_g"},
    }
    dm = SpecDataModule.from_config(cfg)
    dm.setup("test")
    assert dm.test is not None and len(dm.test) == 8
    assert dm.train is None  # no norm stats needed -> no train load
