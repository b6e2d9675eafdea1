"""Data layer tests: HDF5 schema, datasets, label norm, noise, batching."""

import numpy as np
import pytest

from vit_tpu.data import (
    Batcher,
    ClassSpecDataset,
    RegSpecDataset,
    SpecDataModule,
    load_spectra,
    make_dummy_spectra,
    read_params_table,
    write_dummy_h5,
)


def test_load_spectra_schema(dummy_h5):
    out = load_spectra(dummy_h5, 10)
    assert out["flux"].shape == (10, 512)
    assert out["error"].shape == (10, 512)
    assert out["wave"].shape == (512,)
    assert out["flux"].dtype == np.float32


def test_read_params_table_flat_and_pytables(tmp_path):
    # Flat layout is the primary; drop it to force the pytables-table parser.
    import h5py

    path = str(tmp_path / "d.h5")
    write_dummy_h5(path, n=20, length=64, seed=1)
    full = read_params_table(path, 5)
    assert set(full) >= {"log_g", "T_eff", "M_H"}
    assert full["log_g"].shape == (5,)

    with h5py.File(path, "a") as f:
        del f["params"]
    via_table = read_params_table(path, 5)
    np.testing.assert_allclose(via_table["log_g"], full["log_g"])


def test_read_params_table_pandas_fixed_layout(tmp_path):
    """pandas 'fixed' (BlockManagerFixed) stores block values TRANSPOSED —
    shape (n_items, n_rows), read back by pandas with values.T. The h5py
    fallback parser must honor that orientation (a (rows, items) read
    returns one sample's values as a 'column')."""
    import h5py

    path = str(tmp_path / "fixed.h5")
    rows = np.arange(12, dtype=np.float64)
    data = {"log_g": rows * 0.1, "T_eff": 4000 + rows}
    with h5py.File(path, "w") as f:
        g = f.create_group("df")
        g.create_dataset("axis0", data=np.array([b"log_g", b"T_eff"]))
        g.create_dataset("axis1", data=np.arange(12))
        g.create_dataset("block0_items", data=np.array([b"log_g", b"T_eff"]))
        # pandas writes (n_items, n_rows)
        g.create_dataset(
            "block0_values", data=np.stack([data["log_g"], data["T_eff"]])
        )
    cols = read_params_table(path)
    np.testing.assert_allclose(cols["log_g"], data["log_g"])
    np.testing.assert_allclose(cols["T_eff"], data["T_eff"])
    assert cols["log_g"].shape == (12,)


def test_task_type_default_and_legacy_key_match_builder(tiny_config):
    """Dataset selection must share the model builder's default ('cls',
    reference `vit.py:21-27` / `builder.py:204`) and honor the legacy
    ``model.task`` key — a 'reg' dataset feeding a 'cls' head trains garbage."""
    from vit_tpu.data.datasets import dataset_from_config

    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"])
    cfg["model"].pop("task_type")
    assert isinstance(dataset_from_config(cfg), ClassSpecDataset)
    cfg["model"]["task"] = "reg"
    assert isinstance(dataset_from_config(cfg), RegSpecDataset)


def test_class_dataset_labels(tiny_config):
    ds = ClassSpecDataset.from_config(tiny_config)
    ds.load_data("fit")
    table = ds.params_table
    np.testing.assert_array_equal(ds.labels, (table["log_g"] > 2.5).astype(np.int32))
    assert ds.flux.min() >= 0.0  # clipped


def test_reg_dataset_label_norm_roundtrip(tiny_config):
    tiny_config["data"]["param"] = "T_eff, log_g"
    ds = RegSpecDataset.from_config(tiny_config)
    ds.load_data("fit")
    assert ds.labels.shape == (96, 2)
    # minmax puts train labels in [0, 1]
    assert ds.labels.min() >= -1e-6 and ds.labels.max() <= 1 + 1e-6
    raw = np.stack(
        [ds.params_table["T_eff"], ds.params_table["log_g"]], axis=-1
    ).astype(np.float32)
    np.testing.assert_allclose(ds.denormalize(ds.labels), raw, rtol=1e-5)


def test_reg_dataset_requires_param(tiny_config):
    tiny_config["data"]["param"] = None
    ds = RegSpecDataset.from_config(tiny_config)
    with pytest.raises(ValueError):
        ds.load_data("fit")


def test_stat_propagation_train_to_val(tiny_config):
    dm = SpecDataModule.from_config(tiny_config)
    dm.setup("fit")
    assert dm.val is not None
    np.testing.assert_allclose(dm.val.label_min, dm.train.label_min)
    np.testing.assert_allclose(dm.val.label_max, dm.train.label_max)


def test_val_noise_fixed_seed(tiny_config):
    tiny_config["noise"] = {"noise_level": 0.5}
    dm1 = SpecDataModule.from_config(tiny_config)
    dm1.setup("fit")
    dm2 = SpecDataModule.from_config(tiny_config)
    dm2.setup("fit")
    assert dm1.val.noisy is not None
    np.testing.assert_array_equal(dm1.val.noisy, dm2.val.noisy)  # seed 42 fixed
    assert not np.array_equal(dm1.val.noisy, dm1.val.flux)


def test_num_test_samples_default():
    ds = RegSpecDataset(file_path="x.h5", num_samples=200, param="log_g")
    assert ds.num_test_samples == 200  # min(10000, num_samples)
    ds2 = RegSpecDataset(file_path="x.h5", num_samples=50000, param="log_g")
    assert ds2.num_test_samples == 10000


def test_batcher_shapes_and_masking():
    arrays = {"x": np.arange(50, dtype=np.float32).reshape(50, 1)}
    b = Batcher(arrays, batch_size=16, eval_mode=True)
    batches = list(b)
    assert len(batches) == 4
    assert all(bb["x"].shape == (16, 1) for bb in batches)
    # last batch: 2 real rows
    assert batches[-1]["mask"].sum() == 2
    total_real = sum(bb["mask"].sum() for bb in batches)
    assert total_real == 50


def test_batcher_train_shuffle_deterministic():
    arrays = {"x": np.arange(40, dtype=np.float32)}
    b1 = Batcher(arrays, batch_size=8, shuffle=True, seed=7)
    b2 = Batcher(arrays, batch_size=8, shuffle=True, seed=7)
    for x1, x2 in zip(b1, b2):
        np.testing.assert_array_equal(x1["x"], x2["x"])
    # epoch advances -> different order
    b3 = list(Batcher(arrays, batch_size=8, shuffle=True, seed=7))
    b1.set_epoch(1)
    assert any(
        not np.array_equal(a["x"], c["x"]) for a, c in zip(b1, b3)
    )


def test_make_dummy_spectra_learnable_correlation():
    d = make_dummy_spectra(n=200, length=256, seed=3)
    # Line depths are driven by log_g: total absorbed flux should correlate.
    absorbed = -d["flux"].sum(axis=1)
    r = np.corrcoef(absorbed, d["params"]["log_g"])[0, 1]
    assert r > 0.3
