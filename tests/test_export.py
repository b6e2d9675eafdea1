"""AOT serving artifacts (vit_tpu.export): round-trip, parity, format."""

import numpy as np
import pytest

from vit_tpu.export import MAGIC, export_predictor, load_exported
from vit_tpu.serve import Predictor
from vit_tpu.train.loop import Experiment


@pytest.fixture()
def trained(tiny_config, tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    return exp, cfg


def test_export_roundtrip_matches_predictor(trained, tmp_path):
    """Exported artifact reproduces Predictor.predict (denormalization is
    compiled into the graph; live predict denormalizes in f64 numpy, hence
    the f32-level tolerance) across padded chunk boundaries."""
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=8)
    path = str(tmp_path / "model.vitxpt")
    header = pred.export(path)
    assert header["denormalized"] is True
    assert header["batch_size"] == 8

    flux = exp.datamodule.val.flux[:19]  # 2 full chunks + a padded one
    loaded = load_exported(path)
    np.testing.assert_allclose(
        loaded.predict(flux), pred.predict(flux), rtol=1e-4, atol=1e-5
    )
    # empty input: (0, num_labels), no dispatch
    assert loaded.predict(flux[:0]).shape == (0, 1)


def test_export_header_and_magic(trained, tmp_path):
    _, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=4)
    path = str(tmp_path / "m.vitxpt")
    header = export_predictor(pred, path)
    with open(path, "rb") as f:
        assert f.read(len(MAGIC)) == MAGIC
    assert header["task_type"] == "reg"
    assert header["input_shape"] == [cfg["model"]["image_size"]]
    # a non-export file is rejected loudly
    bad = tmp_path / "bad.vitxpt"
    bad.write_bytes(b"not an export")
    with pytest.raises(ValueError, match="bad magic"):
        load_exported(str(bad))


def test_export_cls_predicts_classes(tiny_config, tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], task_type="cls", num_labels=2)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=16)
    path = str(tmp_path / "cls.vitxpt")
    pred.export(path)
    loaded = load_exported(path)
    flux = exp.datamodule.val.flux[:10]
    np.testing.assert_array_equal(loaded.predict(flux), pred.predict(flux))
    proba = loaded.predict_proba(flux)
    np.testing.assert_allclose(proba.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(proba, pred.predict_proba(flux), rtol=1e-4,
                               atol=1e-6)


def test_export_rejects_mesh_and_missing_shape(trained, tmp_path):
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=8,
                                     num_devices=2)
    with pytest.raises(ValueError, match="single-device"):
        pred.export(str(tmp_path / "x.vitxpt"))
    # directly-constructed Predictor without input_shape must ask for it
    direct = Predictor(exp.bundle.module, exp.state.params,
                       exp.bundle.vit_config, batch_size=4)
    with pytest.raises(ValueError, match="input_shape"):
        export_predictor(direct, str(tmp_path / "y.vitxpt"))
    # ... and works once it is given
    export_predictor(direct, str(tmp_path / "y.vitxpt"),
                     input_shape=(cfg["model"]["image_size"],))
    loaded = load_exported(str(tmp_path / "y.vitxpt"))
    flux = exp.datamodule.val.flux[:4]
    assert loaded.predict(flux).shape == (4, 1)
    # wrong input feature shape is rejected before dispatch
    with pytest.raises(ValueError, match="input shape"):
        loaded.predict(flux[:, :7])
