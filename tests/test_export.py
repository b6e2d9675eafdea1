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


@pytest.mark.parametrize("mode", ["int8-wo", "int8"])
def test_export_quantized_matches_live(trained, tmp_path, mode):
    """The exported graph constant-folds the int8 tables: artifact output
    must match the live quantized Predictor bit-for-bit at the jit level
    (both run the identical quantized forward; denorm is shared)."""
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=8,
                                     quantize=mode)
    path = str(tmp_path / f"q_{mode}.vitxpt")
    header = pred.export(path)
    assert header["quantize"] == mode
    loaded = load_exported(path)
    flux = exp.datamodule.val.flux[:11]
    np.testing.assert_allclose(
        loaded.predict(flux), pred.predict(flux), rtol=1e-4, atol=1e-5
    )
    # ... and the quantized artifact differs from an unquantized one only
    # within quantization error (sanity that the tables actually baked in)
    base = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=8)
    np.testing.assert_allclose(loaded.predict(flux), base.predict(flux),
                               rtol=0.2, atol=0.2)


def test_export_corrupt_files_fail_loudly(trained, tmp_path):
    """Truncated / corrupt artifacts raise ValueError naming the path, not
    struct.error / JSONDecodeError, and never attempt a huge read."""
    _, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=4)
    path = tmp_path / "ok.vitxpt"
    export_predictor(pred, str(path))
    raw = path.read_bytes()

    cut_len = tmp_path / "cut_len.vitxpt"   # magic only — no length field
    cut_len.write_bytes(raw[: len(MAGIC) + 2])
    with pytest.raises(ValueError, match="cut_len.*no header length"):
        load_exported(str(cut_len))

    huge = tmp_path / "huge.vitxpt"         # absurd header length
    huge.write_bytes(raw[: len(MAGIC)] + b"\xff\xff\xff\xff" + raw[len(MAGIC) + 4:])
    with pytest.raises(ValueError, match="huge.*header length"):
        load_exported(str(huge))

    short = tmp_path / "short.vitxpt"       # header cut mid-JSON
    short.write_bytes(raw[: len(MAGIC) + 4 + 10])
    with pytest.raises(ValueError, match="short.*short header"):
        load_exported(str(short))

    garble = tmp_path / "garble.vitxpt"     # length ok, JSON corrupt
    hlen = int.from_bytes(raw[len(MAGIC):len(MAGIC) + 4], "little")
    garble.write_bytes(raw[: len(MAGIC) + 4] + b"\x00" * hlen
                       + raw[len(MAGIC) + 4 + hlen:])
    with pytest.raises(ValueError, match="garble.*corrupt"):
        load_exported(str(garble))


def test_export_normalized_units_warning(trained, tmp_path, capsys):
    """A regression artifact exported without denorm stats must print the
    same loud normalized-units notice as the live Predictor at load time."""
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=8)
    pred.label_norm_stats = {}  # simulate missing stats at export time
    path = str(tmp_path / "nodenorm.vitxpt")
    header = pred.export(path)
    assert header["denormalized"] is False
    capsys.readouterr()
    load_exported(path)
    out = capsys.readouterr().out
    assert "NORMALIZED units" in out


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
