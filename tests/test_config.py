"""Config loader parity tests: env expansion, W&B flattening, deep_set."""

import pytest
import yaml

from vit_tpu.config import (
    deep_get,
    deep_set,
    deep_update,
    flatten_wandb_config,
    load_config,
)


def _write(tmp_path, obj, name="cfg.yaml"):
    p = tmp_path / name
    with open(p, "w") as f:
        yaml.safe_dump(obj, f)
    return str(p)


def test_load_config_expands_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_DATA_DIR", "/data/spectra")
    path = _write(
        tmp_path,
        {"data": {"file_path": "${MY_DATA_DIR}/train.h5", "num_samples": 10}},
    )
    cfg = load_config(path)
    assert cfg["data"]["file_path"] == "/data/spectra/train.h5"
    assert cfg["data"]["num_samples"] == 10


def test_load_config_expands_nested_lists(tmp_path, monkeypatch):
    monkeypatch.setenv("ROOTX", "/root/x")
    path = _write(tmp_path, {"paths": ["${ROOTX}/a", {"b": "${ROOTX}/b"}]})
    cfg = load_config(path)
    assert cfg["paths"][0] == "/root/x/a"
    assert cfg["paths"][1]["b"] == "/root/x/b"


def test_flatten_wandb_per_key_wrappers():
    raw = {
        "model": {"value": {"hidden_size": 32}},
        "opt": {"desc": None, "value": {"lr": 0.001}},
        "_wandb": {"runtime": 5},
    }
    flat = flatten_wandb_config(raw)
    assert flat == {"model": {"hidden_size": 32}, "opt": {"lr": 0.001}}


def test_flatten_wandb_whole_config_wrapper():
    raw = {"config": {"value": {"model": {"hidden_size": 64}, "train": {"ep": 3}}}}
    flat = flatten_wandb_config(raw)
    assert flat == {"model": {"hidden_size": 64}, "train": {"ep": 3}}


def test_flatten_plain_config_untouched():
    raw = {"model": {"hidden_size": 32}, "train": {"ep": 5}}
    assert flatten_wandb_config(raw) == raw


def test_deep_set_creates_intermediates():
    cfg = {"model": {"patch_size": 32}}
    deep_set(cfg, "model.patch_size", 64)
    deep_set(cfg, "warmup.preprocessor", "pca")
    assert cfg["model"]["patch_size"] == 64
    assert cfg["warmup"]["preprocessor"] == "pca"


def test_deep_get_and_update():
    cfg = {"a": {"b": {"c": 1}}}
    assert deep_get(cfg, "a.b.c") == 1
    assert deep_get(cfg, "a.b.x", 42) == 42
    merged = deep_update(cfg, {"a": {"b": {"d": 2}}, "e": 3})
    assert merged["a"]["b"] == {"c": 1, "d": 2}
    assert merged["e"] == 3
    assert cfg["a"]["b"] == {"c": 1}  # base untouched


def test_load_config_rejects_non_mapping(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- 1\n- 2\n")
    with pytest.raises(ValueError):
        load_config(str(p))
