"""Serving tests: Predictor from orbax and torch checkpoints."""

import numpy as np
import pytest
import yaml

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


def test_predict_denormalized(trained):
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16)
    flux = exp.datamodule.val.flux
    out = pred.predict(flux[:20])
    assert out.shape == (20, 1)
    # minmax-normalized log_g spans [0, 5]; denormalized output must be in
    # physical units (not [0, 1])
    raw = exp.datamodule.val.params_table["log_g"]
    assert out.min() > raw.min() - 3 and out.max() < raw.max() + 3
    assert out.std() < 5.0
    # padding correctness: chunked sizes give the same result
    pred2 = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=7)
    np.testing.assert_allclose(pred2.predict(flux[:20]), out, rtol=1e-5)
    # zero-row input: empty (0, num_labels) result, no crash
    assert pred.predict(flux[:0]).shape == (0, 1)


def test_predict_matches_experiment_eval(trained):
    exp, cfg = trained
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=16)
    flux = exp.datamodule.val.flux[:16]
    logits = pred._batched_logits(flux)
    # same params as the live experiment's final state
    direct = np.asarray(
        exp.bundle.module.apply({"params": exp.state.params}, flux, deterministic=True)
    )
    np.testing.assert_allclose(logits, direct, rtol=1e-5, atol=1e-6)


def test_predict_from_torch_checkpoint(trained, tmp_path):
    """Serving directly from an exported reference-format torch state dict."""
    import jax

    from vit_tpu.train.torch_bridge import save_torch_checkpoint

    exp, cfg = trained
    pt = str(tmp_path / "exported.pt")
    save_torch_checkpoint(jax.device_get(exp.state.params), exp.bundle.vit_config, pt)
    pred = Predictor.from_checkpoint(dict(cfg), ckpt=pt, batch_size=16)
    flux = exp.datamodule.val.flux[:8]
    out = pred.predict(flux)
    assert out.shape == (8, 1) and np.all(np.isfinite(out))


def test_predict_proba_cls(tiny_config, tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], task_type="cls", num_labels=2)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=16)
    flux = exp.datamodule.val.flux[:10]
    proba = pred.predict_proba(flux)
    assert proba.shape == (10, 2)
    np.testing.assert_allclose(proba.sum(-1), 1.0, rtol=1e-5)
    classes = pred.predict(flux)
    np.testing.assert_array_equal(classes, proba.argmax(-1))


def test_predict_restores_non_adamw_optimizer(tiny_config, tmp_path, monkeypatch):
    """Restore template must be built from the config's optimizer: a
    checkpoint trained with sgd (different opt_state pytree than adamw)
    previously failed with 'tree structures do not match'."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16, save=True)
    cfg["opt"] = {"type": "sgd", "lr": 1e-2, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="last", batch_size=16)
    out = pred.predict(exp.datamodule.val.flux[:8])
    assert out.shape == (8, 1) and np.isfinite(out).all()


def test_predict_cli(trained, tmp_path, monkeypatch):
    """scripts/predict.py end to end: config + ckpt + h5 -> predictions.npz."""
    import subprocess
    import sys

    exp, cfg = trained
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out_path = tmp_path / "preds.npz"
    env = dict(__import__("os").environ)
    # keep the subprocess on CPU (axon TPU plugin registers via env)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "scripts/predict.py", "-f", str(cfg_path),
         "--ckpt", "last", "--input", cfg["data"]["test_path"],
         "--output", str(out_path), "--limit", "16"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with np.load(out_path) as z:
        preds = z["predictions"]
    assert preds.shape == (16, 1) and np.isfinite(preds).all()


def test_predict_image_model(tmp_path, monkeypatch):
    """Predictor serves image-family checkpoints (NHWC input, cls output)."""
    from vit_tpu.data.images import make_dummy_images
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = {
        "project": "img-serve",
        "model": {
            "name": "vit", "task_type": "cls", "input_kind": "image",
            "image_size": 32, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_labels": 10, "num_channels": 3, "pos_encoding_type": "learned",
        },
        "train": {"batch_size": 32, "ep": 2, "save": True},
        "loss": {"name": "ce"},
        "opt": {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"},
        "data": {"num_samples": 256, "num_test_samples": 64},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    exp = Experiment(cfg, seed=0)
    exp.fit()
    pred = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16)
    x = make_dummy_images(n=20, image_size=32, seed=3)["images"].astype(np.float32) / 255.0
    classes = pred.predict(x)
    assert classes.shape == (20,) and set(np.unique(classes)) <= set(range(10))
    proba = pred.predict_proba(x)
    assert proba.shape == (20, 10)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)


def test_predict_cli_load_inputs_rejects_unknown_npz(tmp_path):
    """scripts/predict.py must name the missing key instead of silently
    feeding an arbitrary array (e.g. labels) to the model."""
    import importlib.util
    import os

    import numpy as np
    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "predict_cli", os.path.join(repo, "scripts", "predict.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    bad = tmp_path / "bad.npz"
    np.savez(bad, labels=np.zeros((4, 2)))
    with pytest.raises(KeyError, match="images"):
        mod.load_inputs(str(bad), None)

    ok = tmp_path / "ok.npz"
    np.savez(ok, x=np.zeros((4, 8), np.float32))
    assert mod.load_inputs(str(ok), 2).shape == (2, 8)


def test_predict_data_parallel_matches_single_device(trained):
    """num_devices=8: batches shard over the mesh data axis; predictions
    must match single-device serving (DP is a layout, not a math change).
    The int8+DP composition is tested in test_quant.py (needs hidden>=64
    so the quantization table is non-empty)."""
    exp, cfg = trained
    flux = exp.datamodule.val.flux[:40]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    dp = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                   num_devices=8)
    assert dp.mesh is not None and dp.mesh.shape["data"] == 8
    np.testing.assert_allclose(dp.predict(flux), ref, rtol=1e-5, atol=1e-6)


def test_predict_data_parallel_rejects_indivisible_batch(trained):
    import pytest

    _, cfg = trained
    with pytest.raises(ValueError, match="divide"):
        Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=15,
                                  num_devices=8)


def test_predict_rejects_more_devices_than_available(trained):
    """Requesting more shards than devices must fail loudly, not silently
    serve at a lower data-parallel degree."""
    import pytest

    _, cfg = trained
    with pytest.raises(ValueError, match="only .* devices are available"):
        Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                  num_devices=16)


def test_predictor_substitutes_xla_for_ring(trained):
    """A ring-trained config serves single-host: the Predictor swaps in the
    numerically identical xla kernel (params are impl-independent)."""
    exp, cfg = trained
    ring_cfg = dict(cfg, model=dict(cfg["model"], attn_impl="ring"))
    pred = Predictor.from_checkpoint(dict(ring_cfg), ckpt="best", batch_size=16)
    x = exp.datamodule.val.model_input[:8]
    out = pred.predict(np.asarray(x))
    assert np.all(np.isfinite(out))
