"""scripts/convert.py round trip: orbax -> torch .pt -> orbax."""

import os
import subprocess
import sys

import numpy as np
import yaml


def test_convert_export_import_roundtrip(tiny_config, tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from vit_tpu.train.loop import Experiment

    exp = Experiment(dict(cfg), seed=0)
    exp.fit()
    assert os.path.exists(exp.ckpt.best_path)

    env = dict(os.environ, CKPT_DIR=str(tmp_path / "ckpt"), JAX_PLATFORMS="cpu")
    # The axon TPU sitecustomize would override JAX_PLATFORMS; removing its
    # gate variable keeps the subprocess on CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pt_path = str(tmp_path / "exported.pt")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/convert.py"),
         "-f", cfg_path, "--export", "--ckpt", "best", "--out", pt_path],
        capture_output=True, text=True, env=env, cwd=repo, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(pt_path)

    # torch state dict contains the expected reference-format keys
    import torch

    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    assert "vit.embeddings.cls_token" in sd
    assert "vit.encoder.layer.0.attention.attention.query.weight" in sd
    assert "regressor.weight" in sd

    # import back into an orbax dir
    orbax_out = str(tmp_path / "imported")
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/convert.py"),
         "-f", cfg_path, "--import-pt", pt_path, "--out", orbax_out],
        capture_output=True, text=True, env=env, cwd=repo, timeout=600,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert os.path.exists(orbax_out)

    # restored params equal the trained best params
    from vit_tpu.train.checkpoint import CheckpointManager

    best = CheckpointManager.restore(exp.ckpt.best_path, exp.state)
    imported = CheckpointManager.restore(os.path.abspath(orbax_out), exp.state)
    a = np.asarray(best.params["regressor"]["kernel"])
    b = np.asarray(imported.params["regressor"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-6)
