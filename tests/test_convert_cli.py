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


def test_finetune_from_imported_checkpoint(tiny_config, tmp_path, monkeypatch,
                                           capsys):
    """The pretrained-weights user journey: import a torch state dict to
    orbax (scripts/convert.py semantics), then train FROM it via
    Experiment(ckpt_path=...). With lr=0 the 'fine-tune' must end exactly
    at the imported weights — proving training starts from them, not from
    a fresh init."""
    import jax

    from vit_tpu.train.loop import Experiment
    from vit_tpu.train.torch_bridge import (
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    # lr=0: the fine-tune run applies zero updates, so final == imported
    cfg["opt"] = {"type": "sgd", "lr": 0.0, "lr_sch": "none"}

    # stage a "pretrained" torch checkpoint (a trained run exported)
    src = Experiment(dict(cfg, opt={"type": "sgd", "lr": 1e-2,
                                    "lr_sch": "none"}), seed=0)
    src.fit()
    pt = str(tmp_path / "pretrained.pt")
    save_torch_checkpoint(jax.device_get(src.state.params),
                          src.bundle.vit_config, pt)

    # import (what scripts/convert.py --import-pt does): params from torch,
    # fresh optimizer state, step 0
    imp = Experiment(dict(cfg), seed=1)
    imp.datamodule.setup("fit")
    from vit_tpu.train.optim import OptSpec, build_optimizer

    spec = OptSpec.from_config(dict(cfg), 1, monitor_metric=imp.monitor)
    imp.state = imp._init_state(build_optimizer(spec))
    params = load_torch_checkpoint(pt, jax.device_get(imp.state.params),
                                   imp.bundle.vit_config)
    state = imp.state.replace(params=jax.device_put(params, imp.repl_shard))
    imp.ckpt.enabled = True
    orbax_out = str(tmp_path / "imported")
    os.makedirs(orbax_out, exist_ok=True)
    imp.ckpt._save(os.path.abspath(orbax_out), state)

    # fine-tune from the imported checkpoint
    ft = Experiment(dict(cfg), seed=2, ckpt_path=os.path.abspath(orbax_out))
    metrics = ft.fit()
    assert "resumed from" in capsys.readouterr().out
    assert np.isfinite(metrics["train_loss"])
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(ft.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(src.state.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
