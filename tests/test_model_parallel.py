"""Tensor parallelism through the Experiment config surface (8-dev CPU mesh).

``train.model_parallel: N`` splits a ``model`` mesh axis; dense kernels are
column-sharded per ``infer_param_shardings`` and GSPMD inserts the TP
collectives. Previously TP existed only in the driver dryrun.
"""

import jax
import numpy as np
import pytest

from vit_tpu.train.loop import Experiment


def _tp_config(tiny_config, tp):
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], hidden_size=32, num_attention_heads=2)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16, model_parallel=tp)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    return cfg


def test_model_parallel_mesh_and_shardings(tiny_config, tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    exp = Experiment(_tp_config(tiny_config, 2), seed=0)
    assert dict(exp.mesh.shape) == {"data": 4, "model": 2}
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"]) and metrics["val_mae"] < 0.5

    # at least the wide kernels must actually be sharded over `model`
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.sharding.spec, exp.state.params)
        )
        if "model" in str(leaf)
    ]
    assert sharded, "no parameter was sharded over the model axis"


def test_model_parallel_matches_pure_dp(tiny_config, tmp_path, monkeypatch):
    """TP=2 training reaches the same result as pure DP (same math, sharded).

    Numerics may differ in the last bits (sharded reductions reassociate);
    the trained metric must agree closely."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    m_dp = Experiment(_tp_config(tiny_config, 1), seed=0).fit()
    m_tp = Experiment(_tp_config(tiny_config, 2), seed=0).fit()
    assert m_tp["val_mae"] == pytest.approx(m_dp["val_mae"], rel=2e-3)
    assert m_tp["train_loss"] == pytest.approx(m_dp["train_loss"], rel=2e-3)


def test_model_parallel_invalid_degree(tiny_config):
    cfg = _tp_config(tiny_config, 3)  # 3 does not divide 8 devices
    with pytest.raises(ValueError, match="must divide"):
        Experiment(cfg, seed=0)
