"""ZeRO-1 optimizer-state sharding (train.opt_state_sharding).

Rebuild-only, TPU-native memory lever (no reference analogue — the
reference's DDP replicates optimizer state on every rank,
/root/reference/src/hardware_utils.py): >=1-D optimizer-state leaves shard
their leading dim over the `data` mesh axis while params stay replicated.
The AdamW update is elementwise per leaf, so sharding is layout only —
training math must match the replicated path to float tolerance.
"""

import numpy as np
import pytest

from vit_tpu.train.loop import Experiment, TrainState


def _cfg(tiny_config, zero1, **train_extra):
    cfg = dict(tiny_config)
    cfg["train"] = dict(
        tiny_config["train"], ep=2, batch_size=16,
        opt_state_sharding=zero1, **train_extra,
    )
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    return cfg


def _mu_leaves(opt_state):
    import jax

    return [
        leaf for leaf in jax.tree_util.tree_leaves(opt_state)
        if getattr(leaf, "ndim", 0) >= 1
    ]


def test_opt_state_sharded_over_data_axis(tiny_config, tmp_path, monkeypatch):
    """Moment leaves carry P('data', ...) and each device holds 1/dp rows."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    exp = Experiment(_cfg(tiny_config, True), seed=0, num_devices=8)
    exp.fit()
    dp = exp.mesh.shape["data"]
    assert dp == 8
    sharded = 0
    for leaf in _mu_leaves(exp.state.opt_state):
        spec = leaf.sharding.spec
        if leaf.shape[0] % dp == 0:
            assert spec[0] == "data", f"leading dim not sharded: {spec}"
            shard = leaf.addressable_shards[0].data
            assert shard.shape[0] == leaf.shape[0] // dp
            sharded += 1
        else:
            assert all(s is None for s in spec)
    assert sharded > 0, "no optimizer-state leaf was sharded"
    # Params stay replicated.
    import jax

    for leaf in jax.tree_util.tree_leaves(exp.state.params):
        assert all(s is None for s in leaf.sharding.spec)


@pytest.mark.parametrize("fused", [False, True])
def test_zero1_training_parity(tiny_config, tmp_path, monkeypatch, fused):
    """Sharded vs replicated optimizer state: same training trajectory."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(zero1):
        exp = Experiment(
            _cfg(tiny_config, zero1, fused_epoch=fused), seed=0, num_devices=8
        )
        m = exp.fit()
        return m, np.asarray(exp.state.params["regressor"]["kernel"])

    m_z, k_z = run(True)
    m_r, k_r = run(False)
    assert m_z["train_loss"] == pytest.approx(m_r["train_loss"], rel=1e-6)
    assert m_z["val_mae"] == pytest.approx(m_r["val_mae"], rel=1e-6)
    np.testing.assert_allclose(k_z, k_r, rtol=1e-6, atol=1e-7)


def test_zero1_checkpoint_roundtrip(tiny_config, tmp_path, monkeypatch):
    """Save with sharded opt state, restore into a fresh zero1 Experiment."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _cfg(tiny_config, True)
    cfg["train"]["save"] = True
    exp = Experiment(cfg, seed=0, num_devices=8)
    exp.fit()
    loss_a = exp.test(ckpt="best")["test_mae"]

    exp2 = Experiment(cfg, seed=1, num_devices=8)
    loss_b = exp2.test(ckpt="best")["test_mae"]
    assert loss_b == pytest.approx(loss_a, rel=1e-6)
    # The restored state keeps the zero1 layout.
    dp = exp2.mesh.shape["data"]
    restored = exp2.state
    assert isinstance(restored, TrainState)
    specs = [
        leaf.sharding.spec
        for leaf in _mu_leaves(restored.opt_state)
        if leaf.shape[0] % dp == 0
    ]
    assert specs and all(s[0] == "data" for s in specs)


def test_zero1_rejects_model_parallel(tiny_config):
    cfg = _cfg(tiny_config, True, model_parallel=2)
    with pytest.raises(ValueError, match="opt_state_sharding"):
        Experiment(cfg, seed=0, num_devices=8)


def test_zero1_composes_with_grad_accumulation(tiny_config, tmp_path, monkeypatch):
    """ZeRO-1 + accumulate_steps: same trajectory as replicated + accum."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(zero1):
        exp = Experiment(
            _cfg(tiny_config, zero1, accumulate_steps=2), seed=0, num_devices=8
        )
        m = exp.fit()
        return m, np.asarray(exp.state.params["regressor"]["kernel"])

    m_z, k_z = run(True)
    m_r, k_r = run(False)
    assert m_z["train_loss"] == pytest.approx(m_r["train_loss"], rel=1e-6)
    np.testing.assert_allclose(k_z, k_r, rtol=1e-6, atol=1e-7)
