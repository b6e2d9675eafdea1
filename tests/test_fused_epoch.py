"""Fused-epoch (lax.scan) training path: exact equivalence with per-step."""

import numpy as np
import pytest

from vit_tpu.train.loop import Experiment


def _cfg(tiny_config, fused):
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16, fused_epoch=fused)
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    return cfg


def test_fused_epoch_matches_per_step(tiny_config, tmp_path, monkeypatch):
    """Same seed -> identical parameters after training, both paths."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    # per-step on 1-device mesh for apples-to-apples
    exp_a = Experiment(_cfg(tiny_config, False), seed=0, num_devices=1)
    m_a = exp_a.fit()
    exp_b = Experiment(_cfg(tiny_config, True), seed=0, num_devices=1)
    m_b = exp_b.fit()
    assert m_b["train_loss"] == pytest.approx(m_a["train_loss"], rel=1e-6)
    assert m_b["val_mae"] == pytest.approx(m_a["val_mae"], rel=1e-6)
    ka = np.asarray(exp_a.state.params["regressor"]["kernel"])
    kb = np.asarray(exp_b.state.params["regressor"]["kernel"])
    np.testing.assert_allclose(ka, kb, rtol=1e-6, atol=1e-7)
    assert int(exp_a.state.step) == int(exp_b.state.step)


@pytest.mark.parametrize("num_devices", [1, 8])
def test_gather_modes_equivalent(tiny_config, tmp_path, monkeypatch, num_devices):
    """train.epoch_gather 'step' (gather-on-read inside the scan) vs 'block'
    (one stacked gather per epoch): the SAME rows reach the SAME steps with
    bit-identical values, but the two modes compile different XLA programs,
    so fusion may reorder reductions — measured drift ~1e-8 rel after two
    epochs (r4; an exact-equality assertion caught this). The contract is
    data-order equivalence, asserted at well under single-step fp noise."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(mode):
        cfg = _cfg(tiny_config, True)
        cfg["train"] = dict(cfg["train"], epoch_gather=mode)
        exp = Experiment(cfg, seed=0, num_devices=num_devices)
        m = exp.fit()
        return m, np.asarray(exp.state.params["regressor"]["kernel"])

    m_s, k_s = run("step")
    m_b, k_b = run("block")
    assert m_s["train_loss"] == pytest.approx(m_b["train_loss"], rel=1e-6)
    np.testing.assert_allclose(k_s, k_b, rtol=1e-6, atol=1e-7)


def test_epoch_gather_rejects_unknown_mode(tiny_config):
    cfg = _cfg(tiny_config, True)
    cfg["train"] = dict(cfg["train"], epoch_gather="bogus")
    with pytest.raises(ValueError, match="epoch_gather"):
        Experiment(cfg, seed=0, num_devices=1).fit()


def test_fused_epoch_data_parallel(tiny_config, tmp_path, monkeypatch):
    """Fused epoch over 8 DP shards: batch axis sharded inside the scan."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _cfg(tiny_config, "auto")
    cfg["train"]["ep"] = 2
    exp = Experiment(cfg, seed=0, num_devices=8)
    assert exp.mesh.shape["data"] == 8
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"])
    # DP fused result must match the single-device fused result exactly
    exp1 = Experiment(_cfg(tiny_config, True), seed=0, num_devices=1)
    m1 = exp1.fit()
    assert metrics["val_mae"] == pytest.approx(m1["val_mae"], rel=1e-5)


def test_epochs_per_dispatch_bit_equivalent(tiny_config, tmp_path, monkeypatch):
    """train.epochs_per_dispatch=2 must produce the exact same training
    trajectory as per-epoch dispatches (same RNG stream, same permutations,
    same freeze schedule)."""
    import jax
    import numpy as np

    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(epd):
        cfg = dict(tiny_config)
        cfg["train"] = dict(tiny_config["train"], ep=4, batch_size=16,
                            epochs_per_dispatch=epd)
        cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
        exp = Experiment(cfg, seed=0)
        metrics = exp.fit()
        return metrics, jax.device_get(exp.state.params), int(exp.state.step)

    m1, p1, s1 = run(1)
    m2, p2, s2 = run(2)
    assert s1 == s2
    assert m1["val_mae"] == m2["val_mae"]
    assert m1["train_loss"] == m2["train_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_val_and_blocks_active_under_dp(tiny_config, tmp_path, monkeypatch, capsys):
    """Fused validation (and hence multi-epoch blocks) must work on a
    multi-shard data-parallel mesh — the val chunks take the same
    (None, 'data') sharding as the train batches. Historically blocks were
    silently disabled when n_shards > 1, dropping the RPC amortization
    exactly when scaling out."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=4, batch_size=16,
                        epochs_per_dispatch=4)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0, num_devices=8)
    assert exp.mesh.shape["data"] == 8
    metrics = exp.fit()
    out = capsys.readouterr().out
    assert "epochs_per_dispatch=4 ignored" not in out
    assert int(exp.state.step) == 4 * 6
    # fused-val metrics must match the per-device fused result
    exp1 = Experiment(
        dict(cfg, train=dict(cfg["train"], epochs_per_dispatch=1)),
        seed=0, num_devices=1,
    )
    m1 = exp1.fit()
    assert metrics["val_mae"] == pytest.approx(m1["val_mae"], rel=1e-5)


def test_epochs_per_dispatch_tail_and_early_stop(tiny_config, tmp_path, monkeypatch):
    """ep not divisible by the block size: tail epochs run per-epoch; metrics
    exist for every epoch."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=5, batch_size=16,
                        epochs_per_dispatch=3, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert int(exp.state.step) == 5 * 6  # 96/16 = 6 steps per epoch
    assert "val_mae" in metrics
    # checkpoints exist (block-boundary granularity)
    import os
    assert os.path.exists(exp.ckpt.last_path)


def test_gradient_accumulation_matches_full_batch(tiny_config, tmp_path, monkeypatch):
    """accumulate_steps=4 reproduces the exact full-batch update when
    stochasticity is off (mean of equal-size chunk gradients == batch mean)."""
    import jax
    import numpy as np

    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(accum):
        cfg = dict(tiny_config)
        cfg["model"] = dict(tiny_config["model"], hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
        cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16,
                            accumulate_steps=accum)
        cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
        exp = Experiment(cfg, seed=0)
        metrics = exp.fit()
        return metrics, jax.device_get(exp.state.params)

    m1, p1 = run(1)
    m4, p4 = run(4)
    assert m1["val_mae"] == pytest.approx(m4["val_mae"], abs=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gradient_accumulation_divisibility_checked(tiny_config):
    from vit_tpu.train.loop import Experiment

    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], batch_size=16, accumulate_steps=3)
    with pytest.raises(ValueError, match="accumulate_steps"):
        Experiment(cfg, seed=0)


def test_gradient_accumulation_data_parallel(tiny_config, tmp_path, monkeypatch):
    """Accumulation under a multi-shard DP mesh: micro-batches stay sharded
    (mb divisible by shards -> the with_sharding_constraint path) and the
    result matches the unaccumulated DP run."""
    import jax
    import numpy as np

    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    def run(accum):
        cfg = dict(tiny_config)
        cfg["model"] = dict(tiny_config["model"], hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0)
        # batch 32 over 8 shards, accum 2 -> mb 16 divisible by 8
        cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=32,
                            accumulate_steps=accum)
        cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
        exp = Experiment(cfg, seed=0, num_devices=8)
        metrics = exp.fit()
        assert exp.mesh.shape["data"] == 8
        return metrics, jax.device_get(exp.state.params)

    m1, p1 = run(1)
    m2, p2 = run(2)
    assert m1["val_mae"] == pytest.approx(m2["val_mae"], abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
