"""End-to-end training-loop tests on synthetic spectra (CPU mesh)."""

import os

import numpy as np
import pytest

from vit_tpu.train.loop import Experiment


@pytest.fixture()
def fast_config(tiny_config, tmp_path):
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=3, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    return cfg


def test_fit_reduces_loss(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    exp = Experiment(fast_config, seed=0)
    exp.datamodule.setup("fit")
    # capture first-epoch loss trajectory via the returned metrics
    metrics = exp.fit()
    assert "train_loss" in metrics and np.isfinite(metrics["train_loss"])
    assert "val_mae" in metrics
    # minmax labels in [0,1]; a fitted model must beat the trivial 0.5 guess
    assert metrics["val_mae"] < 0.5


def test_run_fit_then_test(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    exp = Experiment(fast_config, seed=0)
    metrics = exp.run()
    assert "test_mae" in metrics and np.isfinite(metrics["test_mae"])
    assert "test_r2" in metrics
    assert f"test_bias_median" in metrics and "test_p90" in metrics and "test_beta" in metrics


def test_checkpoint_save_and_test_best(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fast_config["train"]["save"] = True
    exp = Experiment(fast_config, seed=0)
    exp.fit()
    assert exp.ckpt.best_epoch is not None
    assert os.path.exists(exp.ckpt.best_path)
    assert os.path.exists(exp.ckpt.last_path)

    # fresh experiment evaluates the saved best checkpoint
    exp2 = Experiment(dict(fast_config), seed=0)
    m = exp2.test(ckpt="best")
    assert np.isfinite(m["test_mae"])


def test_resume_from_checkpoint(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fast_config["train"]["save"] = True
    fast_config["train"]["ep"] = 2
    exp = Experiment(fast_config, seed=0)
    exp.fit()
    step_after_2 = int(exp.state.step)

    cfg2 = dict(fast_config)
    cfg2["train"] = dict(fast_config["train"], ep=3)
    exp2 = Experiment(cfg2, ckpt_path="last", seed=0)
    exp2.fit()
    assert int(exp2.state.step) > step_after_2


def test_debug_fast_dev_run(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fast_config["train"]["debug"] = 1
    exp = Experiment(fast_config, seed=0)
    metrics = exp.fit()
    assert int(exp.state.step) == 1  # one batch only


def test_classification_task(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fast_config["model"] = dict(fast_config["model"], task_type="cls", num_labels=2)
    exp = Experiment(fast_config, seed=0)
    metrics = exp.fit()
    assert "val_acc" in metrics
    assert 0.0 <= metrics["val_acc"] <= 1.0
    assert exp.monitor == "acc" and exp.monitor_mode == "max"


def test_train_noise_injection_path(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fast_config["noise"] = {"noise_level": 0.3}
    fast_config["train"]["ep"] = 1
    exp = Experiment(fast_config, seed=0)
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"])
    # val uses pre-generated fixed-seed noisy copies
    assert exp.datamodule.val.noisy is not None


def test_plateau_reduces_lr(fast_config, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    # patience 0 -> any non-improving epoch immediately decays the LR scale
    fast_config["opt"] = {"type": "AdamW", "lr": 1e-9, "lr_sch": "plateau",
                          "factor": 0.5, "patience": 0}
    fast_config["train"]["ep"] = 4
    exp = Experiment(fast_config, seed=0)
    exp.fit()
    # with lr ~0 the metric can't improve, so the plateau must have fired
    assert float(exp.state.plateau_scale) < 1.0


def test_data_parallel_multi_device(fast_config, monkeypatch, tmp_path):
    """8 virtual CPU devices: batch 16 shards over the data axis."""
    import jax

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    assert len(jax.devices()) == 8
    fast_config["train"]["ep"] = 1
    exp = Experiment(fast_config, seed=0, num_devices=8)
    assert dict(exp.mesh.shape)["data"] == 8
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"])


def test_resume_preserves_plateau_state(fast_config, monkeypatch, tmp_path):
    """--ckpt resume must keep ReduceLROnPlateau reductions: the host-side
    scheduler state is persisted in ckpt meta and re-seeded on resume
    (previously the first post-resume validation reset the scale to 1.0)."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["train"] = dict(fast_config["train"], ep=4, save=True)
    # patience 0 + a quickly-flat metric forces scale reductions
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "plateau",
                  "factor": 0.5, "patience": 0}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    scale_before = float(exp.state.plateau_scale)
    meta = exp.ckpt.read_meta()
    assert "plateau_state" in meta and "early_stop_state" in meta
    assert meta["plateau_state"]["scale"] == pytest.approx(scale_before)

    cfg2 = dict(cfg)
    cfg2["train"] = dict(cfg["train"], ep=6)
    exp2 = Experiment(cfg2, ckpt_path="last", seed=0)
    exp2.fit()
    # 2 more epochs with the seeded scheduler: scale can only stay or shrink
    assert float(exp2.state.plateau_scale) <= scale_before + 1e-9
    if scale_before < 1.0:
        # the key regression: pre-interruption reductions were not undone
        assert float(exp2.state.plateau_scale) < 1.0


def test_dataset_smaller_than_batch(fast_config, monkeypatch, tmp_path):
    """n_train < batch_size: the epoch permutation must cycle multiple times
    (single-cycle padding produced a short vector that crashed the
    fused-epoch reshape at trace time)."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["data"] = dict(fast_config["data"], num_samples=10)
    cfg["train"] = dict(fast_config["train"], ep=1, batch_size=64,
                        fused_epoch=True)
    exp = Experiment(cfg, seed=0, num_devices=1)
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"])
    assert int(exp.state.step) == 1  # ceil(10/64) = 1 step/epoch


def test_fresh_run_does_not_inherit_previous_best(fast_config, monkeypatch, tmp_path):
    """Lightning parity: ModelCheckpoint tracks best IN-MEMORY per run. A
    fresh run with the same model name must not seed its best tracker from
    the previous run's meta.yaml (which silently suppressed best-saving and
    made run() test stale weights)."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["train"] = dict(fast_config["train"], ep=2, save=True)
    exp1 = Experiment(cfg, seed=0)
    exp1.fit()
    assert exp1.ckpt.best_value is not None

    exp2 = Experiment(dict(cfg), seed=1)
    assert exp2.ckpt.best_value is None  # no inheritance pre-fit
    exp2.fit()
    assert exp2.ckpt.best_epoch is not None  # saved its OWN best

    # --ckpt resume DOES restore the tracker
    exp3 = Experiment(dict(cfg), ckpt_path="last", seed=0)
    exp3.fit()  # load_best_from_meta runs inside fit
    assert exp3.ckpt.best_value is not None


def test_val_fallback_without_val_path(fast_config, monkeypatch, tmp_path):
    """data.val_path omitted: validation still runs on the file_path fallback
    (the reference ALWAYS builds a val split, `basemodule.py:60-66` +
    `dataloader/base.py:76`), while the plateau scheduler stays disabled
    (reference gates it on an explicit val_path, `basemodule.py:158-166`)."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["data"] = dict(fast_config["data"])
    cfg["data"].pop("val_path")
    cfg["train"] = dict(fast_config["train"], ep=2)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-9, "lr_sch": "plateau",
                  "factor": 0.5, "patience": 0}
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert "val_mae" in metrics and np.isfinite(metrics["val_mae"])
    # plateau must be OFF: with lr~0 nothing improves, yet the scale holds
    assert float(exp.state.plateau_scale) == 1.0


def test_block_mode_early_stop_flushes_to_boundary(fast_config, monkeypatch, tmp_path, capsys):
    """epochs_per_dispatch>1: an early stop at a non-block-final epoch must
    flush the cached block epochs so the checkpoint and reported metrics
    describe the state actually held (training runs through the block's
    final epoch inside the single dispatch)."""
    from vit_tpu.train.checkpoint import CheckpointManager

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["train"] = dict(fast_config["train"], ep=4, save=True,
                        epochs_per_dispatch=4, fused_epoch=True,
                        divergence_threshold=1e-12)  # trips at epoch 0
    # single-device mesh: blocks need the fused-val path (1 data shard)
    exp = Experiment(cfg, seed=0, num_devices=1)
    exp.fit()
    out = capsys.readouterr().out
    assert "flushing to the block boundary" in out
    steps_per_epoch = -(-96 // 16)
    # the whole 4-epoch block was trained in one dispatch...
    assert int(exp.state.step) == 4 * steps_per_epoch
    # ...and 'last' on disk matches that state, not an earlier epoch
    restored = CheckpointManager.restore(exp.ckpt.resolve("last"), exp.state)
    assert int(restored.step) == int(exp.state.step)


def test_epochs_per_dispatch_ignored_is_announced(fast_config, monkeypatch, tmp_path, capsys):
    """Silently dropping the user's amortization knob is a diagnosable event:
    when blocks can't be used (here: viz needs per-epoch states) a log line
    must say so."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(fast_config)
    cfg["train"] = dict(fast_config["train"], ep=1, epochs_per_dispatch=8)
    cfg["viz"] = {"enable": True, "compute_cka": False, "num_viz_samples": 8}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    out = capsys.readouterr().out
    assert "epochs_per_dispatch=8 ignored" in out


def test_plotting_quick_mode_respected(fast_config, monkeypatch, tmp_path):
    """plotting.quick_mode (reference `vit.py:288`) must reach the test-time
    RegressionPlotter: quick mode emits the core figures only."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    monkeypatch.setenv("PLOT_DIR", str(tmp_path / "plots"))
    cfg = dict(fast_config)
    cfg["train"] = dict(fast_config["train"], ep=1)
    cfg["viz"] = {"enable": True, "compute_cka": False}
    cfg["plotting"] = {"quick_mode": True}
    exp = Experiment(cfg, seed=0)
    exp.run()
    out = tmp_path / "plots" / exp.bundle.model_name
    made = {p.name for p in out.glob("*.png")}
    assert "pred_vs_true.png" in made
    assert "error_vs_true.png" not in made  # quick mode skips the extras
