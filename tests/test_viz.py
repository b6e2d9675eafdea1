"""Viz subsystem tests: utils, plotter, GIF diagnostics, CKA monitor."""

import os

import numpy as np
import pytest

from vit_tpu.viz.diagnostics import CKAMonitor, VizDiagnostics, extract_diagnostics
from vit_tpu.viz.plotter import RegressionPlotter
from vit_tpu.viz.viz_utils import calculate_metrics, denormalize


def test_denormalize_roundtrips():
    y = np.random.default_rng(0).random((20, 2))
    mn, mx = np.array([1.0, -3.0]), np.array([5.0, 7.0])
    norm = (y - 0) * 1.0  # y in [0,1] as minmax-normalized
    raw = denormalize(norm, "minmax", label_min=mn, label_max=mx)
    np.testing.assert_allclose(raw, y * (mx - mn) + mn)  # exact inverse
    mean, std = np.array([2.0, 0.0]), np.array([3.0, 1.0])
    z = denormalize(y, "zscore", label_mean=mean, label_std=std)
    np.testing.assert_allclose(z, y * std + mean)
    # 'none' passthrough
    np.testing.assert_allclose(denormalize(y, "none"), y)


def test_calculate_metrics_perfect_prediction():
    y = np.random.default_rng(1).random((50, 3))
    m = calculate_metrics(y, y)
    assert len(m) == 3
    for mm in m:
        assert mm["mae"] == 0.0 and mm["r2"] == pytest.approx(1.0)


def test_regression_plotter_writes_pngs(tmp_path, monkeypatch):
    monkeypatch.setenv("PLOT_DIR", str(tmp_path))
    rng = np.random.default_rng(2)
    labels = rng.random((100, 2))
    preds = labels + rng.normal(0, 0.05, labels.shape)
    plotter = RegressionPlotter(param_names=["T_eff", "log_g"], model_name="m")
    metrics = plotter.generate_all_plots(preds, labels)
    out = tmp_path / "m"
    for name in ("pred_vs_true", "residual_hist", "error_vs_true", "metric_bars",
                 "residual_corr", "qq_residuals", "summary"):
        assert (out / f"{name}.png").exists(), name
    assert metrics["T_eff"]["r2"] > 0.8


def test_plotter_quick_mode_skips_expensive(tmp_path, monkeypatch):
    monkeypatch.setenv("PLOT_DIR", str(tmp_path))
    labels = np.random.default_rng(3).random((50, 1))
    plotter = RegressionPlotter(model_name="q", quick_mode=True)
    plotter.generate_all_plots(labels, labels)
    out = tmp_path / "q"
    assert (out / "pred_vs_true.png").exists()
    assert not (out / "qq_residuals.png").exists()


def _fake_diag(B=16, H=2, T=9, D=8, layers=2, seed=0):
    rng = np.random.default_rng(seed)
    probs = rng.random((layers, H, T, T))
    probs = probs / probs.sum(-1, keepdims=True)
    return {
        "attn": [probs[i] for i in range(layers)],
        "mlp": {f"layer_{i}": rng.standard_normal((B, T, 4 * D)) for i in range(layers)},
        "cls_hidden": {f"layer_{i}": rng.standard_normal((B, D)) for i in range(layers)},
        "cls_embedding": rng.standard_normal((B, D)),
    }


def test_viz_diagnostics_builds_frames_and_gifs(tmp_path):
    cfg = {
        "enable": True,
        "save_dir": str(tmp_path),
        "embedding_method": "pca",  # umap absent; pca is deterministic+fast
        "gif_duration": 100,
    }
    viz = VizDiagnostics(cfg, model_name="m", param_names=["log_g"])
    rng = np.random.default_rng(0)
    for epoch in range(3):
        preds = rng.random((16, 1))
        labels = rng.random((16, 1))
        viz.on_validation_epoch(epoch, preds, labels, _fake_diag(seed=epoch))
    assert len(viz.frames["distribution"]) == 3
    assert len(viz.frames["attention"]) == 3
    written = viz.on_train_end()
    for key in ("distribution", "activation", "attention", "attention_analytics",
                "embedding", "collinearity"):
        assert key in written and os.path.exists(written[key]), key
        assert os.path.exists(str(tmp_path / "m" / f"{key}_final.png"))


def test_label_axis_bounds():
    """Fixed axis ranges (reference `plotter.py:73-100`): original minmax
    parameter ranges when stats exist, else data range + 5% margin."""
    import numpy as np

    from vit_tpu.viz.viz_utils import label_axis_bounds

    labels = np.array([[0.0, 10.0], [2.0, 30.0], [1.0, 20.0]])
    # minmax stats -> exactly the original parameter ranges
    b = label_axis_bounds(labels, label_norm="minmax",
                          label_min=[-1.0, 5.0], label_max=[3.0, 40.0])
    assert b == [(-1.0, 3.0), (5.0, 40.0)]
    # no stats -> data range with 5% margin
    b2 = label_axis_bounds(labels)
    assert b2[0][0] == pytest.approx(0.0 - 0.1)
    assert b2[0][1] == pytest.approx(2.0 + 0.1)
    assert b2[1] == (pytest.approx(9.0), pytest.approx(31.0))


def test_distribution_frames_share_axes():
    """Consecutive GIF frames must not wobble: the same VizDiagnostics
    instance pins its bounds on the first epoch."""
    import numpy as np

    from vit_tpu.viz.diagnostics import VizDiagnostics

    viz = VizDiagnostics({"create_distribution_gif": True}, model_name="t",
                         param_names=["a"])
    rng = np.random.default_rng(0)
    labels = rng.random((32, 1))
    viz.on_validation_epoch(0, rng.random((32, 1)), labels, {})
    first_bounds = viz.label_bounds
    assert first_bounds is not None
    # wildly different predictions at epoch 1 must not move the bounds
    viz.on_validation_epoch(1, rng.random((32, 1)) * 100, labels, {})
    assert viz.label_bounds == first_bounds
    assert len(viz.frames["distribution"]) == 2
    # frames identical in size (rendered with the same fixed axes)
    assert viz.frames["distribution"][0].size == viz.frames["distribution"][1].size


def test_cka_monitor_flags_frozen_layers():
    cka = CKAMonitor(threshold=0.95)
    diag0 = _fake_diag(seed=0)
    # initial capture logs CKA(init, init) = 1.0 (reference parity)
    first = cka.on_validation_epoch(0, diag0)
    assert first["cka/mean"] == 1.0
    # identical reps -> CKA 1.0 -> flagged unchanged
    out = cka.on_validation_epoch(1, diag0)
    assert out["cka/mean"] == pytest.approx(1.0, rel=1e-6)
    assert out["cka/unchanged_count"] == 3.0  # 2 layers + cls_embedding
    # fresh random reps -> low CKA
    out2 = cka.on_validation_epoch(2, _fake_diag(seed=99))
    assert out2["cka/mean"] < 0.5


def test_experiment_viz_integration(tiny_config, tmp_path, monkeypatch):
    """viz.enable=true: GIFs + cka metrics emitted during fit."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    cfg["viz"] = {
        "enable": True,
        "save_local": True,  # train.save is off; force local GIF artifacts
        "save_dir": str(tmp_path / "viz"),
        "log_every_n_epochs": 1,
        "num_viz_samples": 16,
        "embedding_method": "pca",
        "create_attention_gif": True,
        "gif_duration": 100,
    }
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert "cka/mean" in metrics  # CKA computed from the 2nd logged epoch on
    gif_dir = tmp_path / "viz" / exp.bundle.model_name
    assert (gif_dir / "attention.gif").exists()
    assert (gif_dir / "distribution.gif").exists()
    assert (gif_dir / "cka_report.png").exists()


def test_extract_diagnostics_structure(tiny_config):
    """Capture -> on-device reduction -> host structure (attention probs are
    batch-mean on device; MLP activations are stats + a sampled vector)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.viz.diagnostics import reduce_intermediates

    bundle = get_model(dict(tiny_config))
    x = jnp.ones((4, 512))
    variables = bundle.module.init(jax.random.PRNGKey(0), x)
    logits, state = bundle.module.apply(
        variables, x, capture=True, mutable=["intermediates"]
    )
    reduced = reduce_intermediates(
        state["intermediates"], bundle.vit_config.num_hidden_layers, sample_rate=0.15
    )
    diag = extract_diagnostics(jax.device_get(reduced))
    assert len(diag["attn"]) == 2
    assert diag["attn"][0].shape == (2, bundle.vit_config.seq_len, bundle.vit_config.seq_len)
    assert diag["cls_embedding"].shape == (4, 32)
    assert set(diag["mlp"]) == {"layer_0", "layer_1"}
    stats = diag["mlp"]["layer_0"]
    assert {"mean", "std", "sparsity", "dead_frac", "sat_frac", "sample"} <= set(stats)


def test_sample_rate_changes_transferred_bytes(tiny_config):
    """viz.sample_rate provably scales the bytes crossing to host."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.viz.diagnostics import reduce_intermediates

    bundle = get_model(dict(tiny_config))
    x = jnp.ones((4, 512))
    variables = bundle.module.init(jax.random.PRNGKey(0), x)
    _, state = bundle.module.apply(variables, x, capture=True, mutable=["intermediates"])
    small = reduce_intermediates(state["intermediates"], 2, sample_rate=0.05)
    large = reduce_intermediates(state["intermediates"], 2, sample_rate=0.5)
    n_small = small["mlp"]["layer_0"]["sample"].size
    n_large = large["mlp"]["layer_0"]["sample"].size
    assert n_small < n_large
    assert n_large == pytest.approx(10 * n_small, rel=0.25)


def test_capture_batch_cap_token_scaling():
    """4k-token configs are capped far below 129-token ones for one budget."""
    from vit_tpu.viz.diagnostics import capture_batch_cap

    short = capture_batch_cap(seq_len=129, num_heads=2, intermediate_size=128)
    long = capture_batch_cap(seq_len=4065, num_heads=2, intermediate_size=128)
    assert short > long >= 1
    # stride-1 capture at the default 512 MB budget stays in single-GB range:
    # cap * per-sample bytes <= budget
    per_sample = 4 * (2 * 4065 * 4065 + 4065 * 128)
    assert long * per_sample <= 512 * 1024**2


def test_step_frequency_viz(tiny_config, tmp_path, monkeypatch):
    """viz.log_every_n_steps captures diagnostics mid-epoch (per-step path)."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16,
                        fused_epoch=False)  # 96 samples -> 6 steps
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    cfg["viz"] = {
        "enable": True,
        "save_local": True,  # train.save is off; force local GIF artifacts
        "save_dir": str(tmp_path / "viz"),
        "log_every_n_steps": 3,
        "num_viz_samples": 8,
        "embedding_method": "pca",
        "compute_cka": False,
        "gif_duration": 100,
    }
    exp = Experiment(cfg, seed=0)
    exp.fit()
    # steps 3 and 6 trigger captures
    gif_dir = tmp_path / "viz" / exp.bundle.model_name
    assert (gif_dir / "distribution.gif").exists()


def test_viz_classification_task(tiny_config, tmp_path, monkeypatch, capsys):
    """viz must work on cls runs: logits (n, C) vs integer labels previously
    raised IndexError inside the distribution figure, and the train loop's
    try/except silently killed ALL diagnostics (including CKA) every epoch."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], task_type="cls", num_labels=2)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    cfg["viz"] = {
        "enable": True,
        "save_local": True,
        "save_dir": str(tmp_path / "viz"),
        "num_viz_samples": 16,
        "embedding_method": "pca",
        "compute_cka": True,
        "gif_duration": 100,
    }
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    out = capsys.readouterr().out
    assert "diagnostics skipped" not in out
    assert "cka/mean" in metrics  # first logged epoch -> CKA(init,init)=1.0
    gif_dir = tmp_path / "viz" / exp.bundle.model_name
    assert (gif_dir / "distribution.gif").exists()
