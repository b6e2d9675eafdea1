"""Analytic FLOPs accounting (builder.step_matmul_flops) + MFU logging."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_tpu.models.builder import get_model, step_matmul_flops


def _bundle(**model_overrides):
    model = {
        "name": "vit", "task_type": "reg", "image_size": 1024,
        "patch_size": 32, "hidden_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "stride_size": 32, "proj_fn": "SW",
    }
    model.update(model_overrides)
    cfg = {
        "project": "flops", "model": model, "train": {"batch_size": 8},
        "loss": {"name": "mae"}, "data": {"param": "log_g"},
        "noise": {"noise_level": 0},
    }
    return get_model(cfg)


def test_forward_flops_match_xla_cost_analysis():
    """The analytic matmul count must agree with XLA's own cost model for
    the compiled forward: analytic is a lower bound (no elementwise), and
    at hidden 128 the elementwise share is small."""
    bundle = _bundle()
    vc = bundle.vit_config
    batch = 8
    x = jnp.zeros((batch, vc.image_size), jnp.float32)
    params = bundle.module.init(jax.random.PRNGKey(0), x[:1])["params"]

    compiled = (
        jax.jit(lambda p, xx: bundle.module.apply(
            {"params": p}, xx, deterministic=True))
        .lower(params, x)
        .compile()
    )
    analysis = compiled.cost_analysis()
    analysis = analysis[0] if isinstance(analysis, (list, tuple)) else analysis
    xla_flops = float(analysis["flops"])
    ours = step_matmul_flops(vc, batch, train=False)
    assert ours <= xla_flops * 1.05  # lower bound (tiny slack for XLA's
    # occasional matmul-rewrite undercounting)
    assert ours >= 0.75 * xla_flops  # and not missing a dominant term


def test_train_factor_and_shape_scaling():
    bundle = _bundle()
    vc = bundle.vit_config
    assert step_matmul_flops(vc, 8, train=True) == 3.0 * step_matmul_flops(
        vc, 8, train=False
    )
    assert step_matmul_flops(vc, 16) == 2.0 * step_matmul_flops(vc, 8)
    # image family: patch embed counts patch^2 * channels input features
    img = _bundle(input_kind="image", image_size=32, patch_size=4,
                  num_labels=10, num_channels=3, task_type="cls",
                  pos_encoding_type="learned")
    vi = img.vit_config
    got = step_matmul_flops(vi, 1, train=False)
    embed = 2 * vi.num_patches * (16 * 3) * vi.hidden_size
    assert got > embed  # embed term present and dominated by the encoder


def test_experiment_logs_tflops_and_mfu(tiny_config, tmp_path, monkeypatch):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16,
                        log_mfu=True, peak_tflops=100.0)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0, num_devices=1)
    assert exp.mesh.size == 1
    metrics = exp.fit()
    assert metrics["tflops_per_s"] > 0
    assert np.isclose(
        metrics["mfu"], metrics["tflops_per_s"] / 100.0, rtol=1e-6
    )
    # default: the keys are absent (log line unchanged)
    cfg2 = dict(tiny_config)
    cfg2["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    cfg2["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    m2 = Experiment(cfg2, seed=0).fit()
    assert "tflops_per_s" not in m2 and "mfu" not in m2


def test_mfu_normalized_by_mesh_size(tiny_config, tmp_path, monkeypatch):
    """peak_tflops is PER-CHIP: on an 8-device DP mesh mfu must divide the
    aggregate tflops_per_s by 8 (an unnormalized mfu reads 8x too high)."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16,
                        log_mfu=True, peak_tflops=100.0)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0, num_devices=8)
    assert exp.mesh.size == 8
    metrics = exp.fit()
    assert np.isclose(
        metrics["mfu"], metrics["tflops_per_s"] / (100.0 * 8), rtol=1e-6
    )
