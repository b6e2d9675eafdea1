"""Int8 serving quantization (vit_tpu.ops.quant) + Predictor integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.builder import get_model
from vit_tpu.ops.quant import (
    int8_dense,
    quantize_dense_params,
    quantized_apply,
    quantized_size_bytes,
    strip_quantized,
)


def _model(hidden=64, layers=2, heads=4):
    cfg = {
        "project": "q",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 512,
            "patch_size": 16, "hidden_size": hidden,
            "num_hidden_layers": layers, "num_attention_heads": heads,
            "stride_size": 16, "proj_fn": "SW",
        },
        "train": {"batch_size": 8},
        "loss": {"name": "mae"},
        "data": {"param": "log_g"},
        "noise": {"noise_level": 0},
    }
    bundle = get_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 512)), jnp.float32
    )
    params = bundle.module.init(jax.random.PRNGKey(0), x[:1])["params"]
    return bundle, params, x


def test_int8_dense_matches_fp32_within_quant_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(256) * 0.01, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    ref = np.asarray(x @ w + b)
    out = np.asarray(int8_dense(x, wq, scale, b))
    # W8A8 error scales with the row/column maxima; on N(0,1)@N(0,0.05)
    # the observed rel RMS is ~0.5% — assert an order of magnitude slack.
    denom = np.sqrt((ref**2).mean())
    assert np.sqrt(((out - ref) ** 2).mean()) / denom < 0.05


def test_quantize_selects_encoder_excludes_head_and_smalls():
    _, params, _ = _model()
    table = quantize_dense_params(params)
    paths = set(table)
    # every encoder Dense is in
    for i in range(2):
        for leaf in ("attention/query", "attention/key", "attention/value",
                     "attention/out", "intermediate", "output"):
            assert f"encoder/layer_{i}/{leaf}" in paths
    # the head and the (fan-in 16) tokenizer proj are out
    assert not any("regressor" in p for p in paths)
    assert not any("patch_embeddings" in p for p in paths)
    # per-channel scales have the right shape; weights are int8
    e = table["encoder/layer_0/intermediate"]
    assert e["wq"].dtype == jnp.int8 and e["wq"].shape == (64, 256)
    assert e["scale"].shape == (256,)
    assert quantized_size_bytes(table) > 0


def test_quantized_forward_close_and_strip_exact():
    bundle, params, x = _model()
    table = quantize_dense_params(params)
    ref = np.asarray(
        bundle.module.apply({"params": params}, x, deterministic=True)
    )
    out = np.asarray(
        quantized_apply(bundle.module, {"params": params}, table, x,
                        deterministic=True)
    )
    # full-model W8A8 drift on a fresh-init model: measured ~0.07% max
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-6)
    assert rel.max() < 0.05
    # stripping the fp32 kernels of quantized layers changes nothing
    stripped = strip_quantized(params, table)
    out2 = np.asarray(
        quantized_apply(bundle.module, {"params": stripped}, table, x,
                        deterministic=True)
    )
    np.testing.assert_array_equal(out, out2)
    k = stripped["encoder"]["layer_0"]["intermediate"]["kernel"]
    assert k.shape == (1, 1)  # placeholder, not the (64, 256) original


def test_quantize_respects_min_fan_in_and_exclude():
    _, params, _ = _model()
    none_left = quantize_dense_params(params, min_fan_in=10_000)
    assert none_left == {}
    with_head = quantize_dense_params(params, exclude=())
    assert any("regressor" in p for p in with_head)


def test_quantize_excludes_moe_router():
    """The router's logits feed a discontinuous top_k: quant error flips
    expert assignment near ties, so DEFAULT_EXCLUDE must skip it."""
    import jax

    from vit_tpu.models.builder import get_model

    cfg = {
        "project": "q", "model": {
            "name": "vit", "task_type": "reg", "image_size": 256,
            "patch_size": 32, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "stride_size": 32, "proj_fn": "SW",
            "moe_experts": 4, "moe_top_k": 1,
        },
        "train": {"batch_size": 8, "ep": 1}, "loss": {"name": "mae"},
        "data": {"param": "log_g"}, "noise": {"noise_level": 0},
    }
    bundle = get_model(cfg)
    params = bundle.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256))
    )["params"]
    table = quantize_dense_params(params)
    assert table  # encoder Dense layers quantize (hidden 64)
    assert not any("router" in p for p in table), sorted(table)


@pytest.fixture()
def trained(tiny_config, tmp_path, monkeypatch):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    # hidden 64 so the encoder clears min_fan_in and actually quantizes
    cfg["model"] = dict(tiny_config["model"], hidden_size=64,
                        num_attention_heads=4)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    exp.fit()
    return exp, cfg


def test_predictor_int8_close_to_fp32(trained):
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:24]
    p32 = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16)
    p8 = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                   quantize="int8")
    assert p8._qtable  # encoder layers actually quantized
    ref, out = p32.predict(flux), p8.predict(flux)
    # physical-units regression outputs: quantization noise must be far
    # below the model's own val MAE scale
    assert np.abs(out - ref).max() < 0.05 * (np.abs(ref).mean() + 1.0)


def test_predictor_int8_fused_qkv_rebuilds_unfused(trained):
    """fused_qkv reads the q/k/v kernels directly (not via nn.Dense), so
    the int8 interceptor never fires for them while strip_quantized would
    hand the fused path (1,1) placeholders. from_checkpoint must serve the
    identical-math unfused module instead (params share the canonical
    separate layout), and a directly-constructed Predictor must refuse
    up front rather than crash at the first forward."""
    from vit_tpu.models.builder import get_model
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:8]
    qcfg = dict(cfg, model=dict(cfg["model"], fused_qkv=True))
    p8 = Predictor.from_checkpoint(
        dict(qcfg), ckpt="best", batch_size=8, quantize="int8"
    )
    assert not getattr(p8.vit_config, "fused_qkv", False)
    ref = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=8
    ).predict(flux)
    out = p8.predict(flux)
    assert np.abs(out - ref).max() < 0.05 * (np.abs(ref).mean() + 1.0)

    bundle = get_model(qcfg)
    with pytest.raises(ValueError, match="fused_qkv"):
        Predictor(
            bundle.module, exp.state.params, bundle.vit_config,
            quantize="int8",
        )


def test_predictor_bf16_precision(trained):
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:16]
    p32 = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16)
    pbf = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                    precision="bf16")
    ref, out = p32.predict(flux), pbf.predict(flux)
    assert np.isfinite(out).all()
    # bf16 has ~3 decimal digits; physical-unit outputs agree to ~1%
    assert np.abs(out - ref).max() < 0.03 * (np.abs(ref).mean() + 1.0)


def test_predictor_int8_data_parallel(trained):
    """Quantized serving composes with data-parallel serving: batches
    sharded over the 8-device mesh, int8 table + stripped params
    replicated; output matches single-device int8 serving."""
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:24]
    single = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                       quantize="int8")
    assert single._qtable  # hidden 64 -> encoder actually quantized
    dp = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                   quantize="int8", num_devices=8)
    assert dp.mesh is not None
    np.testing.assert_allclose(
        dp.predict(flux), single.predict(flux), rtol=1e-5, atol=1e-6
    )


def test_predictor_rejects_unknown_quantize(trained):
    from vit_tpu.serve import Predictor

    _, cfg = trained
    with pytest.raises(ValueError, match="quantize"):
        Predictor.from_checkpoint(dict(cfg), ckpt="best", quantize="int4")


def test_weight_only_mode_close_to_fp32(trained):
    """Under fp32 serving, int8-wo computes in the module's f32 dtype
    (weight-rounding error ONLY — no activation quant, no bf16 downcast);
    drift from fp32 stays far below the model's own val-MAE scale."""
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:24]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    out_wo = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                       quantize="int8-wo").predict(flux)
    assert np.abs(out_wo - ref).max() < 0.05 * (np.abs(ref).mean() + 1.0)


def test_weight_only_respects_module_dtype():
    """The interceptor must run int8-wo in the module's compute dtype: on
    an fp32 module the quantized output matches the f32 dequantized matmul
    to float32 precision (a silent bf16 downcast would miss by ~1e-2)."""
    import jax

    from vit_tpu.ops.quant import quantized_apply

    bundle, params, x = _model()
    table = quantize_dense_params(params)
    # f32 reference with dequantized weights substituted into the tree
    deq = jax.tree_util.tree_map(lambda a: a, params)

    def subst(node, path=()):
        for key, child in list(node.items()):
            if key == "kernel" and "/".join(path) in table:
                e = table["/".join(path)]
                node[key] = (
                    e["wq"].astype(jnp.float32) * e["scale"]
                ).astype(jnp.float32)
            elif hasattr(child, "items"):
                subst(child, path + (key,))

    subst(deq)
    ref = np.asarray(
        bundle.module.apply({"params": deq}, x, deterministic=True)
    )
    out = np.asarray(
        quantized_apply(bundle.module, {"params": params}, table, x,
                        deterministic=True, weight_only=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-6)


def test_resident_weight_reduction():
    """The serving-density claim: int8 table + stripped tree carry ~4x
    fewer encoder-weight bytes than the fp32 originals."""
    _, params, _ = _model(hidden=128, layers=4)
    table = quantize_dense_params(params)
    stripped = strip_quantized(params, table)

    def tree_bytes(t):
        import jax

        return sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(t)
        )

    orig = tree_bytes(params)
    fp32_encoder = sum(
        int(np.prod(e["wq"].shape)) * 4 for e in table.values()
    )
    after = tree_bytes(stripped) + quantized_size_bytes(table)
    saved = orig - after
    # int8 kernel (1/4) + f32 scale vector is all that remains of each
    # quantized kernel; biases/LN/head/embed are untouched
    assert saved > 0.70 * fp32_encoder
    assert quantized_size_bytes(table) < 0.30 * fp32_encoder


def test_predictor_perf_preset(trained):
    """perf_preset = bf16 + tanh GELU + bf16 softmax: close to fp32 within
    the preset's documented approximation error; composes with int8."""
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:16]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    pp = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                   perf_preset=True)
    assert pp.vit_config.gelu_approximate
    assert str(pp.vit_config.precision).lower() in ("bf16", "bfloat16")
    out = pp.predict(flux)
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 0.05 * (np.abs(ref).mean() + 1.0)
    both = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                     perf_preset=True, quantize="int8-wo")
    out2 = both.predict(flux)
    assert np.abs(out2 - ref).max() < 0.08 * (np.abs(ref).mean() + 1.0)
    # The recommended deployment configuration (BASELINE.md round-5
    # "Serving": 4,052 img/s = 1.68x bf16 on ViT-B/16 v5e): preset +
    # calibrated static-scale W8A8.
    deploy = Predictor.from_checkpoint(dict(cfg), ckpt="best", batch_size=16,
                                       perf_preset=True, quantize="int8",
                                       calibration=flux)
    out3 = deploy.predict(flux)
    assert np.isfinite(out3).all()
    assert np.abs(out3 - ref).max() < 0.08 * (np.abs(ref).mean() + 1.0)


def test_calibrated_static_scales_close_and_fused_shape():
    """Static per-tensor activation scales (calibrate_activation_scales):
    every quantized path gains a scalar ``sx``; the calibrated forward
    stays within the W8A8 error envelope of fp32 on in-distribution data."""
    from vit_tpu.ops.quant import calibrate_activation_scales

    bundle, params, x = _model()
    table = quantize_dense_params(params)
    stripped = strip_quantized(params, table)
    ctable = calibrate_activation_scales(
        bundle.module, {"params": stripped}, table, x, deterministic=True
    )
    assert set(ctable) == set(table)
    for e in ctable.values():
        assert e["sx"].shape == () and e["sx"].dtype == jnp.float32
        assert float(e["sx"]) > 0
    ref = np.asarray(
        bundle.module.apply({"params": params}, x, deterministic=True)
    )
    out = np.asarray(
        quantized_apply(bundle.module, {"params": stripped}, ctable, x,
                        deterministic=True)
    )
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-6)
    # per-tensor static scales are coarser than per-row dynamic ones —
    # allow 2x the dynamic test's envelope
    assert rel.max() < 0.10


def test_calibrated_scales_saturate_not_explode():
    """Inputs beyond the calibrated range saturate at +-127 (bounded error),
    they must not produce non-finite outputs."""
    from vit_tpu.ops.quant import calibrate_activation_scales

    bundle, params, x = _model()
    table = quantize_dense_params(params)
    ctable = calibrate_activation_scales(
        bundle.module, {"params": params}, table, x, deterministic=True
    )
    out = np.asarray(
        quantized_apply(bundle.module, {"params": params}, ctable, 10.0 * x,
                        deterministic=True)
    )
    assert np.isfinite(out).all()


def test_predictor_int8_auto_routes_by_batch(trained):
    """quantize='int8' resolves W8A8 below the measured batch crossover and
    weight-only at/above it; explicit modes pin the variant."""
    from vit_tpu.ops.quant import W8A8_WO_BATCH_THRESHOLD
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    small = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=8, quantize="int8"
    )
    assert small.quant_variant == "int8-w8a8"
    big = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=W8A8_WO_BATCH_THRESHOLD,
        quantize="int8"
    )
    assert big.quant_variant == "int8-wo"
    pinned = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=W8A8_WO_BATCH_THRESHOLD,
        quantize="int8-w8a8"
    )
    assert pinned.quant_variant == "int8-w8a8"
    # both routes serve sane predictions
    flux = exp.datamodule.val.flux[:16]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    for p in (small, big, pinned):
        assert np.abs(p.predict(flux) - ref).max() < 0.05 * (
            np.abs(ref).mean() + 1.0
        )


def test_predictor_calibrated_w8a8(trained):
    """Predictor(calibration=...) bakes static activation scales into the
    serving qtable; predictions stay close to fp32."""
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    flux = exp.datamodule.val.flux[:24]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    pc = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=16, quantize="int8-w8a8",
        calibration=exp.datamodule.val.flux[:16],
    )
    assert pc.quant_variant == "int8-w8a8"
    assert all("sx" in e for e in pc._qtable.values())
    out = pc.predict(flux)
    assert np.abs(out - ref).max() < 0.08 * (np.abs(ref).mean() + 1.0)


def test_predictor_calibration_overrides_batch_route(trained):
    """With a calibration batch, quantize='int8' routes W8A8 even at/above
    the weight-only batch crossover (calibrated static-scale W8A8 measured
    faster than bf16 AND weight-only at every batch size — BASELINE.md
    round-5 'Serving')."""
    from vit_tpu.ops.quant import W8A8_WO_BATCH_THRESHOLD
    from vit_tpu.serve import Predictor

    exp, cfg = trained
    big = Predictor.from_checkpoint(
        dict(cfg), ckpt="best", batch_size=W8A8_WO_BATCH_THRESHOLD,
        quantize="int8",
        calibration=exp.datamodule.val.flux[:16],
    )
    assert big.quant_variant == "int8-w8a8"
    assert all("sx" in e for e in big._qtable.values())
    flux = exp.datamodule.val.flux[:16]
    ref = Predictor.from_checkpoint(dict(cfg), ckpt="best",
                                    batch_size=16).predict(flux)
    assert np.abs(big.predict(flux) - ref).max() < 0.08 * (
        np.abs(ref).mean() + 1.0
    )
