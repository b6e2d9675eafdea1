"""Fused Pallas MLP kernel tests (interpret mode + jnp fallback + model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.fused_mlp import _jnp_mlp, fused_mlp


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("rows", [129, 200, 256, 1000, 1100])
def test_fused_mlp_forward_matches_reference(rows):
    d, f = 32, 128
    x = _rand((rows, d), 0)
    w1, b1, w2, b2 = _rand((d, f), 1), _rand((f,), 2), _rand((f, d), 3), _rand((d,), 4)
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    ref = _jnp_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_3d_input():
    x = _rand((4, 129, 32), 5)
    w1, b1, w2, b2 = _rand((32, 128), 1), _rand((128,), 2), _rand((128, 32), 3), _rand((32,), 4)
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    assert out.shape == x.shape
    ref = _jnp_mlp(x.reshape(-1, 32), w1, b1, w2, b2).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_gradients_match_reference():
    """Hand-written backward kernel (incl. padded-row zero-dy exactness and
    the cross-block weight-grad accumulation) == autodiff of the reference."""
    d, f, rows = 32, 128, 300  # pads to 384 -> 2 blocks at block_r=192? no: 1
    x = _rand((rows, d), 6)
    w1, b1, w2, b2 = _rand((d, f), 7), _rand((f,), 8), _rand((f, d), 9), _rand((d,), 10)

    def loss_fused(x, w1, b1, w2, b2):
        return (fused_mlp(x, w1, b1, w2, b2, block_r=128, interpret=True) ** 2).sum()

    def loss_ref(x, w1, b1, w2, b2):
        return (_jnp_mlp(x, w1, b1, w2, b2) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        a = np.asarray(a).reshape(np.asarray(b).shape)
        rel = np.abs(a - np.asarray(b)).max() / (np.abs(np.asarray(b)).max() + 1e-9)
        assert rel < 1e-4, rel


def test_model_fused_vs_unfused_equivalent(tiny_config):
    """fused_mlp=True and False produce the same forward (same params — the
    fused path declares nn.Dense-identical param layout)."""
    from vit_tpu.models.builder import get_model

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 512)), jnp.float32)

    def build(flag):
        cfg = dict(tiny_config)
        cfg["model"] = dict(tiny_config["model"], fused_mlp=flag)
        return get_model(cfg).module

    m_on, m_off = build(True), build(False)
    params = m_on.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees
    p_off = m_off.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p_off)
    out_on = m_on.apply({"params": params}, x, deterministic=True)
    out_off = m_off.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off), atol=2e-5)


def test_model_trains_with_fused_mlp(tiny_config, tmp_path, monkeypatch):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], fused_mlp=True)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"]) and metrics["val_mae"] < 0.5


def test_capture_path_reads_fused_params(tiny_config):
    """capture=True uses the nn.Dense path against params initialized by the
    fused path (viz keeps working with fused_mlp on)."""
    from vit_tpu.models.builder import get_model

    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], fused_mlp=True)
    bundle = get_model(cfg)
    x = jnp.ones((2, 512))
    params = bundle.module.init(jax.random.PRNGKey(0), x)["params"]
    logits, state = bundle.module.apply(
        {"params": params}, x, capture=True, mutable=["intermediates"]
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert "mlp_activation" in str(state["intermediates"])
