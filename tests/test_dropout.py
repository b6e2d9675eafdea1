"""Hash-based dropout (vit_tpu.ops.dropout): statistics and wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vit_tpu.ops.dropout import HashDropout, hash_dropout


def test_hash_dropout_statistics():
    x = jnp.ones((64, 129, 32))
    rate = 0.1
    y = np.asarray(hash_dropout(x, rate, 1234))
    keep_frac = (y > 0).mean()
    assert abs(keep_frac - (1 - rate)) < 0.005
    np.testing.assert_allclose(y[y > 0], 1 / (1 - rate), rtol=1e-6)
    # unbiased in expectation
    assert abs(float(y.mean()) - 1.0) < 0.01


def test_hash_dropout_deterministic_and_seed_sensitive():
    x = jnp.ones((32, 64))
    a = np.asarray(hash_dropout(x, 0.2, 7))
    b = np.asarray(hash_dropout(x, 0.2, 7))
    c = np.asarray(hash_dropout(x, 0.2, 8))
    np.testing.assert_array_equal(a, b)
    assert ((a > 0) != (c > 0)).mean() > 0.1


def test_hash_dropout_seed_high_bit_sensitive():
    """The seed multiplier must be ODD: an even one discards the seed's
    high bit, making seeds s and s ^ 0x80000000 collide (halving the
    effective seed space of every model-body dropout)."""
    x = jnp.ones((64, 64))
    a = np.asarray(hash_dropout(x, 0.5, 123)) > 0
    b = np.asarray(hash_dropout(x, 0.5, 123 - 2**31)) > 0
    assert (a != b).mean() > 0.3


def test_hash_dropout_module_requires_deterministic():
    """nn.Dropout parity: omitting `deterministic` (attribute AND call arg)
    must raise via merge_param, not silently disable dropout."""
    m = HashDropout(rate=0.5)
    x = jnp.ones((4, 4))
    with pytest.raises(ValueError):
        m.init_with_output({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x)
    # attribute-only form works like nn.Dropout
    m2 = HashDropout(rate=0.5, deterministic=True)
    (y, _) = m2.init_with_output({"params": jax.random.PRNGKey(0)}, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_hash_dropout_axis_decorrelation():
    """(i, j) and (j, i) masks must not coincide (axis mixing works)."""
    x = jnp.ones((128, 128))
    m = np.asarray(hash_dropout(x, 0.5, 3)) > 0
    assert ((m != m.T).mean()) > 0.3


def test_hash_dropout_rate_zero_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(hash_dropout(x, 0.0, 5)), np.asarray(x))


class _TwoDrops(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = HashDropout(rate=0.5, name="d1")(x, deterministic=False)
        b = HashDropout(rate=0.5, name="d2")(x, deterministic=False)
        return a, b


def test_hash_dropout_module_sites_decorrelate():
    """Distinct call sites draw distinct make_rng folds -> distinct masks."""
    m = _TwoDrops()
    x = jnp.ones((64, 64))
    (a, b), _ = m.init_with_output({"params": jax.random.PRNGKey(0),
                                    "dropout": jax.random.PRNGKey(1)}, x)
    a, b = np.asarray(a), np.asarray(b)
    assert ((a > 0) != (b > 0)).mean() > 0.3
    # and reproducible given the same rngs
    (a2, _), _ = m.init_with_output({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(1)}, x)
    np.testing.assert_array_equal(a, np.asarray(a2))


@pytest.mark.parametrize("fast", [True, False])
def test_model_trains_with_either_dropout(tiny_config, tmp_path, monkeypatch, fast):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"], fast_dropout=fast,
                        hidden_dropout_prob=0.1,
                        attention_probs_dropout_prob=0.1)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"]) and metrics["val_mae"] < 0.5
