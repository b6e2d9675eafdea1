"""Ring attention (sequence-parallel) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.flash_attention import _xla_attention
from vit_tpu.ops.ring_attention import ring_attention
from vit_tpu.parallel.mesh import make_mesh


def _ref(q, k, v):
    b, h, t, d = q.shape
    return _xla_attention(
        q.reshape(b * h, t, d), k.reshape(b * h, t, d), v.reshape(b * h, t, d),
        d**-0.5,
    ).reshape(b, h, t, d)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(num_devices=8)


@pytest.mark.parametrize("shape", [(2, 2, 256, 16), (1, 4, 512, 32)])
def test_ring_matches_single_device(shape, mesh8):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))
    out = ring_attention(q, k, v, mesh=mesh8, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-5)


def test_ring_output_sharded_over_sequence(mesh8):
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 256, 16)), jnp.float32)
               for _ in range(3))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh8))(q, k, v)
    assert "data" in str(out.sharding.spec)


def test_ring_gradients_match_reference(mesh8):
    rng = np.random.default_rng(2)
    shape = (1, 2, 128, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))

    g1 = jax.grad(lambda q, k, v: (ring_attention(q, k, v, mesh=mesh8) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_ref(q, k, v) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, rel


def test_ring_rejects_indivisible_length(mesh8):
    q = jnp.zeros((1, 2, 130, 16))
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q, q, q, mesh=mesh8)


def test_ring_with_batch_axis_matches_reference():
    """DP batch + SP sequence on one (data=4, model=2) mesh."""
    mesh = make_mesh(num_devices=8, model_parallel=2)
    rng = np.random.default_rng(3)
    shape = (8, 2, 64, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))
    out = ring_attention(q, k, v, mesh=mesh, axis="model", batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-5)


def test_ring_dropout_matches_global_mask(mesh8):
    """In-ring dropout must draw the SAME mask the unsharded computation
    would: numerator-only inverted dropout with globally-offset hash
    coordinates — sharding is an implementation detail, not an RNG
    stream."""
    from vit_tpu.ops.dropout import hash_keep_mask

    rng = np.random.default_rng(4)
    shape = (2, 2, 128, 16)
    rate, seed = 0.3, 12345
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))

    out = ring_attention(
        q, k, v, mesh=mesh8, axis="data", dropout_rate=rate, dropout_seed=seed
    )

    # global reference: dropout(softmax(s)) @ v with the same hash mask
    b, h, t, d = shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    keep = hash_keep_mask((b, h, t, t), rate, seed)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p * keep, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and it actually drops something
    assert float(jnp.abs(out - _ref(q, k, v)).max()) > 1e-3


def test_model_attention_ring_impl_matches_xla():
    """model.attn_impl='ring' through MultiHeadSelfAttention equals the xla
    path (deterministic forward, same params)."""
    from vit_tpu.models.attention import MultiHeadSelfAttention
    from vit_tpu.parallel.mesh import active_mesh, set_active_mesh

    mesh = make_mesh(num_devices=8, model_parallel=2)
    prev = active_mesh()
    set_active_mesh(mesh)
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((8, 16, 32)), jnp.float32)
        ring = MultiHeadSelfAttention(hidden_size=32, num_heads=2, impl="ring")
        xla = MultiHeadSelfAttention(hidden_size=32, num_heads=2, impl="xla")
        params = ring.init(jax.random.PRNGKey(0), x, deterministic=True)
        out_r = ring.apply(params, x, deterministic=True)
        out_x = xla.apply(params, x, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_r), np.asarray(out_x), atol=2e-5
        )
    finally:
        set_active_mesh(prev)


def test_model_attention_ring_requires_mesh():
    from vit_tpu.models.attention import MultiHeadSelfAttention
    from vit_tpu.parallel.mesh import active_mesh, set_active_mesh

    prev = active_mesh()
    set_active_mesh(None)
    try:
        x = jnp.zeros((2, 16, 32))
        m = MultiHeadSelfAttention(hidden_size=32, num_heads=2, impl="ring")
        with pytest.raises(RuntimeError, match="training mesh"):
            m.init(jax.random.PRNGKey(0), x, deterministic=True)
    finally:
        set_active_mesh(prev)


def test_experiment_rejects_ring_with_model_parallel(tmp_path):
    """attn_impl: ring + train.model_parallel>1 must be rejected up front:
    the ring would silently shard the sequence over the TP-sized 'model'
    axis (ADVICE r3)."""
    from vit_tpu.train.loop import Experiment

    cfg = {
        "project": "vit-tpu-test",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 480,
            "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
            "attn_impl": "ring",
        },
        "train": {"batch_size": 16, "ep": 1, "save": False,
                  "model_parallel": 2},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3},
        "data": {"param": "log_g"},
    }
    with pytest.raises(ValueError, match="model_parallel"):
        Experiment(cfg)


def test_active_mesh_cleared_after_fit(tmp_path):
    """Experiment.fit scopes the active mesh — nothing leaks after it
    returns (ADVICE r3: stale-mesh traces)."""
    from vit_tpu.data.synthetic import write_dummy_h5
    from vit_tpu.parallel.mesh import active_mesh, set_active_mesh
    from vit_tpu.train.loop import Experiment

    h5 = str(tmp_path / "mesh_scope.h5")
    write_dummy_h5(h5, n=32, length=480, seed=0)
    cfg = {
        "project": "vit-tpu-test",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 480,
            "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
        },
        "train": {"batch_size": 16, "ep": 1, "save": False},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"file_path": h5, "val_path": h5, "num_samples": 32,
                 "param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    set_active_mesh(None)
    Experiment(cfg).fit()
    assert active_mesh() is None


def test_experiment_trains_with_ring_attention(tmp_path):
    """End-to-end: a config trains with model.attn_impl: ring +
    train.sequence_parallel on the 8-device mesh, and (dropout/noise off)
    matches the xla-attention run's metrics — VERDICT round-2 item 5."""
    from vit_tpu.data.synthetic import write_dummy_h5
    from vit_tpu.train.loop import Experiment

    # length 480, patch/stride 32 -> 15 patches + CLS = 16 tokens: divides
    # the sequence_parallel=2 'model' axis.
    h5 = str(tmp_path / "ring.h5")
    write_dummy_h5(h5, n=96, length=480, seed=0)

    def cfg(attn_impl, sp):
        return {
            "project": "vit-tpu-test",
            "model": {
                "name": "vit", "task_type": "reg", "image_size": 480,
                "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
                "attn_impl": attn_impl,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
            "train": {"batch_size": 16, "ep": 2, "save": False,
                      "sequence_parallel": sp},
            "loss": {"name": "mae"},
            "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
            "data": {"file_path": h5, "val_path": h5, "num_samples": 96,
                     "param": "log_g", "label_norm": "minmax"},
            "noise": {"noise_level": 0},
            "viz": {"enable": False},
        }

    m_ring = Experiment(cfg("ring", 2)).fit()
    m_xla = Experiment(cfg("xla", 1)).fit()
    assert np.isfinite(m_ring["val_mae"])
    # identical update trajectory up to fp reduction order (online softmax
    # vs one-shot softmax), accumulated over 2 epochs of training
    assert m_ring["val_mae"] == pytest.approx(m_xla["val_mae"], rel=1e-3)


# ---------------------------------------------------------------------------
# Blockwise inner loop (O(Tl * block_k) memory — VERDICT r3 item 6)
# ---------------------------------------------------------------------------
def test_ring_blockwise_matches_single_block(mesh8):
    """block_k < T_local (flash-style inner loop) must be numerically
    equivalent to the whole-shard path — block decomposition is an
    implementation detail."""
    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 512, 16)), jnp.float32)
               for _ in range(3))
    whole = ring_attention(q, k, v, mesh=mesh8, axis="data")
    blocked = ring_attention(q, k, v, mesh=mesh8, axis="data", block_k=16)
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(whole), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(_ref(q, k, v)), atol=2e-5
    )


def test_ring_blockwise_gradients_match_reference(mesh8):
    rng = np.random.default_rng(7)
    shape = (1, 2, 256, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))

    g1 = jax.grad(
        lambda q, k, v: (
            ring_attention(q, k, v, mesh=mesh8, block_k=8) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_ref(q, k, v) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, rel


def test_ring_blockwise_dropout_matches_global_mask(mesh8):
    """The hash mask uses GLOBAL coordinates, so the inner block split must
    not change the mask stream either — fwd AND bwd."""
    from vit_tpu.ops.dropout import hash_keep_mask

    rng = np.random.default_rng(8)
    b, h, t, d = shape = (2, 2, 128, 16)
    rate, seed = 0.3, 998
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))

    def loss(q, k, v, block_k):
        return (
            ring_attention(
                q, k, v, mesh=mesh8, axis="data", dropout_rate=rate,
                dropout_seed=seed, block_k=block_k,
            ) ** 2
        ).sum()

    out = ring_attention(
        q, k, v, mesh=mesh8, axis="data", dropout_rate=rate,
        dropout_seed=seed, block_k=4,
    )
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    keep = hash_keep_mask((b, h, t, t), rate, seed)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p * keep, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_blk = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 4)
    g_whole = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, None)
    for a, b_ in zip(g_blk, g_whole):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def _iter_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for val in eqn.params.values():
            for v in val if isinstance(val, (list, tuple)) else [val]:
                inner = getattr(v, "jaxpr", v)
                if hasattr(inner, "eqns"):
                    yield from _iter_eqns(inner)


def test_ring_blockwise_never_materializes_shard_scores(mesh8):
    """Memory accounting (VERDICT r3 item 6 'Done' clause): with the
    blockwise inner path, NO value in the fwd+bwd jaxpr — transient or
    residual, at any nesting depth — reaches the (B, H, Tl, Tl) score-block
    size. Residents per ring step are O(Tl*d) (the custom-VJP residuals are
    exactly q/k/v/o/lse), transients O(Tl*block_k)."""
    b, h, t, d = 1, 2, 2048, 16
    n = 8
    t_local = t // n
    block_k = 64
    q = jnp.zeros((b, h, t, d), jnp.float32)

    def loss(q, k, v):
        return (
            ring_attention(q, k, v, mesh=mesh8, axis="data", block_k=block_k)
            ** 2
        ).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
    # Global arrays (b*h*t*d = 65536) and per-device blocks
    # (b*h*t_local*block_k = 32768) are both well under the score-block size
    # b*h*t_local^2 = 131072 this test guards against.
    score_elems = b * h * t_local * t_local
    biggest = 0
    for eqn in _iter_eqns(jaxpr.jaxpr):
        for var in list(eqn.outvars) + list(eqn.invars):
            aval = getattr(var, "aval", None)
            if aval is not None and getattr(aval, "shape", None) is not None:
                biggest = max(biggest, int(np.prod(aval.shape, dtype=np.int64)))
    assert biggest < score_elems, (
        f"largest array in fwd+bwd jaxpr has {biggest} elements — the "
        f"(Tl, Tl) score block ({score_elems}) materialized somewhere"
    )
