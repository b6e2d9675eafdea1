"""Model layer tests: tokenizers, RoPE, attention, ViT forward, builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.builder import VitConfig, get_model, get_vit_config
from vit_tpu.models.rope import apply_rope, rope_tables
from vit_tpu.models.tokenization import (
    Conv1DPatchTokenizer,
    SlidingWindowTokenizer,
    conv1d_num_patches,
    sliding_window_num_patches,
)
from vit_tpu.models.vit import SpecViT, compute_loss


def test_num_patches_formulas():
    # reference tokenization.py:40 and :63 semantics
    assert sliding_window_num_patches(4096, 32, 32) == 128
    assert conv1d_num_patches(4096, 32, 32) == 128
    assert sliding_window_num_patches(100, 32, 30) == 4  # ceil(68/30)+1
    assert conv1d_num_patches(100, 32, 30) == 3  # floor(68/30)+1


def test_sliding_window_tokenizer_pads_tail():
    tok = SlidingWindowTokenizer(input_length=100, patch_size=32, hidden_size=8, stride=30)
    x = jnp.ones((2, 100))
    params = tok.init(jax.random.PRNGKey(0), x)
    y = tok.apply(params, x)
    assert y.shape == (2, 4, 8)


def test_conv1d_tokenizer_shape():
    tok = Conv1DPatchTokenizer(input_length=100, patch_size=32, hidden_size=8, stride=30)
    x = jnp.ones((2, 100))
    params = tok.init(jax.random.PRNGKey(0), x)
    assert tok.apply(params, x).shape == (2, 3, 8)


def test_sliding_window_matches_manual_unfold():
    tok = SlidingWindowTokenizer(input_length=64, patch_size=16, hidden_size=4, stride=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 64)), jnp.float32)
    params = tok.init(jax.random.PRNGKey(0), x)
    y = tok.apply(params, x)
    W = params["params"]["projection"]["kernel"]
    b = params["params"]["projection"]["bias"]
    manual = x.reshape(3, 4, 16) @ W + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(manual), rtol=1e-5, atol=1e-5)


def test_rope_rotation_identities():
    # Position 0 is the identity rotation; norms are preserved everywhere.
    cos, sin = rope_tables(8, 16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 16)), jnp.float32)
    y = apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(x[:, 0]), atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_property():
    """q_m . k_n must depend on positions only through (m - n)."""
    dim = 32
    cos, sin = rope_tables(16, dim)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 16, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 16, dim)), jnp.float32)
    # Use identical content at different positions
    qc = jnp.broadcast_to(q[:, :1], q.shape)
    kc = jnp.broadcast_to(k[:, :1], k.shape)
    qr, kr = apply_rope(qc, cos, sin), apply_rope(kc, cos, sin)
    dots = np.asarray(jnp.einsum("bqd,bkd->bqk", qr, kr))[0]
    # same relative offset -> same dot product
    np.testing.assert_allclose(dots[3, 1], dots[7, 5], rtol=1e-4)
    np.testing.assert_allclose(dots[2, 6], dots[5, 9], rtol=1e-4)


@pytest.mark.parametrize("pos", [None, "learned", "rope"])
def test_specvit_forward_shapes(pos):
    cfg = VitConfig(
        task_type="reg",
        image_size=256,
        patch_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        stride_size=32,
        num_labels=3,
        pos_encoding_type=pos,
    )
    model = SpecViT(cfg=cfg)
    x = jnp.ones((4, 256))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (4, 3)
    assert logits.dtype == jnp.float32


def test_specvit_capture_intermediates():
    cfg = VitConfig(
        image_size=128, patch_size=32, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, stride_size=32, num_labels=1,
    )
    model = SpecViT(cfg=cfg)
    x = jnp.ones((5, 128))  # B != H so the shape pins the BATCH-mean axis
    variables = model.init(jax.random.PRNGKey(0), x)
    _, state = model.apply(variables, x, capture=True, mutable=["intermediates"])
    inter = state["intermediates"]
    probs = inter["encoder"]["layer_0"]["attention"]["attention_probs"][0]
    # sown batch-mean on device (H, T, T): memory discipline at long T
    assert probs.shape == (cfg.num_attention_heads, cfg.seq_len, cfg.seq_len)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    assert "cls_embedding" in inter


def test_compute_loss_semantics():
    logits = jnp.array([[1.0], [2.0]])
    labels = jnp.array([[0.0], [0.0]])
    # 'mae' does NOT contain 'l1' -> MSE (reference specvit.py:52 quirk)
    mse = compute_loss(logits, labels, "reg", "mae")
    np.testing.assert_allclose(float(mse), (1.0 + 4.0) / 2)
    l1 = compute_loss(logits, labels, "reg", "l1")
    np.testing.assert_allclose(float(l1), 1.5)
    # masked eval weights
    w = jnp.array([1.0, 0.0])
    np.testing.assert_allclose(float(compute_loss(logits, labels, "reg", "l1", w)), 1.0)
    # classification CE
    cls_logits = jnp.array([[10.0, -10.0]])
    ce = compute_loss(cls_logits, jnp.array([0]), "cls")
    assert float(ce) < 1e-4


def test_builder_num_labels_from_param(tiny_config):
    tiny_config["data"]["param"] = "T_eff, log_g, M_H"
    cfg = get_vit_config(tiny_config)
    assert cfg.num_labels == 3
    assert cfg.intermediate_size == 4 * cfg.hidden_size
    assert tiny_config["model"]["num_labels"] == 3


def test_builder_perf_knob_mapping(tiny_config):
    """Opt-in perf knobs flow config -> VitConfig, and stay off by default
    (defaults must preserve reference numerics)."""
    cfg = get_vit_config(tiny_config)
    assert cfg.gelu_approximate is False
    assert cfg.softmax_dtype is None
    tiny_config["model"]["gelu_approximate"] = True
    tiny_config["model"]["softmax_dtype"] = "bfloat16"
    cfg = get_vit_config(tiny_config)
    assert cfg.gelu_approximate is True
    assert cfg.softmax_dtype == "bfloat16"


def test_builder_vanilla_model_name(tiny_config):
    bundle = get_model(tiny_config)
    assert bundle.model_name == "ViT_p32_h32_l2_a2_s32_pSW"
    assert bundle.loss_name == "mae"
    assert not bundle.has_preprocessor


def test_model_name_noise_suffix(tiny_config):
    tiny_config["noise"] = {"noise_level": 0.1}
    bundle = get_model(tiny_config)
    assert bundle.model_name.endswith("_nz01")


def test_image_vit_preset(tiny_config):
    tiny_config["model"] = {
        "name": "vit-s16",
        "task_type": "cls",
        "image_size": 32,
        "num_labels": 10,
        "input_kind": "image",
    }
    cfg = get_vit_config(tiny_config)
    assert cfg.hidden_size == 384 and cfg.num_hidden_layers == 12
    assert cfg.num_patches == 4
    model = SpecViT(cfg=cfg)
    x = jnp.ones((2, 32, 32, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    # shape-only init (ViT-S is big for a unit test); head present
    assert "classifier" in variables["params"]


def test_builder_honors_legacy_task_alias(tiny_config):
    """model.task (legacy key) must reach get_model's loss selection: a reg
    config using the alias previously got loss_name forced to 'ce' (and so
    silently trained MSE) while the head correctly resolved to regression."""
    from vit_tpu.models.builder import get_model

    cfg = dict(tiny_config)
    cfg["model"] = dict(tiny_config["model"])
    cfg["model"].pop("task_type")
    cfg["model"]["task"] = "reg"
    cfg["loss"] = {"name": "l1"}
    bundle = get_model(cfg)
    assert bundle.vit_config.task_type == "reg"
    assert bundle.loss_name == "l1"


def test_attention_out_dropout_uses_hidden_rate():
    """HF ViTSelfOutput drops the projected attention output at
    hidden_dropout_prob, not the probs rate: probs-rate 0 + hidden-rate>0
    must still apply output dropout."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.attention import MultiHeadSelfAttention

    m = MultiHeadSelfAttention(hidden_size=32, num_heads=2,
                               dropout_rate=0.0, out_dropout_rate=0.5)
    x = jnp.ones((2, 9, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    det = m.apply(params, x, deterministic=True)
    stoch = m.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(det), np.asarray(stoch))
    # and rate 0 on both -> identical
    m0 = MultiHeadSelfAttention(hidden_size=32, num_heads=2,
                                dropout_rate=0.0, out_dropout_rate=0.0)
    p0 = m0.init(jax.random.PRNGKey(0), x)
    a = m0.apply(p0, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = m0.apply(p0, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_attention_softmax_dtype_knob():
    """model.softmax_dtype: bfloat16 (opt-in perf knob) must stay close to
    the default fp32 softmax accumulation, and None must be exactly the
    fp32 path (reference semantics unchanged by the knob's existence)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.attention import MultiHeadSelfAttention

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 9, 32)), jnp.float32
    )
    kw = dict(hidden_size=32, num_heads=2, dropout_rate=0.0,
              out_dropout_rate=0.0, impl="xla")
    m_f32 = MultiHeadSelfAttention(**kw)
    m_none = MultiHeadSelfAttention(**kw, softmax_dtype=None)
    m_bf16 = MultiHeadSelfAttention(**kw, softmax_dtype="bfloat16")
    params = m_f32.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m_f32.apply(params, x, deterministic=True))
    np.testing.assert_array_equal(
        ref, np.asarray(m_none.apply(params, x, deterministic=True))
    )
    got = np.asarray(m_bf16.apply(params, x, deterministic=True))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02)
    assert got.dtype == ref.dtype  # output dtype governed by self.dtype


def test_attention_fused_qkv_knob():
    """model.fused_qkv: one (D, 3D) projection — identical math, identical
    param layout AND init values (the q/k/v kernels keep their own scopes,
    so the init RNG folds are unchanged)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.attention import MultiHeadSelfAttention

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 9, 32)), jnp.float32
    )
    kw = dict(hidden_size=32, num_heads=2, dropout_rate=0.0,
              out_dropout_rate=0.0, impl="xla")
    m_sep = MultiHeadSelfAttention(**kw)
    m_fused = MultiHeadSelfAttention(**kw, fused_qkv=True)
    p_sep = m_sep.init(jax.random.PRNGKey(0), x)
    p_fused = m_fused.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_sep, p_fused,
    )
    ref = np.asarray(m_sep.apply(p_sep, x, deterministic=True))
    got = np.asarray(m_fused.apply(p_sep, x, deterministic=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    # no-bias variant keeps the layout contract too
    kwb = dict(kw, qkv_bias=False)
    pb = MultiHeadSelfAttention(**kwb).init(jax.random.PRNGKey(0), x)
    gotb = MultiHeadSelfAttention(**kwb, fused_qkv=True).apply(
        pb, x, deterministic=True
    )
    refb = MultiHeadSelfAttention(**kwb).apply(pb, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(gotb), np.asarray(refb), rtol=1e-6, atol=1e-6
    )


def test_image_cls_token_standard_init(tiny_config):
    """Image family uses the standard-ViT 0.02 init for cls_token (the
    spectra family's std-1.0 is a deliberate reference quirk that must not
    leak into the 'standard ViT' presets)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model

    cfg = {
        "project": "t",
        "model": {"name": "vit", "task_type": "cls", "input_kind": "image",
                  "image_size": 32, "patch_size": 8, "hidden_size": 64,
                  "num_hidden_layers": 1, "num_attention_heads": 2,
                  "num_labels": 10, "num_channels": 3,
                  "pos_encoding_type": "learned"},
        "train": {}, "loss": {"name": "ce"}, "data": {},
    }
    bundle = get_model(cfg)
    params = bundle.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    cls = np.asarray(params["params"]["embeddings"]["cls_token"])
    assert np.abs(cls).max() < 0.2  # ~N(0, 0.02), not N(0, 1)


def test_image_pca_r_exceeding_components_raises(tmp_path, tiny_config):
    """warmup.r beyond the patch-PCA artifact's component count must raise
    (silent clamping corrupted the rank encoded in the model name)."""
    import numpy as np_

    from vit_tpu.models.builder import get_model

    art = tmp_path / "pca.npz"
    patch_dim = 8 * 8 * 3
    np_.savez(art, V=np_.eye(patch_dim, 16, dtype=np_.float32),
              mean=np_.zeros(patch_dim, np_.float32),
              patch_size=np_.asarray(8), step=np_.asarray(8),
              U=np_.zeros((0,)), S=np_.zeros((16,)),
              explained_variance_ratio=np_.zeros((16,)),
              num_patches=np_.asarray(16))
    cfg = {
        "project": "t",
        "model": {"name": "vit", "task_type": "cls", "input_kind": "image",
                  "image_size": 32, "patch_size": 8, "hidden_size": 32,
                  "num_hidden_layers": 1, "num_attention_heads": 2,
                  "num_labels": 10, "num_channels": 3,
                  "pos_encoding_type": "learned"},
        "warmup": {"preprocessor": "pca", "pca_path": str(art), "r": 64},
        "train": {}, "loss": {"name": "ce"}, "data": {},
    }
    with pytest.raises(ValueError, match="exceeds"):
        get_model(cfg)


@pytest.mark.parametrize("remat", [True, "mlp"])
def test_remat_modes_equivalent_to_baseline(remat):
    """remat=True (whole layers) and remat='mlp' (MLP sublayer only) are
    pure memory/recompute trades: identical param tree, forward, and grads."""
    kwargs = dict(
        task_type="reg", image_size=128, patch_size=32, hidden_size=16,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        stride_size=32, num_labels=1, pos_encoding_type="learned",
    )
    base = SpecViT(cfg=VitConfig(**kwargs))
    rem = SpecViT(cfg=VitConfig(**kwargs, remat=remat))
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((3, 128)), jnp.float32
    )
    v_base = base.init(jax.random.PRNGKey(0), x)
    v_rem = rem.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, v_base["params"], v_rem["params"]
    )

    def loss_fn(model, params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(base, p))(v_base["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(rem, p))(v_base["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )


def test_parse_remat_values():
    from vit_tpu.models.builder import _parse_remat

    assert _parse_remat("mlp") == "mlp"
    assert _parse_remat("MLP") == "mlp"
    assert _parse_remat(True) is True
    assert _parse_remat("true") is True
    assert _parse_remat(False) is False
    assert _parse_remat("false") is False
    with pytest.raises(ValueError, match="remat"):
        _parse_remat("bogus")
