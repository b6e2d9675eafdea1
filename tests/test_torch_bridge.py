"""Torch state-dict interchange tests.

Validates (a) name parity against HF's actual ViTModel encoder naming,
(b) round-trip exactness, and (c) NUMERICAL parity: an HF torch ViTLayer
loaded with our exported weights produces the same outputs as our Flax
encoder layer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_tpu.models.builder import VitConfig
from vit_tpu.models.vit import SpecViT, ViTLayer
from vit_tpu.train.torch_bridge import (
    from_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    to_torch_state_dict,
)

CFG = VitConfig(
    task_type="reg",
    image_size=256,
    patch_size=32,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    stride_size=32,
    num_labels=2,
    pos_encoding_type="learned",
)


@pytest.fixture(scope="module")
def flax_params():
    model = SpecViT(cfg=CFG)
    return model.init(jax.random.PRNGKey(0), jnp.ones((2, 256)))["params"]


def test_encoder_names_match_hf_vit(flax_params):
    """Exported encoder keys must be a subset of HF ViTModel's naming."""
    from transformers import ViTConfig as HFConfig, ViTModel

    hf = ViTModel(
        HFConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=128, image_size=224, patch_size=16)
    )
    hf_keys = {f"vit.{k}" for k in hf.state_dict().keys()}
    ours = to_torch_state_dict(flax_params, CFG)
    encoder_keys = {k for k in ours if k.startswith("vit.encoder.") or k == "vit.layernorm.weight" or k == "vit.layernorm.bias"}
    missing = encoder_keys - hf_keys
    assert not missing, f"keys not in HF naming: {sorted(missing)[:5]}"


def test_roundtrip_exact(flax_params):
    sd = to_torch_state_dict(flax_params, CFG)
    restored = from_torch_state_dict(sd, flax_params, CFG)
    flat_a = jax.tree_util.tree_leaves_with_path(flax_params)
    restored_map = dict(jax.tree_util.tree_leaves_with_path(restored))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(restored_map[path]), err_msg=str(path)
        )


def test_pt_file_roundtrip(flax_params, tmp_path):
    path = str(tmp_path / "model.pt")
    save_torch_checkpoint(flax_params, CFG, path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert "vit.embeddings.cls_token" in sd
    assert sd["regressor.weight"].shape == (2, 32)
    restored = load_torch_checkpoint(path, flax_params, CFG)
    np.testing.assert_array_equal(
        np.asarray(restored["regressor"]["kernel"]),
        np.asarray(flax_params["regressor"]["kernel"]),
    )


def test_lightning_prefixed_checkpoint(flax_params, tmp_path):
    """Reference Lightning ckpts wrap the state dict with a model. prefix."""
    import torch

    sd = to_torch_state_dict(flax_params, CFG)
    ckpt = {"state_dict": {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()},
            "epoch": 3}
    path = str(tmp_path / "lightning.ckpt")
    torch.save(ckpt, path)
    restored = load_torch_checkpoint(path, flax_params, CFG)
    np.testing.assert_array_equal(
        np.asarray(restored["embeddings"]["cls_token"]),
        np.asarray(flax_params["embeddings"]["cls_token"]),
    )


def test_encoder_layer_numerical_parity(flax_params):
    """HF torch ViTLayer with our exported weights == our Flax ViTLayer."""
    import torch
    from transformers import ViTConfig as HFConfig
    from transformers.models.vit.modeling_vit import ViTLayer as HFViTLayer

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12,
        hidden_act="gelu", qkv_bias=True, attn_implementation="eager",
    )
    hf_layer = HFViTLayer(hf_cfg).eval()

    sd = to_torch_state_dict(flax_params, CFG)
    prefix = "vit.encoder.layer.0."
    layer_sd = {k[len(prefix):]: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items() if k.startswith(prefix)}
    result = hf_layer.load_state_dict(layer_sd, strict=True)
    assert not result.missing_keys and not result.unexpected_keys

    x = np.random.default_rng(0).standard_normal((2, 9, 32)).astype(np.float32)
    with torch.no_grad():
        out = hf_layer(torch.from_numpy(x))
        torch_out = (out if torch.is_tensor(out) else out[0]).numpy()

    flax_layer = ViTLayer(CFG)
    flax_out = flax_layer.apply(
        {"params": flax_params["encoder"]["layer_0"]}, jnp.asarray(x), True
    )
    np.testing.assert_allclose(np.asarray(flax_out), torch_out, rtol=2e-4, atol=2e-5)


def test_conv1d_tokenizer_layout(tmp_path):
    """Conv1D tokenizer weights map to torch Conv1d layout and back."""
    cfg = VitConfig(
        task_type="reg", image_size=128, patch_size=16, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
        stride_size=16, proj_fn="C1D", num_labels=1,
    )
    model = SpecViT(cfg=cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.ones((1, 128)))["params"]
    sd = to_torch_state_dict(params, cfg)
    assert sd["vit.embeddings.patch_embeddings.projection.weight"].shape == (16, 1, 16)
    restored = from_torch_state_dict(sd, params, cfg)
    np.testing.assert_array_equal(
        np.asarray(restored["embeddings"]["patch_embeddings"]["projection"]["kernel"]),
        np.asarray(params["embeddings"]["patch_embeddings"]["projection"]["kernel"]),
    )


def test_load_hf_image_vit_checkpoint_numerical_parity():
    """A full transformers ViTForImageClassification state dict loads into
    the image ViT and reproduces the torch forward numerically — i.e.
    pretrained HF image-ViT checkpoints (vit-base-patch16-224-style .pt
    files) are directly usable."""
    import torch
    from transformers import ViTConfig as HFViTConfig
    from transformers import ViTForImageClassification

    hf_cfg = HFViTConfig(
        image_size=32, patch_size=8, num_channels=3, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=128,
        num_labels=10, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = ViTForImageClassification(hf_cfg).eval()
    sd = {k: v for k, v in hf_model.state_dict().items()}

    cfg = VitConfig(
        task_type="cls", input_kind="image", image_size=32, patch_size=8,
        num_channels=3, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128, num_labels=10,
        pos_encoding_type="learned", hidden_dropout=0.0, attention_dropout=0.0,
    )
    model = SpecViT(cfg=cfg)
    x_np = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
    params = from_torch_state_dict(sd, template, cfg)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x_np),
                                  deterministic=True))
    with torch.no_grad():
        theirs = hf_model(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
