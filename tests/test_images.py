"""Image-ViT family tests: dataset, module, end-to-end training."""

import numpy as np

from vit_tpu.data.images import (
    ImageDataset,
    make_dummy_images,
    write_dummy_images_npz,
)


def test_make_dummy_images_learnable():
    d = make_dummy_images(n=100, image_size=32, num_classes=10, seed=0)
    assert d["images"].shape == (100, 32, 32, 3)
    assert d["images"].dtype == np.uint8
    # class drives the dominant channel: check channel means differ per class
    imgs = d["images"].astype(np.float32)
    means = [imgs[d["labels"] == c].mean() for c in range(3) if (d["labels"] == c).any()]
    assert len(set(np.round(means, 1))) > 1


def test_image_dataset_npz_and_fallback(tmp_path):
    path = str(tmp_path / "cifar_like.npz")
    write_dummy_images_npz(path, n=64, image_size=32, seed=0)
    ds = ImageDataset(file_path=path, num_samples=48, image_size=32)
    ds.load_data("fit")
    assert len(ds) == 48
    assert ds.images.dtype == np.float32
    # normalized roughly zero-mean-ish
    assert abs(float(ds.images.mean())) < 3.0
    # fallback: no file -> synthetic
    ds2 = ImageDataset(file_path=None, num_samples=32, image_size=32)
    ds2.load_data("fit")
    assert len(ds2) == 32


def test_image_vit_end_to_end_training(tmp_path, monkeypatch):
    """ViT (tiny image preset shape) learns the synthetic class structure."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = {
        "project": "img-test",
        "model": {
            "name": "vit",
            "task_type": "cls",
            "input_kind": "image",
            "image_size": 32,
            "patch_size": 8,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "num_labels": 10,
            "num_channels": 3,
            "pos_encoding_type": "learned",
        },
        "train": {"batch_size": 32, "ep": 8, "save": False},
        "loss": {"name": "ce"},
        "opt": {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"},
        "data": {"num_samples": 512, "num_test_samples": 64},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    exp = Experiment(cfg, seed=0)
    metrics = exp.fit()
    assert "val_acc" in metrics
    # synthetic classes are highly separable: must beat chance (0.1) solidly
    assert metrics["val_acc"] > 0.4
    test_metrics = exp.test()
    assert "test_acc" in test_metrics


def test_image_preset_s16_shapes():
    from vit_tpu.models.builder import get_vit_config

    cfg = {
        "model": {"name": "vit-s16", "task_type": "cls", "image_size": 224,
                  "num_labels": 1000, "input_kind": "image"},
        "data": {},
    }
    vc = get_vit_config(cfg)
    assert vc.hidden_size == 384 and vc.patch_size == 16
    assert vc.num_patches == 196 and vc.seq_len == 197
    assert vc.num_channels == 3


def _patch_pca_artifact(tmp_path, patch=8, n=128):
    from vit_tpu.prepca.pipeline import compute_patch_pca_images

    d = make_dummy_images(n=n, image_size=32, num_classes=10, seed=0)
    stats = compute_patch_pca_images(d["images"], patch_size=patch)
    path = str(tmp_path / f"pca_patch_img_{patch}.npz")
    np.savez(path, V=stats["components"], mean=stats["mean"],
             explained_variance_ratio=stats["explained_variance_ratio"],
             patch_size=stats["patch_size"])
    return path, stats


def test_compute_patch_pca_images_orthonormal(tmp_path):
    _, stats = _patch_pca_artifact(tmp_path, patch=4)
    V = stats["components"]
    assert V.shape == (4 * 4 * 3, 4 * 4 * 3)
    np.testing.assert_allclose(V.T @ V, np.eye(V.shape[1]), atol=1e-4)
    evr = stats["explained_variance_ratio"]
    assert evr[0] >= evr[-1] and abs(float(evr.sum()) - 1.0) < 1e-4


def test_patch_pca_projector_matches_numpy(tmp_path):
    """The prefilled projector reproduces (patch - mean) @ V_r exactly."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.preprocessor import PatchPCAProjector

    path, stats = _patch_pca_artifact(tmp_path, patch=8)
    V, mean = stats["components"][:, :16], stats["mean"]
    mod = PatchPCAProjector(patch_size=8, num_channels=3, basis=V, mean=mean)
    x = make_dummy_images(n=4, image_size=32, seed=1)["images"].astype(np.float32) / 255.0
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    p = x.reshape(4, 4, 8, 4, 8, 3).transpose(0, 1, 3, 2, 4, 5).reshape(4, 16, -1)
    ref = (p - mean) @ V
    np.testing.assert_allclose(out, ref, atol=1e-4)
    assert out.shape == (4, 16, 16)


def test_image_pca_vit_end_to_end(tmp_path, monkeypatch):
    """BASELINE config 2 shape: image ViT + patch-PCA preprocessor trains,
    and the freeze schedule holds the preprocessor for the first epochs."""
    import jax

    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    pca_path, _ = _patch_pca_artifact(tmp_path, patch=8)
    cfg = {
        "project": "img-pca-test",
        "model": {
            "name": "vit",
            "task_type": "cls",
            "input_kind": "image",
            "image_size": 32,
            "patch_size": 8,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "num_labels": 10,
            "num_channels": 3,
            "pos_encoding_type": "learned",
        },
        "train": {"batch_size": 32, "ep": 4, "save": False},
        "loss": {"name": "ce"},
        "opt": {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"},
        "warmup": {"preprocessor": "pca", "cov_path": pca_path, "r": 24,
                   "freeze_epochs": 2},
        "data": {"num_samples": 256, "num_test_samples": 64},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    exp = Experiment(cfg, seed=0)
    assert exp.bundle.has_preprocessor
    assert exp.bundle.model_name.startswith("PCAp24_fz2_ViT")
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"]) and metrics["val_acc"] > 0.2
    # frozen for epochs < 2, trainable after
    assert exp._frozen_flag(0) == 1.0 and exp._frozen_flag(1) == 1.0
    assert exp._frozen_flag(2) == 0.0
    # preprocessor kernel started at the PCA basis and then MOVED once the
    # freeze released at epoch 2 (a permanently-frozen kernel would still
    # equal the basis columns)
    kernel = np.asarray(
        jax.device_get(exp.state.params["preprocessor"]["kernel"])
    )
    assert kernel.shape == (8 * 8 * 3, 24)
    from vit_tpu.utils import load_patch_pca_stats

    basis = load_patch_pca_stats(pca_path)["components"][:, :24]
    assert not np.allclose(kernel, basis, atol=1e-7)


def test_image_pca_basis_dim_mismatch(tmp_path):
    from vit_tpu.models.builder import get_model
    import pytest as _pytest

    pca_path, _ = _patch_pca_artifact(tmp_path, patch=4)  # dim 48
    cfg = {
        "model": {"name": "vit", "task_type": "cls", "input_kind": "image",
                  "image_size": 32, "patch_size": 8, "hidden_size": 32,
                  "num_hidden_layers": 1, "num_attention_heads": 2,
                  "num_labels": 10, "num_channels": 3},
        "warmup": {"preprocessor": "pca", "cov_path": pca_path},
        "data": {},
    }
    with _pytest.raises(ValueError, match="patch dim"):
        get_model(cfg)


def test_image_fused_val_single_shard(tmp_path, monkeypatch):
    """Single-data-shard mesh takes the fused-val dispatch path; ImageDataset
    must expose the SpecDataset model_input interface (caught live by the
    TPU CLI drive — CPU tests run 8 shards and short-circuited the gate)."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = {
        "project": "img-fused-val",
        "model": {
            "name": "vit", "task_type": "cls", "input_kind": "image",
            "image_size": 32, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_labels": 10, "num_channels": 3, "pos_encoding_type": "learned",
        },
        "train": {"batch_size": 32, "ep": 2, "save": False},
        "loss": {"name": "ce"},
        "opt": {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"},
        "data": {"num_samples": 128, "num_test_samples": 64},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    exp = Experiment(cfg, seed=0, num_devices=1)
    assert exp.mesh.shape.get("data") == 1
    metrics = exp.fit()
    assert "val_acc" in metrics and np.isfinite(metrics["val_loss"])
