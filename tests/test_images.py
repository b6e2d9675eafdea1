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
