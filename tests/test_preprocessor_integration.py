"""Integration: covariance stats -> warmup preprocessor -> training with freeze."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.builder import get_model
from vit_tpu.prepca.stats import compute_covariance_stats
from vit_tpu.train.loop import Experiment
from vit_tpu.utils import clear_cov_cache


@pytest.fixture()
def cov_path(tiny_config, tmp_path):
    """Covariance stats over the synthetic training flux (512-dim)."""
    clear_cov_cache()
    from vit_tpu.data.hdf5 import load_spectra

    flux = load_spectra(tiny_config["data"]["file_path"], 96)["flux"]
    path = str(tmp_path / "cov.npz")
    compute_covariance_stats(flux, save_path=path)
    return path


def _warm_config(tiny_config, cov_path, **warmup):
    import copy

    # deep copy: the builder mutates model.image_size (reference contract)
    cfg = copy.deepcopy(tiny_config)
    cfg["train"] = dict(cfg["train"], ep=2, batch_size=16)
    cfg["opt"] = {"type": "AdamW", "lr": 3e-3, "lr_sch": "none"}
    cfg["warmup"] = {"cov_path": cov_path, **warmup}
    return cfg


def test_pca_preprocessor_build_adjusts_image_size(tiny_config, cov_path):
    cfg = _warm_config(tiny_config, cov_path, preprocessor="pca", r=64)
    bundle = get_model(cfg)
    assert bundle.has_preprocessor
    assert cfg["model"]["image_size"] == 64  # auto-adjusted to r
    assert bundle.model_name.startswith("PCA64_fz0_ViT")
    # forward works on the ORIGINAL input dim (512): preproc projects 512->64
    x = jnp.ones((2, 512))
    params = bundle.module.init(jax.random.PRNGKey(0), x)["params"]
    logits = bundle.module.apply({"params": params}, x)
    assert logits.shape == (2, 1)
    assert "preprocessor" in params


def test_zca_preprocessor_full_rank(tiny_config, cov_path):
    cfg = _warm_config(tiny_config, cov_path, preprocessor="zca", eps=1e-5,
                       shrinkage=0.1, freeze_epochs=-1)
    bundle = get_model(cfg)
    assert cfg["model"]["image_size"] == 512  # full-rank ZCA keeps dim
    assert bundle.model_name.startswith("ZCA_fzperm_s1_ViT")
    assert bundle.freeze_epochs == -1


def test_attention_preprocessor(tiny_config, cov_path):
    cfg = _warm_config(tiny_config, cov_path, preprocessor="attention", r=32)
    bundle = get_model(cfg)
    assert cfg["model"]["image_size"] == 32
    x = jnp.ones((2, 512))
    params = bundle.module.init(jax.random.PRNGKey(0), x)["params"]
    logits = bundle.module.apply({"params": params}, x)
    assert logits.shape == (2, 1)
    assert "q_lin" in params["preprocessor"]


def test_missing_cov_path_raises(tiny_config):
    cfg = dict(tiny_config)
    cfg["warmup"] = {"preprocessor": "pca", "r": 16}
    with pytest.raises(ValueError, match="cov_path"):
        get_model(cfg)


def test_eigvec_dim_mismatch_raises(tiny_config, cov_path):
    cfg = _warm_config(tiny_config, cov_path, preprocessor="pca", r=16)
    cfg["model"] = dict(cfg["model"], image_size=4096)  # != 512 eigvec dim
    with pytest.raises(ValueError, match="Mismatch"):
        get_model(cfg)


def test_freeze_schedule_holds_then_releases(tiny_config, cov_path, monkeypatch, tmp_path):
    """freeze_epochs=1: preprocessor unchanged during epoch 0, trains after."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _warm_config(tiny_config, cov_path, preprocessor="pca", r=32,
                       freeze_epochs=1)
    cfg["train"]["ep"] = 1
    exp = Experiment(cfg, seed=0)
    exp.datamodule.setup("fit")
    exp.fit()
    frozen_kernel = np.asarray(exp.state.params["preprocessor"]["kernel"])
    # epoch 0 was frozen: kernel still equals the prefilled PCA matrix
    from vit_tpu.models.preprocessor import compute_pca_matrix
    from vit_tpu.utils import load_cov_stats

    P = compute_pca_matrix(load_cov_stats(cov_path)["eigvecs"], r=32)
    np.testing.assert_allclose(frozen_kernel, P.T, rtol=1e-6)

    # second epoch (freeze released) must move the kernel
    cfg2 = _warm_config(tiny_config, cov_path, preprocessor="pca", r=32,
                        freeze_epochs=1)
    cfg2["train"]["ep"] = 2
    exp2 = Experiment(cfg2, seed=0)
    exp2.fit()
    moved_kernel = np.asarray(exp2.state.params["preprocessor"]["kernel"])
    assert not np.allclose(moved_kernel, P.T, rtol=1e-6)


def test_cls_preprocessor_test_only_entry(tiny_config, cov_path, monkeypatch, tmp_path):
    """Eval-only entry (scripts/test.py path) for cls + preprocessor: the
    raw input dim must come from the loaded test split, not the adjusted
    model.image_size."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _warm_config(tiny_config, cov_path, preprocessor="pca", r=32)
    cfg["model"] = dict(cfg["model"], task_type="cls", num_labels=2)
    cfg["train"]["ep"] = 1
    cfg["train"]["save"] = True
    exp = Experiment(cfg, seed=0)
    exp.fit()

    cfg2 = _warm_config(tiny_config, cov_path, preprocessor="pca", r=32)
    cfg2["model"] = dict(cfg2["model"], task_type="cls", num_labels=2)
    exp2 = Experiment(cfg2, seed=0)
    m = exp2.test(ckpt="last")
    assert np.isfinite(m["test_acc"])


def test_permanent_freeze(tiny_config, cov_path, monkeypatch, tmp_path):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _warm_config(tiny_config, cov_path, preprocessor="zca",
                       freeze_epochs=-1, shrinkage=0.1)
    cfg["train"]["ep"] = 2
    exp = Experiment(cfg, seed=0)
    exp.fit()
    from vit_tpu.models.preprocessor import compute_zca_matrix
    from vit_tpu.utils import load_cov_stats

    stats = load_cov_stats(cov_path)
    P = compute_zca_matrix(stats["eigvecs"], stats["eigvals"], eps=1e-5, shrinkage=0.1)
    np.testing.assert_allclose(
        np.asarray(exp.state.params["preprocessor"]["kernel"]), P.T, rtol=1e-5
    )
