"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4's strategy);
the real-TPU path is exercised by bench.py / the driver instead.
Must run before jax initializes its backends, hence env setup at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
import re as _re

# Normalize (not just append): a stale =2 from a prior debug shell would
# otherwise break every mesh test with obscure device-count errors.
_flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", _flags)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-registers itself and sets
# jax_platforms="axon,cpu", overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture(scope="session")
def dummy_h5(tmp_path_factory):
    """A small synthetic dataset file in the reference HDF5 schema."""
    from vit_tpu.data.synthetic import write_dummy_h5

    path = tmp_path_factory.mktemp("data") / "dataset.h5"
    write_dummy_h5(str(path), n=96, length=512, seed=0)
    return str(path)


@pytest.fixture()
def tiny_config(dummy_h5):
    """A baseline.yaml-shaped config scaled down for fast CPU tests."""
    return {
        "project": "vit-tpu-test",
        "model": {
            "name": "vit",
            "task_type": "reg",
            "image_size": 512,
            "patch_size": 32,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "stride_size": 32,
            "proj_fn": "SW",
        },
        "train": {"batch_size": 16, "ep": 2, "debug": 0, "save": False},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {
            "file_path": dummy_h5,
            "val_path": dummy_h5,
            "test_path": dummy_h5,
            "num_samples": 96,
            "num_test_samples": 32,
            "param": "log_g",
            "label_norm": "minmax",
        },
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
