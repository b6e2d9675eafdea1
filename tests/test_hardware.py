"""Hardware/mesh helpers."""

from vit_tpu.hardware import (
    detect_accelerators,
    get_prefetch_depth,
    get_training_strategy,
    select_accelerator_and_devices,
)
from vit_tpu.parallel.mesh import infer_param_shardings, make_mesh


def test_detect_accelerators_cpu_mesh():
    info = detect_accelerators()
    assert info["backend"] == "cpu"
    assert info["device_count"] == 8  # conftest forces 8 virtual devices


def test_select_devices_cap():
    backend, devs = select_accelerator_and_devices(3)
    assert len(devs) == 3


def test_strategy_rule():
    assert get_training_strategy(1) == "single"
    assert get_training_strategy(8) == "data_parallel"


def test_prefetch_depth_env_override(monkeypatch):
    monkeypatch.setenv("NUM_WORKERS", "4")
    assert get_prefetch_depth() == 4
    monkeypatch.delenv("NUM_WORKERS")
    assert get_prefetch_depth({"train": {"num_workers": 3}}) == 3
    assert get_prefetch_depth() == 2


def test_infer_param_shardings_tp():
    import jax.numpy as jnp

    mesh = make_mesh(num_devices=8, model_parallel=2)
    params = {
        "dense": {"kernel": jnp.ones((64, 128)), "bias": jnp.ones((128,))},
        "small": {"kernel": jnp.ones((4, 3))},
    }
    sh = infer_param_shardings(params, mesh)
    assert "model" in str(sh["dense"]["kernel"].spec)  # column-sharded
    assert sh["dense"]["bias"].spec == ()  # replicated (1-D)
    assert sh["small"]["kernel"].spec == ()  # indivisible -> replicated
