"""Persistent XLA compilation cache (vit_tpu.hardware.enable_compilation_cache).

Rebuild-only production lever (no reference analogue — torch recompiles
kernels per process): serialized executables persist on disk so re-runs of
an already-compiled (program, shapes) pair skip the 20 s–3 min remote TPU
compile. Measured through the axon tunnel in BASELINE.md (round 4).
"""

import os

import pytest

import vit_tpu.hardware as hw


@pytest.fixture(autouse=True)
def _reset_cache_state(monkeypatch):
    """Each test sees a fresh module-level first-call-wins latch."""
    monkeypatch.setattr(hw, "_CACHE_ENABLED_DIR", None)
    yield


def test_enables_and_creates_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "xla"))
    got = hw.enable_compilation_cache()
    assert got == str(tmp_path / "xla")
    assert os.path.isdir(got)
    import jax

    assert jax.config.jax_compilation_cache_dir == got


def test_config_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "xla"))
    cfg = {"train": {"compilation_cache": False}}
    assert hw.enable_compilation_cache(cfg) is None
    assert not os.path.exists(str(tmp_path / "xla"))


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.setenv("VIT_TPU_NO_CACHE", "1")
    assert hw.enable_compilation_cache() is None


def test_first_call_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "a"))
    first = hw.enable_compilation_cache()
    monkeypatch.setenv("JAX_CACHE_DIR", str(tmp_path / "b"))
    second = hw.enable_compilation_cache()
    assert first == second == str(tmp_path / "a")


def test_default_location_under_xdg(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_CACHE_DIR", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    got = hw.enable_compilation_cache()
    assert got == str(tmp_path / "vit_tpu" / "xla")
    assert os.path.isdir(got)


def test_cache_hits_across_processes(tmp_path, monkeypatch):
    """A second process re-running the same jit program reads the cache
    entries the first one wrote (CPU backend; exercises the real
    serialize/deserialize round trip, not just the config plumbing)."""
    import subprocess
    import sys

    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)\n"
        "from vit_tpu.hardware import enable_compilation_cache\n"
        "assert enable_compilation_cache() is not None\n"
        "import jax.numpy as jnp\n"
        "f = jax.jit(lambda x: (jnp.tanh(x @ x.T)).sum())\n"
        "print(float(f(jnp.ones((64, 64)))))\n"
    )
    env = dict(os.environ, JAX_CACHE_DIR=str(tmp_path / "xla"))
    env.pop("VIT_TPU_NO_CACHE", None)
    out1 = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True
    )
    assert out1.returncode == 0, out1.stderr
    entries = os.listdir(str(tmp_path / "xla"))
    assert entries, "first process wrote no cache entries"
    out2 = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True
    )
    assert out2.returncode == 0, out2.stderr
    # Same numerical result through the deserialized executable.
    assert out1.stdout.strip() == out2.stdout.strip()
