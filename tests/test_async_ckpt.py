"""Async checkpointing (train.async_ckpt).

Rebuild-only production lever (the reference's Lightning ModelCheckpoint
saves synchronously at epoch end, blocking the trainer): the host snapshot
(jax.device_get) stays synchronous, but the orbax disk write runs on a
background thread and overlaps the next epoch's compute. The artifact
contract is identical to the sync path; every read-back (test, resume,
artifact upload) fences on CheckpointManager.wait().
"""

import os

import numpy as np
import pytest

from vit_tpu.train.checkpoint import CheckpointManager
from vit_tpu.train.loop import Experiment


def _cfg(tiny_config, **train_extra):
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], save=True, **train_extra)
    return cfg


def test_async_fit_artifacts_match_sync(tiny_config, monkeypatch, tmp_path):
    """Same config/seed, async vs sync saving: identical restored params."""

    def run(async_ckpt, sub):
        monkeypatch.setenv("CKPT_DIR", str(tmp_path / sub))
        exp = Experiment(_cfg(tiny_config, async_ckpt=async_ckpt), seed=0)
        m = exp.fit()
        # read back through a FRESH experiment (the real restore path)
        exp2 = Experiment(
            dict(_cfg(tiny_config, async_ckpt=async_ckpt)), seed=1
        )
        t = exp2.test(ckpt="best")
        return m, t, np.asarray(exp2.state.params["regressor"]["kernel"])

    m_a, t_a, k_a = run(True, "async")
    m_s, t_s, k_s = run(False, "sync")
    assert m_a["train_loss"] == pytest.approx(m_s["train_loss"], rel=1e-6)
    assert t_a["test_mae"] == pytest.approx(t_s["test_mae"], rel=1e-6)
    np.testing.assert_array_equal(k_a, k_s)


def test_async_manager_wait_fences(tmp_path):
    """wait() blocks until the background write landed; the dir is then a
    complete, restorable orbax checkpoint."""
    import jax.numpy as jnp

    state = {"w": jnp.arange(1024, dtype=jnp.float32).reshape(32, 32),
             "b": jnp.ones((32,))}
    mgr = CheckpointManager(str(tmp_path), "m", async_save=True)
    mgr.on_epoch_end(state, epoch=0, metric_value=1.0)
    mgr.wait()
    assert os.path.exists(mgr.best_path)
    restored = CheckpointManager.restore(mgr.last_path, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))


def test_async_overwrite_sequence(tmp_path):
    """Back-to-back epoch saves replace best/last without racing the
    background writer (the second _save waits for the first)."""
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path), "m", async_save=True)
    for epoch in range(4):
        state = {"w": jnp.full((16, 16), float(epoch))}
        # metric improves every epoch -> best rewritten every time
        mgr.on_epoch_end(state, epoch=epoch, metric_value=-float(epoch))
    mgr.wait()
    restored = CheckpointManager.restore(
        mgr.best_path, {"w": jnp.zeros((16, 16))}
    )
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full((16, 16), 3.0))
    assert mgr.best_epoch == 3
