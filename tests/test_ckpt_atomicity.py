"""Checkpoint atomicity: a valid ``last``/``best`` exists at every instant.

The preemption guarantee ("``--ckpt last`` resumes exactly",
vit_tpu/train/preempt.py) requires that a SIGTERM / hard eviction / crash
at ANY point during a save leaves a restorable checkpoint behind. Saves
land in fresh ``.versions/<name>-<n>`` dirs and the ``last``/``best``
names are symlinks flipped atomically only AFTER the write commits — these
tests crash-inject at the worst moments and assert the pointer never dies.
"""

import os

import numpy as np
import pytest

from vit_tpu.train.checkpoint import CheckpointManager


def _state(v: float):
    import jax.numpy as jnp

    return {"w": jnp.full((16, 16), v), "b": jnp.full((4,), v)}


def _restore_w(path, like=0.0):
    return float(
        np.asarray(CheckpointManager.restore(path, _state(like))["w"])[0, 0]
    )


def test_crash_during_save_keeps_previous_last(tmp_path, monkeypatch):
    """Exception mid-write (after the old checkpoint would have been
    deleted under the old rmtree-then-save scheme): ``last`` still resolves
    to the previous epoch's state and restores cleanly."""
    mgr = CheckpointManager(str(tmp_path), "m")
    mgr.on_epoch_end(_state(1.0), epoch=0, metric_value=1.0)
    assert _restore_w(mgr.last_path) == 1.0

    import orbax.checkpoint as ocp

    real_save = ocp.Checkpointer.save

    def exploding_save(self, path, *a, **kw):
        # Simulate dying mid-write: leave a half-written version dir.
        os.makedirs(str(path), exist_ok=True)
        with open(os.path.join(str(path), "garbage"), "w") as f:
            f.write("partial")
        raise RuntimeError("injected crash mid-save")

    monkeypatch.setattr(ocp.Checkpointer, "save", exploding_save)
    monkeypatch.setattr(ocp.AsyncCheckpointer, "save", exploding_save,
                        raising=False)
    with pytest.raises(RuntimeError, match="injected"):
        mgr.on_epoch_end(_state(2.0), epoch=1, metric_value=0.5)

    # the pointer never moved: last and best still restore epoch 0
    assert _restore_w(mgr.last_path) == 1.0
    assert _restore_w(mgr.best_path) == 1.0

    # a fresh manager (the resume path) recovers and can keep saving
    monkeypatch.setattr(ocp.Checkpointer, "save", real_save)
    monkeypatch.setattr(ocp.AsyncCheckpointer, "save", real_save,
                        raising=False)
    mgr2 = CheckpointManager(str(tmp_path), "m")
    mgr2.load_best_from_meta()
    mgr2.on_epoch_end(_state(3.0), epoch=2, metric_value=0.25)
    assert _restore_w(mgr2.last_path) == 3.0


def test_kill_before_flip_keeps_previous_last(tmp_path):
    """Hard-kill simulation: a version dir fully committed but the process
    dies BEFORE the symlink flip (we just never call _flip_pending).
    ``last`` still names the old state; a new manager's counter skips past
    the orphaned version."""
    mgr = CheckpointManager(str(tmp_path), "m", async_save=True)
    mgr.on_epoch_end(_state(1.0), epoch=0, metric_value=1.0)
    mgr.wait()
    assert _restore_w(mgr.last_path) == 1.0

    # async save: write lands on the background thread, flip is deferred
    mgr.on_epoch_end(_state(2.0), epoch=1, metric_value=2.0)  # not best
    mgr._ckptr.wait_until_finished()  # committed...
    # ...and the process dies here: no wait()/flip. Old pointer intact:
    assert _restore_w(mgr.last_path) == 1.0

    # resume: new manager must not collide with the orphaned version dir
    mgr2 = CheckpointManager(str(tmp_path), "m")
    assert mgr2._counter >= 2
    mgr2.on_epoch_end(_state(3.0), epoch=2, metric_value=0.5)
    assert _restore_w(mgr2.last_path) == 3.0
    assert _restore_w(mgr2.best_path) == 3.0


def test_pointer_flip_is_atomic_rename(tmp_path):
    """best/last are symlinks into .versions — the only mutation of the
    public name is os.replace (rename(2)), and superseded versions are
    garbage-collected after the flip."""
    mgr = CheckpointManager(str(tmp_path), "m")
    for epoch in range(3):
        mgr.on_epoch_end(_state(float(epoch)), epoch=epoch,
                         metric_value=-float(epoch))
    assert os.path.islink(mgr.last_path)
    assert os.path.islink(mgr.best_path)
    assert _restore_w(mgr.best_path) == 2.0
    vroot = os.path.join(mgr.dir, ".versions")
    live = {os.path.realpath(mgr.last_path), os.path.realpath(mgr.best_path)}
    on_disk = {os.path.realpath(os.path.join(vroot, d))
               for d in os.listdir(vroot)}
    assert on_disk == live  # no superseded versions left behind


def test_legacy_realdir_checkpoint_migrates(tmp_path):
    """A pre-pointer-layout checkpoint (real dir at last/) is migrated into
    .versions on the first save over it, without losing restorability."""
    import orbax.checkpoint as ocp

    legacy = os.path.join(str(tmp_path), "m", "last")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(legacy, {"w": np.full((16, 16), 7.0), "b": np.full((4,), 7.0)})
    ckptr.wait_until_finished()
    mgr = CheckpointManager(str(tmp_path), "m")
    assert _restore_w(mgr.last_path) == 7.0  # readable before migration
    mgr.on_epoch_end(_state(8.0), epoch=0, metric_value=1.0)
    assert os.path.islink(mgr.last_path)
    assert _restore_w(mgr.last_path) == 8.0
