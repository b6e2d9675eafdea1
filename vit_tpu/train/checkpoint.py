"""Checkpointing (orbax) with the reference's monitor/top-k/last semantics.

Reference behavior (`/root/reference/src/vit.py:386-414`, Lightning
``ModelCheckpoint``): save ``top_k=1`` on the monitored metric (``val_acc``
max for cls, ``val_mae`` min for reg) plus ``last``; destination
``$CKPT_DIR`` / ``./checkpoints``; eval resolves ``best | last | <path>``
(`/root/reference/scripts/test.py:21,48`). Full training state (params,
optimizer, step/epoch, plateau scale, RNG) is saved so ``--ckpt`` resumes
exactly (`vit.py:464`).

Layout::

    <ckpt_dir>/<model_name>/
        best        symlink -> .versions/best-<n>   (atomic pointer)
        last        symlink -> .versions/last-<n>
        .versions/  committed orbax pytrees (one dir per save)
        meta.yaml   monitor name/mode, best value/epoch, config snapshot

Crash safety: every save lands in a FRESH ``.versions/<name>-<n>`` dir
(orbax itself commits that dir atomically via tmp-dir + rename), and only
after the write is committed does the ``best``/``last`` symlink flip to it
(``os.replace`` of a symlink — one atomic rename syscall). A SIGTERM, hard
eviction, or exception at ANY point leaves the previous pointer target
intact, so ``--ckpt last`` always resumes from a valid checkpoint — there
is no window where ``last`` names a half-written or missing state (the old
rmtree-then-save scheme had exactly that window). Superseded version dirs
are deleted only after the pointer has moved off them.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import yaml

__all__ = ["CheckpointManager", "default_ckpt_dir"]


def default_ckpt_dir() -> str:
    """``$CKPT_DIR`` env or ``./checkpoints`` (reference `vit.py:14-15`)."""
    return os.environ.get("CKPT_DIR", "./checkpoints")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


class CheckpointManager:
    """best+last checkpoints keyed on a monitored metric."""

    def __init__(
        self,
        root_dir: str,
        model_name: str,
        monitor: str = "mae",
        mode: str = "min",
        enabled: bool = True,
        async_save: bool = False,
    ) -> None:
        self.dir = os.path.abspath(os.path.join(root_dir, model_name))
        self.monitor = monitor
        self.mode = mode
        self.enabled = enabled
        # train.async_ckpt: the host snapshot (jax.device_get) stays
        # synchronous, but the disk write runs on orbax's background thread
        # so training resumes immediately — the save overlaps the next
        # epoch's compute. Artifacts are identical to the sync path; wait()
        # fences before any read-back (test/restore/artifact upload).
        self.async_save = async_save
        self._ckptr = None
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None
        # (pointer path, committed version dir) pairs whose symlink flip is
        # deferred until the async write lands (see _flip_pending).
        self._pending: list = []
        self._counter = 0
        if enabled:
            os.makedirs(self.dir, exist_ok=True)
            self._counter = self._scan_version_counter()
        # Lightning parity: ModelCheckpoint tracks best IN-MEMORY per run.
        # A fresh run with the same model_name must not inherit a previous
        # run's best (which would both skip best-saving and make run() test
        # stale weights); --ckpt resume restores it via load_best_from_meta.

    # -- paths ---------------------------------------------------------
    @property
    def best_path(self) -> str:
        return os.path.join(self.dir, "best")

    @property
    def last_path(self) -> str:
        return os.path.join(self.dir, "last")

    def _meta_path(self) -> str:
        return os.path.join(self.dir, "meta.yaml")

    def _version_root(self) -> str:
        return os.path.join(self.dir, ".versions")

    def _scan_version_counter(self) -> int:
        """Resume the version counter past anything already on disk (a
        crashed run may have committed a version it never flipped to)."""
        vroot = self._version_root()
        n = 0
        if os.path.isdir(vroot):
            for name in os.listdir(vroot):
                tail = name.rsplit("-", 1)[-1]
                if tail.isdigit():
                    n = max(n, int(tail))
        return n

    def load_best_from_meta(self) -> None:
        """Seed the best tracker from a previous run's meta (resume only)."""
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                meta = yaml.safe_load(f) or {}
            self.best_value = meta.get("best_value")
            self.best_epoch = meta.get("best_epoch")

    def _write_meta(
        self, epoch: int, config: Optional[dict], extra: Optional[dict] = None
    ) -> None:
        meta = {
            "monitor": f"val_{self.monitor}",
            "mode": self.mode,
            "best_value": self.best_value,
            "best_epoch": self.best_epoch,
            "last_epoch": epoch,
        }
        if config is not None:
            meta["config"] = config
        if extra:
            meta.update(extra)
        with open(self._meta_path(), "w") as f:
            yaml.safe_dump(meta, f, sort_keys=False)

    def read_meta(self) -> dict:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return yaml.safe_load(f) or {}
        return {}

    # -- save/restore ----------------------------------------------------
    def _get_ckptr(self):
        """One long-lived checkpointer per manager: orbax's StandardCheckpointer
        is async-capable (save() returns before the write lands), and async
        mode needs the background thread to outlive ``_save``."""
        if self._ckptr is None:
            self._ckptr = _checkpointer()
        return self._ckptr

    def wait(self) -> None:
        """Fence: block until every in-flight async save has landed (and
        flip the best/last pointers to the now-committed versions)."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
            self._flip_pending()

    def _flip_pending(self) -> None:
        """Point each pending symlink at its committed version dir.

        Only called after ``wait_until_finished`` — the version dir is
        fully committed by then, so the flip (one ``os.replace`` rename)
        is the sole state transition and is atomic. The superseded target
        is removed only after the pointer has moved off it.
        """
        pending, self._pending = self._pending, []
        for path, new in pending:
            old_target = None
            if os.path.islink(path):
                old_target = os.path.realpath(path)
            elif os.path.lexists(path):
                # Legacy real-dir checkpoint (pre-pointer layout): move it
                # into the version root so the name frees up for the
                # symlink. One-time migration; the new version is already
                # committed at this point.
                old_target = os.path.join(
                    self._version_root(),
                    f"{os.path.basename(path)}-legacy-{self._counter:08d}",
                )
                os.rename(path, old_target)
            tmp = f"{path}.lnk-{self._counter:08d}"
            if os.path.lexists(tmp):
                os.remove(tmp)
            os.symlink(new, tmp)
            os.replace(tmp, path)  # atomic pointer flip
            if old_target and old_target != new and os.path.exists(old_target):
                shutil.rmtree(old_target, ignore_errors=True)

    def _save(self, path: str, state: Any) -> None:
        ckptr = self._get_ckptr()
        # At most one in-flight write; flips deferred from a previous async
        # save happen now that its write has landed.
        ckptr.wait_until_finished()
        self._flip_pending()
        os.makedirs(self._version_root(), exist_ok=True)
        self._counter += 1
        version = os.path.join(
            self._version_root(), f"{os.path.basename(path)}-{self._counter:08d}"
        )
        # jax.device_get snapshots to host numpy — the training loop's
        # subsequent state updates cannot mutate what the writer sees.
        ckptr.save(version, jax.device_get(state))
        self._pending.append((path, version))
        if not self.async_save:
            ckptr.wait_until_finished()
            self._flip_pending()

    def on_epoch_end(
        self,
        state: Any,
        epoch: int,
        metric_value: Optional[float],
        config: Optional[dict] = None,
        extra: Optional[dict] = None,
    ) -> bool:
        """Save ``last`` (+ ``best`` if the monitor improved). Returns
        whether this epoch became the new best."""
        if not self.enabled:
            # Still track best for reporting parity.
            improved = self._improved(metric_value)
            if improved:
                self.best_value, self.best_epoch = metric_value, epoch
            return improved
        self._save(self.last_path, state)
        improved = self._improved(metric_value)
        if improved:
            self.best_value, self.best_epoch = metric_value, epoch
            self._save(self.best_path, state)
        self._write_meta(epoch, config, extra)
        return improved

    def _improved(self, value: Optional[float]) -> bool:
        if value is None:
            return False
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" else value > self.best_value

    def resolve(self, spec: str) -> str:
        """``'best' | 'last' | <path>`` -> checkpoint directory path."""
        if spec == "best":
            return self.best_path
        if spec == "last":
            return self.last_path
        return os.path.abspath(spec)

    @staticmethod
    def restore(path: str, target: Any) -> Any:
        """Restore a checkpoint into the structure of ``target``."""
        path = os.path.abspath(path)
        if not os.path.exists(path):
            raise FileNotFoundError(f"Checkpoint not found: {path}")
        ckptr = _checkpointer()
        return ckptr.restore(path, target=jax.device_get(target))
