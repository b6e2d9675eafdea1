"""Preemption-safe training: SIGTERM → clean epoch-boundary stop.

TPU-production concern with no reference analogue (the reference's
Lightning trainer dies mid-step on SIGTERM, `/root/reference/src/vit.py`):
preemptible/spot TPU slices receive SIGTERM ahead of eviction. The guard
turns the FIRST signal into a flag that ``Experiment.fit`` checks at every
checkpoint boundary (epoch, or multi-epoch dispatch block), so the run
finishes the in-flight dispatch, checkpoints ``last`` through the normal
path, and returns cleanly — ``--ckpt last`` resumes it exactly. On the
first signal the previous handler is restored, so a SECOND signal
terminates the process the ordinary way (force-kill still works).

Enabled by default (``train.handle_preemption: false`` disables). The
handler is only installed on the main thread (Python restricts
``signal.signal`` to it). Both ``Experiment.fit`` and the vmapped sweep
engine (`opt/parallel_sweep.py::_VmapSweepEngine.run`) install a guard:
a preempted sweep stops at the next epoch boundary and still writes
``summary.yaml``/``best_config.yaml`` from the completed epochs.
"""

from __future__ import annotations

import signal
import threading
from typing import Dict, Iterable

__all__ = ["PreemptionGuard"]


class PreemptionGuard:
    """Latches the first SIGTERM; training loops poll ``triggered``."""

    def __init__(
        self,
        enabled: bool = True,
        signals: Iterable[int] = (signal.SIGTERM,),
    ) -> None:
        self.enabled = enabled
        self.signals = tuple(signals)
        self.triggered = False
        self._prev: Dict[int, object] = {}

    def install(self) -> "PreemptionGuard":
        if (
            not self.enabled
            or threading.current_thread() is not threading.main_thread()
        ):
            return self
        for sig in self.signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except (ValueError, OSError):  # exotic runtimes; stay inert
                pass
        return self

    def _handle(self, signum, frame) -> None:
        self.triggered = True
        print(
            f"[preempt] signal {signum} received — stopping at the next "
            "epoch boundary (send again to terminate immediately)",
            flush=True,
        )
        # One-shot: hand the signal back so a repeat delivers default/prior
        # behavior instead of being swallowed by a hung run.
        prev = self._prev.pop(signum, signal.SIG_DFL)
        try:
            signal.signal(signum, prev)
        except (ValueError, OSError):
            pass

    def uninstall(self) -> None:
        for sig, prev in list(self._prev.items()):
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()
