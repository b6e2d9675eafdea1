"""Preemption-safe training (vit_tpu/train/preempt.py, train.handle_preemption).

Rebuild-only production feature: preemptible TPU slices get SIGTERM ahead
of eviction; the first signal stops training cleanly at the next epoch
boundary with `last` checkpointed, so `--ckpt last` resumes exactly. The
reference's Lightning trainer has no analogue (dies mid-step).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from vit_tpu.train.preempt import PreemptionGuard


def test_guard_latches_and_restores_handler():
    guard = PreemptionGuard(enabled=True, signals=(signal.SIGUSR1,))
    prev = signal.getsignal(signal.SIGUSR1)
    guard.install()
    assert not guard.triggered
    os.kill(os.getpid(), signal.SIGUSR1)
    assert guard.triggered
    # One-shot: the original handler is back after the first signal.
    assert signal.getsignal(signal.SIGUSR1) == prev
    guard.uninstall()


def test_guard_disabled_is_inert():
    guard = PreemptionGuard(enabled=False, signals=(signal.SIGUSR1,))
    prev = signal.getsignal(signal.SIGUSR1)
    guard.install()
    assert signal.getsignal(signal.SIGUSR1) == prev
    guard.uninstall()


def test_sigterm_stops_at_epoch_boundary_and_resumes(dummy_h5, tmp_path):
    """Integration: SIGTERM mid-run -> exit 0, resumable `last` checkpoint."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    env.pop("XLA_FLAGS", None)  # single virtual CPU device is enough
    ckpt_dir = str(tmp_path / "ckpt")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "preempt_worker.py"), dummy_h5, ckpt_dir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # Wait for the run to get past its first epochs, then preempt it.
    lines = []
    deadline = time.time() + 420
    signalled = False
    epochs_seen = 0
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if " epoch " in line and "train_loss=" in line:
            epochs_seen += 1
            if epochs_seen == 2 and not signalled:
                proc.send_signal(signal.SIGTERM)
                signalled = True
        if "WORKER_DONE" in line:
            break
    out_rest = proc.stdout.read() or ""
    proc.wait(timeout=120)
    out = "".join(lines) + out_rest
    assert signalled, f"never saw two epoch lines:\n{out}"
    assert proc.returncode == 0, f"worker died uncleanly ({proc.returncode}):\n{out}"
    assert "preemption stop at epoch" in out, out
    assert "WORKER_DONE" in out, out
    # The stop happened long before the configured 500 epochs.
    stop_step = int(out.split("WORKER_DONE step=")[1].split()[0])
    steps_per_epoch = 6  # 96 samples / batch 16
    assert stop_step < 400 * steps_per_epoch

    # `last` is a complete checkpoint: resume continues from the saved step.
    os.environ["CKPT_DIR"] = ckpt_dir
    try:
        from vit_tpu.train.loop import Experiment

        stopped_epoch = stop_step // steps_per_epoch
        cfg = {
            "project": "vit-tpu-test",
            "model": {
                "name": "vit", "task_type": "reg", "image_size": 512,
                "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
            },
            "train": {"batch_size": 16, "ep": stopped_epoch + 2, "save": False},
            "loss": {"name": "mae"},
            "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
            "data": {"file_path": dummy_h5, "val_path": dummy_h5,
                     "num_samples": 96, "param": "log_g",
                     "label_norm": "minmax"},
            "noise": {"noise_level": 0},
            "viz": {"enable": False},
        }
        exp = Experiment(cfg, ckpt_path="last", seed=0)
        exp.fit()
        assert int(exp.state.step) == (stopped_epoch + 2) * steps_per_epoch
    finally:
        os.environ.pop("CKPT_DIR", None)
