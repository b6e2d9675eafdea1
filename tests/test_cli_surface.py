"""Entry-script flag-surface parity with the reference CLIs.

A user switching from the reference must be able to paste their command
lines unchanged: the reference spells the long options ``--config`` and
``--gpu`` (`/root/reference/scripts/run.py:16-19`, `test.py:17-19`); this
rebuild's canonical names (``--file``/``--gpus``) stay as a superset.
"""

import sys


def _parse(mod, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    return mod.parse_args()


def test_run_accepts_reference_long_options(monkeypatch):
    import scripts.run as run

    args = _parse(run, ["--config", "cfg.yaml", "--gpu", "4", "-w", "1"], monkeypatch)
    assert args.file == "cfg.yaml"
    assert args.gpus == 4
    assert args.wandb == 1


def test_run_accepts_rebuild_long_options(monkeypatch):
    import scripts.run as run

    args = _parse(run, ["--file", "cfg.yaml", "--gpus", "2"], monkeypatch)
    assert args.file == "cfg.yaml"
    assert args.gpus == 2


def test_test_accepts_reference_long_options(monkeypatch):
    import scripts.test as test_mod

    args = _parse(
        test_mod, ["--config", "c.yaml", "--gpu", "1", "--ckpt", "last"], monkeypatch
    )
    assert args.file == "c.yaml"
    assert args.gpus == 1
    assert args.ckpt == "last"


def test_run_reference_short_flags(monkeypatch):
    import scripts.run as run

    args = _parse(run, ["-f", "c.yaml", "-g", "8", "-w", "0", "--save"], monkeypatch)
    assert args.file == "c.yaml" and args.gpus == 8 and args.save


def test_launch_predict_mode_dispatches():
    """./launch.sh predict reaches scripts/predict.py (rebuild-only serving
    mode): with --input missing, predict.py's argparse must be the one that
    errors — proving dispatch + flag passthrough."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["bash", "./launch.sh", "predict", "-c", "cfg.yaml"],
        capture_output=True, text=True, cwd=repo, timeout=120,
    )
    assert proc.returncode == 2  # argparse "required: --input"
    assert "--input" in proc.stderr
    assert "MODE=predict" in proc.stdout
