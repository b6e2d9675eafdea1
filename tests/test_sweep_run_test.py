"""Sweep --run-test: per-replica test metrics reported in results messages."""

import yaml

from vit_tpu.opt.parallel_sweep import ParallelSweepRunner


def test_sweep_run_test_reports_test_metric(tiny_config, tmp_path):
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    path = str(tmp_path / "base.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        path, lr_values=[1e-3, 1e-4], results_dir=str(tmp_path / "runs"),
        seed=0, skip_test=False,
    )
    best = runner.run()
    assert best is not None
    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    for r in summary["results"]:
        assert r["message"] is not None and r["message"].startswith("test_mae=")
