"""Vmapped parallel LR sweep tests (8-device CPU mesh)."""

import os

import pytest
import yaml

from vit_tpu.opt.parallel_sweep import ParallelSweepRunner, SweepConfig


@pytest.fixture()
def sweep_base_config(tiny_config, tmp_path):
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16)
    path = tmp_path / "base.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def test_grid_construction(sweep_base_config):
    runner = ParallelSweepRunner(
        sweep_base_config,
        lr_values=[1e-4, 1e-3],
        schedulers=["plateau", "cosine", "none"],
        plateau_factors=[0.8],
        plateau_patience=[10],
    )
    # 2 lrs x (1 plateau combo + cosine + none) = 6
    assert len(runner.sweep_configs) == 6
    kinds = {(c.lr, c.scheduler) for c in runner.sweep_configs}
    assert (1e-4, "plateau") in kinds and (1e-3, None) in kinds
    plat = [c for c in runner.sweep_configs if c.scheduler == "plateau"][0]
    assert plat.factor == 0.8 and plat.patience == 10
    cos = [c for c in runner.sweep_configs if c.scheduler == "cosine"][0]
    assert cos.T_max == 2  # from train.ep


def test_replica_device_selection():
    """The flagship launch.sh lr grids must actually use the chips: 7 LRs on
    8 cores -> 7 devices (one replica each), never gcd(7,8)=1."""
    from vit_tpu.opt.parallel_sweep import _replica_devices

    assert _replica_devices(7, 8) == 7   # stage 1 grid
    assert _replica_devices(3, 8) == 3   # stage 2 grid
    assert _replica_devices(8, 8) == 8
    assert _replica_devices(12, 8) == 6  # largest divisor that fits
    assert _replica_devices(1, 8) == 1
    assert _replica_devices(5, 4) == 1   # prime > devices: no even split


def test_opt_config_serialization():
    c = SweepConfig(0, 1e-3, "plateau", factor=0.5, patience=3)
    assert c.to_opt_config() == {"lr": 1e-3, "lr_sch": "plateau", "factor": 0.5, "patience": 3}
    c2 = SweepConfig(1, 1e-4, None)
    assert c2.to_opt_config() == {"lr": 1e-4}
    assert "scheduler" not in c2.to_dict()


def test_sweep_epoch_scales_warmup():
    """Warmup parity with the real training step: trials sweep the SAME
    LR curve Experiment will run — 0.1-start linear ramp, main scheduler
    clock starting after warmup (train/optim.py schedule_scale)."""
    import math

    from vit_tpu.opt.parallel_sweep import _cosine_scale, sweep_epoch_scales

    configs = [
        SweepConfig(0, 1e-3, None),
        SweepConfig(1, 1e-3, "cosine", T_max=10, eta_min=0.0),
        SweepConfig(2, 1e-3, "plateau", factor=0.5, patience=1),
    ]
    # epoch 0 with 4 warmup epochs: every replica at 0.1x
    s0 = sweep_epoch_scales(configs, 0, 4, {2: 1.0}, 10)
    assert s0 == pytest.approx([0.1, 0.1, 0.1])
    # mid-warmup: linear ramp 0.1 + 0.9 * e/warm
    s2 = sweep_epoch_scales(configs, 2, 4, {2: 1.0}, 10)
    assert s2 == pytest.approx([0.55, 0.55, 0.55])
    # after warmup: none=1, cosine clock starts at 0 (epoch - warm)
    s4 = sweep_epoch_scales(configs, 4, 4, {2: 1.0}, 10)
    assert s4[0] == pytest.approx(1.0)
    assert s4[1] == pytest.approx(_cosine_scale(0, 10, 0.0)) == pytest.approx(1.0)
    s6 = sweep_epoch_scales(configs, 6, 4, {2: 1.0}, 10)
    assert s6[1] == pytest.approx(0.5 * (1 + math.cos(math.pi * 2 / 10)))
    # plateau scale composes multiplicatively after warmup
    s6p = sweep_epoch_scales(configs, 6, 4, {2: 0.25}, 10)
    assert s6p[2] == pytest.approx(0.25)
    # plateau scale also applies DURING warmup (Experiment multiplies
    # plateau_scale outside the schedule)
    s1p = sweep_epoch_scales(configs, 0, 4, {2: 0.5}, 10)
    assert s1p[2] == pytest.approx(0.05)
    # no warmup: epoch 0 is full scale
    assert sweep_epoch_scales(configs, 0, 0, {2: 1.0}, 10)[0] == pytest.approx(1.0)


def test_engine_resolves_warmup_from_config(sweep_base_config, tmp_path, monkeypatch):
    """A warmup-bearing config sweeps WITH warmup: the engine passes the
    config's resolved warmup_epochs into the per-epoch LR scales."""
    import vit_tpu.opt.parallel_sweep as ps

    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["warmup"] = {"epochs": 1}
    path = tmp_path / "warm.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    seen = []
    real = ps.sweep_epoch_scales

    def spy(configs, epoch, warmup_epochs, plateau_scales, max_epochs):
        seen.append((epoch, warmup_epochs))
        return real(configs, epoch, warmup_epochs, plateau_scales, max_epochs)

    monkeypatch.setattr(ps, "sweep_epoch_scales", spy)
    runner = ParallelSweepRunner(
        str(path), lr_values=[1e-3, 1e-2], results_dir=str(tmp_path / "runs"),
        seed=0,
    )
    best = runner.run()
    assert best is not None
    assert seen and all(w == 1 for _, w in seen)
    assert {e for e, _ in seen} == {0, 1}  # both epochs scheduled


def test_image_config_sweep_end_to_end(tmp_path):
    """The engine sweeps anything Experiment accepts — an image config must
    complete `launch.sh lr` (reference engine is datamodule-agnostic,
    `/root/reference/src/opt/parallel_sweep.py:150-164`)."""
    cfg = {
        "project": "vit-tpu-test",
        "model": {
            "name": "vit", "task_type": "cls", "input_kind": "image",
            "image_size": 16, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "num_labels": 4, "num_channels": 3,
            "pos_encoding_type": "learned",
        },
        "train": {"batch_size": 16, "ep": 2, "save": False},
        "loss": {"name": "ce"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"num_samples": 64},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }
    path = tmp_path / "img.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        str(path), lr_values=[1e-3, 1e-2], metric_name="val_acc",
        metric_goal="maximize", results_dir=str(tmp_path / "runs"), seed=0,
    )
    best = runner.run()
    assert best is not None and best.metric is not None
    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert len(summary["results"]) == 2
    assert all(r["status"] == "ok" for r in summary["results"])


def test_dry_run_no_artifacts(sweep_base_config, tmp_path):
    runner = ParallelSweepRunner(
        sweep_base_config, lr_values=[1e-3], results_dir=str(tmp_path / "runs")
    )
    assert runner.run(dry_run=True) is None
    assert not os.path.exists(runner.summary_path)


def test_vmapped_sweep_end_to_end(sweep_base_config, tmp_path):
    """7 lr values + mixed schedulers run in ONE vmapped launch."""
    runner = ParallelSweepRunner(
        sweep_base_config,
        lr_values=[1e-5, 1e-4, 1e-3, 1e-2],
        schedulers=["none", "plateau"],
        plateau_factors=[0.8],
        plateau_patience=[0],
        results_dir=str(tmp_path / "runs"),
        seed=0,
    )
    best = runner.run()
    assert best is not None and best.metric is not None

    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert summary["num_configs"] == 8
    assert len(summary["results"]) == 8
    # launch.sh contract: best.config.lr readable
    assert "lr" in summary["best"]["config"]
    metrics = [r["metric"] for r in summary["results"] if r["status"] == "ok"]
    assert len(metrics) >= 6  # most replicas finite
    # best is the min metric among ok results
    assert summary["best"]["metric"] == pytest.approx(min(metrics))
    # different lrs actually produce different outcomes (replicas independent)
    assert len({round(m, 8) for m in metrics}) > 1

    with open(runner.best_config_path) as f:
        best_cfg = yaml.safe_load(f)
    assert best_cfg["opt"]["lr"] == summary["best"]["config"]["lr"]
    assert best_cfg["_meta"]["generator"] == "vit_tpu.opt.parallel_sweep"


def test_sweep_without_val_path_uses_fallback(sweep_base_config, tmp_path):
    """Reference parity: data.val_path falls back to file_path
    (`dataloader/base.py:76`), so a sweep without an explicit val split
    still ranks replicas by val metrics computed on the train file's
    fixed-seed noisy copy."""
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["data"]["val_path"] = None
    cfg["train"]["ep"] = 1
    path = str(tmp_path / "noval.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(path, lr_values=[1e-3], results_dir=str(tmp_path / "r"))
    best = runner.run()
    assert best is not None and best.metric is not None
    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert summary["results"][0]["status"] == "ok"


def test_diverged_replica_isolated(sweep_base_config, tmp_path):
    """A replica with an absurd LR diverges to NaN mid-sweep; the grid must
    still finish, write a full summary.yaml, and mark only that replica
    status='error' (reference parallel_sweep.py:193-209 isolation).
    grad_clip is disabled so the divergence is guaranteed (with the default
    0.5 clip even lr=1e2 stays finite and the path went untested)."""
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["train"]["grad_clip"] = 0.0
    noclip = str(tmp_path / "noclip.yaml")
    with open(noclip, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        noclip,
        lr_values=[1e-3, 1e6],
        schedulers=["none"],
        results_dir=str(tmp_path / "runs"),
        seed=0,
    )
    best = runner.run()
    assert best is not None and best.config.lr == 1e-3

    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert len(summary["results"]) == 2
    by_lr = {r["config"]["lr"]: r for r in summary["results"]}
    assert by_lr[1e-3]["status"] == "ok"
    bad = by_lr[1e6]
    # deterministic seed + no clip: lr=1e6 MUST diverge — unconditional,
    # otherwise the isolation machinery silently goes untested
    assert bad["status"] == "error"
    assert "non-finite" in (bad["message"] or "")
    # per-replica durations are individually stamped, not one shared wall
    assert all(r["duration_sec"] > 0 for r in summary["results"])


def test_early_stop_masks_replicas(sweep_base_config, tmp_path, monkeypatch):
    """Once every replica early-stops, remaining epochs are skipped and the
    stop is recorded in the message."""
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["train"]["ep"] = 30  # would be slow if the early-stop mask failed

    import vit_tpu.opt.parallel_sweep as ps

    orig_engine = ps._VmapSweepEngine.run

    def patched(self):
        import vit_tpu.train.optim as o

        orig_init = o.EarlyStopping.__init__

        def tiny_patience(es, patience=100, mode="min", divergence_threshold=None):
            orig_init(es, patience=1, mode=mode,
                      divergence_threshold=divergence_threshold)

        o.EarlyStopping.__init__ = tiny_patience
        try:
            return orig_engine(self)
        finally:
            o.EarlyStopping.__init__ = orig_init

    monkeypatch.setattr(ps._VmapSweepEngine, "run", patched)

    import yaml as _yaml
    path = str(tmp_path / "es.yaml")
    with open(path, "w") as f:
        _yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        path, lr_values=[1e-3], schedulers=["none"],
        results_dir=str(tmp_path / "runs"), seed=0,
    )
    best = runner.run()
    assert best is not None
    assert "early-stopped" in (best.message or "")


def test_sweep_substitutes_xla_for_ring(sweep_base_config, tmp_path, capsys):
    """attn_impl: ring shard_maps over the mesh the replicas vmap across —
    the engine sweeps with the numerically identical xla kernel instead."""
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["attn_impl"] = "ring"
    path = tmp_path / "ring.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        str(path), lr_values=[1e-3], results_dir=str(tmp_path / "runs"), seed=0
    )
    best = runner.run()
    assert best is not None and best.metric is not None
    assert "ring -> xla" in capsys.readouterr().out


def test_per_replica_shuffles(sweep_base_config, tmp_path, monkeypatch):
    """Each replica shuffles with its OWN seed+idx stream (reference
    parallel_sweep.py:155 `seed_everything(seed+idx)`): two replicas at
    the SAME lr but different idx must gather different batch orders,
    and the sweep must stay reproducible run-to-run."""
    import numpy as np

    import vit_tpu.data.pipeline as pipeline

    seen = []
    orig = pipeline.epoch_permutation

    def spy(n, batch_size, steps, seed, epoch):
        out = orig(n, batch_size, steps, seed, epoch)
        seen.append((seed, epoch, out.copy()))
        return out

    monkeypatch.setattr(pipeline, "epoch_permutation", spy)

    def run_once(results_dir):
        # same lr twice -> idx 0 and idx 1 isolate the data-order stream
        runner = ParallelSweepRunner(
            sweep_base_config,
            lr_values=[1e-3, 1e-3],
            schedulers=["none"],
            results_dir=results_dir,
            seed=0,
        )
        runner.run()
        with open(runner.summary_path) as f:
            return yaml.safe_load(f)

    summary = run_once(str(tmp_path / "a"))

    # engine asked for one permutation per (replica, epoch), seeded seed+idx
    by_epoch = {}
    for seed, epoch, perm in seen:
        by_epoch.setdefault(epoch, []).append((seed, perm))
    assert set(by_epoch) == {0, 1}  # ep=2
    for epoch, entries in by_epoch.items():
        seeds = [s for s, _ in entries]
        assert seeds == [0, 1], f"epoch {epoch}: expected per-idx seeds, got {seeds}"
        p0, p1 = entries[0][1], entries[1][1]
        assert not np.array_equal(p0, p1), "replicas saw the same batch order"

    # same-lr replicas actually train differently (order + init both per-idx)
    metrics = [r["metric"] for r in summary["results"] if r["status"] == "ok"]
    assert len(metrics) == 2 and metrics[0] != metrics[1]

    # and the whole sweep reproduces bit-for-bit across runs
    summary2 = run_once(str(tmp_path / "b"))
    assert [r["metric"] for r in summary2["results"]] == [
        r["metric"] for r in summary["results"]
    ]


def test_sweep_preemption_stops_at_epoch_boundary(
    sweep_base_config, tmp_path, monkeypatch, capsys
):
    """A SIGTERM mid-sweep (here: a pre-triggered guard) stops the grid at
    the next epoch boundary with summary/best artifacts written from the
    completed epochs — the same contract as Experiment.fit's guard."""
    import vit_tpu.opt.parallel_sweep as ps
    from vit_tpu.train.preempt import PreemptionGuard

    orig = ps._VmapSweepEngine.run

    def patched(self):
        guard = PreemptionGuard(enabled=False)  # no real handler in tests
        guard.triggered = True  # as if SIGTERM landed during epoch 0
        self.preempt_guard = guard
        return orig(self)

    monkeypatch.setattr(ps._VmapSweepEngine, "run", patched)
    runner = ParallelSweepRunner(
        sweep_base_config,  # ep=2: without preemption replicas run 2 epochs
        lr_values=[1e-4, 1e-3],
        results_dir=str(tmp_path / "runs"),
        seed=0,
    )
    best = runner.run()
    out = capsys.readouterr().out
    assert "preemption stop at epoch 0" in out
    # Artifacts exist and carry epoch-0 metrics for every replica.
    assert best is not None and best.metric is not None
    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert len(summary["results"]) == 2
    for r in summary["results"]:
        assert r["status"] == "ok"
        assert "preemption stop" in (r["message"] or "")
        assert r["metric"] is not None


def test_sequential_engine_trains_ring_unsubstituted(
    sweep_base_config, tmp_path, capsys, monkeypatch
):
    """--engine sequential: a ring config is swept on the REAL ring path
    (no ring->xla substitution, the in-mesh ring kernel actually runs) and
    emits the same summary.yaml/best_config.yaml artifacts, so the
    two-stage lr flow can tune the dynamics the final run trains."""
    import vit_tpu.ops.ring_attention as ra

    calls = {"n": 0}
    real = ra.ring_attention

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ra, "ring_attention", spy)

    # length 480 -> 15 patches + CLS = 16 tokens: divides sequence_parallel=2
    # (tiny_config's 512 gives 17 tokens, indivisible)
    from vit_tpu.data.synthetic import write_dummy_h5

    h5 = str(tmp_path / "ring.h5")
    write_dummy_h5(h5, n=96, length=480, seed=0)
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["image_size"] = 480
    cfg["model"]["attn_impl"] = "ring"
    cfg["train"]["sequence_parallel"] = 2
    cfg["train"]["ep"] = 1
    cfg["data"].update(file_path=h5, val_path=h5, test_path=h5)
    path = str(tmp_path / "ring.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    runner = ParallelSweepRunner(
        path, lr_values=[1e-3, 1e-4], results_dir=str(tmp_path / "runs"),
        seed=0, engine="sequential",
    )
    best = runner.run()
    out = capsys.readouterr().out
    assert "ring -> xla" not in out, "sequential engine must NOT substitute"
    assert calls["n"] > 0, "ring kernel never ran"
    assert best is not None and best.metric is not None

    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    assert summary["engine"] == "sequential"
    assert len(summary["results"]) == 2
    assert all(r["status"] == "ok" for r in summary["results"])
    with open(runner.best_config_path) as f:
        best_cfg = yaml.safe_load(f)
    # the artifact preserves the ring config (the final run trains ring)
    assert best_cfg["model"]["attn_impl"] == "ring"
    assert best_cfg["opt"]["lr"] == summary["best"]["config"]["lr"]


def test_sequential_engine_isolates_trial_failure(sweep_base_config, tmp_path):
    """One diverging trial (absurd lr, no clip) -> status='error', the
    other trial still wins; matches the vmapped engine's isolation."""
    with open(sweep_base_config) as f:
        cfg = yaml.safe_load(f)
    cfg["train"]["grad_clip"] = 0.0
    cfg["train"]["ep"] = 1
    path = str(tmp_path / "noclip.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    runner = ParallelSweepRunner(
        path, lr_values=[1e-3, 1e6], results_dir=str(tmp_path / "runs"),
        seed=0, engine="sequential",
    )
    best = runner.run()
    assert best is not None and best.config.lr == 1e-3
    with open(runner.summary_path) as f:
        summary = yaml.safe_load(f)
    statuses = {r["config"]["lr"]: r["status"] for r in summary["results"]}
    assert statuses[1e-3] == "ok" and statuses[1e6] == "error"


def test_engine_arg_validated():
    with pytest.raises(ValueError, match="engine"):
        ParallelSweepRunner("/nonexistent.yaml", engine="bogus")
