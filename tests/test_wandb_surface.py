"""W&B integration coverage WITHOUT wandb installed: a test-double module.

The image has no wandb; the reference's W&B surface (metric key names,
checkpoint artifacts via ``log_model``, sweep run rename, dotted overrides)
is pinned here by injecting a fake ``wandb`` into ``sys.modules`` — CI
coverage instead of trust-me code. Ref: `/root/reference/src/vit.py:443-458`,
`/root/reference/scripts/sweep.py:29-94`.
"""

import sys
import types

import numpy as np
import pytest
import yaml


class _FakeRun:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.logged = []
        self.artifacts = []
        self.name = kwargs.get("name")
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    def log_artifact(self, art, aliases=None):
        self.artifacts.append((art, list(aliases or [])))

    def finish(self):
        self.finished = True


class _FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata
        self.dirs = []

    def add_dir(self, path):
        self.dirs.append(path)


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.runs = []
    mod.config = {}

    def init(**kwargs):
        run = _FakeRun(**kwargs)
        mod.runs.append(run)
        return run

    def agent(sweep_id, function=None, entity=None, project=None, count=None):
        mod.agent_calls = [(sweep_id, entity, project, count)]
        for _ in range(count or 1):
            function()

    mod.init = init
    mod.agent = agent
    mod.Artifact = _FakeArtifact
    mod.Video = lambda p: ("video", p)
    mod.Image = lambda f: ("image", str(type(f)))
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_metric_key_names_and_artifacts(fake_wandb, tiny_config, tmp_path, monkeypatch):
    """use_wandb=1 + save: exact reference key names logged; best/last
    checkpoints uploaded as model artifacts at train end."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=2, batch_size=16, save=True)
    cfg["opt"] = {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"}
    exp = Experiment(cfg, use_wandb=True, seed=0)
    exp.fit()

    run = fake_wandb.runs[-1]
    assert run.kwargs["project"] == cfg["project"]
    assert run.kwargs["name"] == exp.bundle.model_name
    logged_keys = set().union(*(set(m) for m, _ in run.logged))
    # reference key names (vit.py:91,112-123; basemodule.py:184-196)
    for key in ("train_loss", "val_mae", "val_mse", "val_r2", "lr", "num_params(M)",
                "val_bias_median", "val_p90", "val_beta"):
        assert key in logged_keys, key

    aliases = {a for _, al in run.artifacts for a in al}
    assert {"best", "last"} <= aliases
    art = run.artifacts[0][0]
    assert art.type == "model" and art.name == f"model-{exp.bundle.model_name}"
    assert art.dirs and "ckpt" in art.dirs[0]


def test_no_artifacts_without_save(fake_wandb, tiny_config, tmp_path, monkeypatch):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16, save=False)
    exp = Experiment(cfg, use_wandb=True, seed=0)
    exp.fit()
    assert fake_wandb.runs[-1].artifacts == []


def test_sweep_agent_dotted_overrides_and_rename(fake_wandb, tiny_config, tmp_path,
                                                 monkeypatch):
    """scripts/sweep.py train_fn: base config from wandb.config['vit_config'],
    dotted-key deep overrides, run renamed to model.name."""
    base = tmp_path / "base.yaml"
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    with open(base, "w") as f:
        yaml.safe_dump(cfg, f)
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))

    fake_wandb.config = {
        "vit_config": str(base),
        "model.hidden_size": 16,
        "model.num_attention_heads": 2,
        "opt.lr": 5e-4,
        "_wandb": {"ignored": True},
    }
    import importlib

    sweep_mod = importlib.import_module("scripts.sweep")
    sweep_mod.train_fn()

    run = fake_wandb.runs[-1]
    # renamed to the model name reflecting the overridden hidden size
    assert "h16" in run.name
    logged_keys = set().union(*(set(m) for m, _ in run.logged))
    assert "val_mae" in logged_keys and "test_mae" in logged_keys
    assert run.finished  # Experiment.run() calls logger.finish()


def test_sweep_agent_registration(fake_wandb, tiny_config, tmp_path, monkeypatch):
    """--sweep_id path registers wandb.agent with train_fn and the count."""
    base = tmp_path / "base.yaml"
    cfg = dict(tiny_config)
    cfg["train"] = dict(tiny_config["train"], ep=1, batch_size=16)
    with open(base, "w") as f:
        yaml.safe_dump(cfg, f)
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    fake_wandb.config = {"vit_config": str(base)}

    import importlib

    sweep_mod = importlib.import_module("scripts.sweep")
    monkeypatch.setattr(
        sys, "argv",
        ["sweep.py", "--sweep_id", "ent/proj/abc123", "--count", "1",
         "-e", "ent", "-p", "proj"],
    )
    sweep_mod.main()
    assert fake_wandb.agent_calls == [("ent/proj/abc123", "ent", "proj", 1)]
    assert fake_wandb.runs  # the agent executed train_fn -> wandb.init
