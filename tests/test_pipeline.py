"""Pipeline parallelism (GPipe over a mesh axis) on the 8-device CPU mesh.

The pipelined forward/backward must reproduce the monolithic model exactly
(deterministic mode) on the SAME canonical parameter tree, compose with data
parallelism, and reject the configurations it cannot honor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.models.builder import get_model
from vit_tpu.models.vit import compute_loss
from vit_tpu.parallel.pipeline import (
    apply_pipelined,
    pipeline_encoder,
    stack_stage_params,
    unstack_stage_params,
)


def _config(layers=4, hidden=32, heads=2, image=256, **model_extra):
    return {
        "project": "pp-test",
        "model": {
            "name": "vit",
            "task_type": "reg",
            "image_size": image,
            "patch_size": 32,
            "hidden_size": hidden,
            "num_hidden_layers": layers,
            "num_attention_heads": heads,
            "stride_size": 32,
            "proj_fn": "SW",
            **model_extra,
        },
        "train": {"batch_size": 8, "ep": 1},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }


def _mesh(pp, dp=1):
    devs = np.array(jax.devices()[: dp * pp]).reshape(dp, pp)
    return Mesh(devs, ("data", "pipe"))


def _init(config, batch=8, seed=0):
    bundle = get_model(config)
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (batch, config["model"]["image_size"])
        ),
        jnp.float32,
    )
    params = bundle.module.init(jax.random.PRNGKey(seed), x)["params"]
    return bundle, params, x


def test_stack_unstack_roundtrip():
    _, params, _ = _init(_config(layers=4))
    stacked = stack_stage_params(params["encoder"], 2)
    leaves = jax.tree_util.tree_leaves(stacked)
    assert all(leaf.shape[:2] == (2, 2) for leaf in leaves)
    back = unstack_stage_params(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["encoder"],
        back,
    )


def test_stack_rejects_indivisible_layers():
    _, params, _ = _init(_config(layers=4))
    with pytest.raises(ValueError, match="divisible by the"):
        stack_stage_params(params["encoder"], 3)


@pytest.mark.parametrize("num_microbatches", [1, 2, 4])
def test_pipelined_forward_matches_monolithic(num_microbatches):
    config = _config(layers=4)
    bundle, params, x = _init(config)
    mesh = _mesh(pp=4)
    want = bundle.module.apply({"params": params}, x, deterministic=True)
    got = apply_pipelined(
        bundle.module, params, x,
        mesh=mesh, num_microbatches=num_microbatches,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_single_stage_degenerate():
    config = _config(layers=2)
    bundle, params, x = _init(config)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "pipe"))
    want = bundle.module.apply({"params": params}, x, deterministic=True)
    got = apply_pipelined(bundle.module, params, x, mesh=mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipelined_grads_match_monolithic():
    config = _config(layers=4)
    bundle, params, x = _init(config)
    mesh = _mesh(pp=4)
    labels = jnp.asarray(
        np.random.default_rng(1).random((x.shape[0], 1)), jnp.float32
    )

    def loss_mono(p):
        logits = bundle.module.apply({"params": p}, x, deterministic=True)
        return compute_loss(logits, labels, "reg", "mae")

    def loss_pp(p):
        logits = apply_pipelined(
            bundle.module, p, x, mesh=mesh, num_microbatches=2
        )
        return compute_loss(logits, labels, "reg", "mae")

    g_mono = jax.grad(loss_mono)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        g_mono,
        g_pp,
    )


def test_pipeline_composes_with_data_parallel():
    config = _config(layers=4)
    bundle, params, x = _init(config, batch=16)
    mesh = _mesh(pp=4, dp=2)
    want = bundle.module.apply({"params": params}, x, deterministic=True)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(
        lambda p, xx: apply_pipelined(
            bundle.module, p, xx,
            mesh=mesh, num_microbatches=4, batch_axis="data",
        )
    )(params, x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_training_mode_runs_and_dropout_is_live():
    config = _config(layers=4)
    bundle, params, x = _init(config)
    mesh = _mesh(pp=4)
    key = jax.random.PRNGKey(7)
    out = apply_pipelined(
        bundle.module, params, x,
        mesh=mesh, num_microbatches=2,
        deterministic=False, rngs={"dropout": key},
    )
    det = apply_pipelined(
        bundle.module, params, x, mesh=mesh, num_microbatches=2
    )
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(det)), (
        "training mode must apply dropout"
    )
    # reproducible from the same seed
    out2 = apply_pipelined(
        bundle.module, params, x,
        mesh=mesh, num_microbatches=2,
        deterministic=False, rngs={"dropout": key},
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("remat", [True, "mlp"])
def test_remat_layers_match(remat):
    # remat=True wraps whole layers at the stage level; remat="mlp" is
    # handled inside ViTLayer (the stage must NOT double-wrap it).
    config = _config(layers=4, remat=remat)
    bundle, params, x = _init(config)
    mesh = _mesh(pp=2)
    want = bundle.module.apply({"params": params}, x, deterministic=True)
    got = apply_pipelined(bundle.module, params, x, mesh=mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _pp_experiment_config(tiny_config, pp, **train_extra):
    cfg = dict(tiny_config)
    # dropout off: PP draws per-(stage, layer, tick) streams, so stochastic
    # trajectories differ from the monolithic path by design; with it off
    # the training math must match.
    cfg["model"] = dict(
        tiny_config["model"],
        num_hidden_layers=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    cfg["train"] = dict(
        tiny_config["train"], ep=2, batch_size=16,
        pipeline_parallel=pp, **train_extra,
    )
    return cfg


def test_experiment_pipeline_parallel_matches_unpipelined(
    tiny_config, tmp_path, monkeypatch
):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    m_ref = Experiment(_pp_experiment_config(tiny_config, 1), seed=0).fit()
    exp = Experiment(_pp_experiment_config(tiny_config, 2), seed=0)
    assert dict(exp.mesh.shape) == {"data": 4, "model": 1, "pipe": 2}
    m_pp = exp.fit()
    assert m_pp["val_mae"] == pytest.approx(m_ref["val_mae"], rel=2e-3)
    assert m_pp["train_loss"] == pytest.approx(m_ref["train_loss"], rel=2e-3)


def test_experiment_pipeline_per_step_path(tiny_config, tmp_path, monkeypatch):
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _pp_experiment_config(tiny_config, 2, fused_epoch=False)
    m_ref = Experiment(
        _pp_experiment_config(tiny_config, 1, fused_epoch=False), seed=0
    ).fit()
    m_pp = Experiment(cfg, seed=0).fit()
    assert m_pp["val_mae"] == pytest.approx(m_ref["val_mae"], rel=2e-3)


def test_experiment_pipeline_with_grad_accumulation(
    tiny_config, tmp_path, monkeypatch
):
    """The pipelined forward sees batch/accum_steps rows; the schedule and
    the data-axis split must be validated (and work) against THAT size."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    m_ref = Experiment(
        _pp_experiment_config(tiny_config, 1, accumulate_steps=2), seed=0
    ).fit()
    m_pp = Experiment(
        _pp_experiment_config(
            tiny_config, 2, accumulate_steps=2, pipeline_microbatches=2
        ),
        seed=0,
    ).fit()
    assert m_pp["val_mae"] == pytest.approx(m_ref["val_mae"], rel=2e-3)

    bad = _pp_experiment_config(
        tiny_config, 2, accumulate_steps=2, pipeline_microbatches=3
    )
    with pytest.raises(ValueError, match="per-forward batch"):
        Experiment(bad, seed=0)


def test_experiment_pipeline_with_preprocessor_freeze(
    tiny_config, tmp_path, monkeypatch
):
    """Preprocessor freeze masks grads/updates OUTSIDE the forward, so it
    must behave identically whether the encoder is pipelined or not: the
    frozen PCA projection stays bit-identical through training under PP."""
    import copy

    from vit_tpu.data.hdf5 import load_spectra
    from vit_tpu.prepca.stats import compute_covariance_stats
    from vit_tpu.train.loop import Experiment
    from vit_tpu.utils import clear_cov_cache

    clear_cov_cache()
    flux = load_spectra(tiny_config["data"]["file_path"], 96)["flux"]
    cov = str(tmp_path / "cov.npz")
    compute_covariance_stats(flux, save_path=cov)

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = copy.deepcopy(_pp_experiment_config(tiny_config, 2))
    cfg["warmup"] = {
        "cov_path": cov, "preprocessor": "pca", "r": 64, "freeze_epochs": -1
    }
    exp = Experiment(cfg, seed=0)
    p0 = np.asarray(
        jax.tree_util.tree_leaves(exp.bundle.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512))
        )["params"]["preprocessor"])[0]
    )
    metrics = exp.fit()
    assert np.isfinite(metrics["train_loss"])
    p1 = np.asarray(
        jax.tree_util.tree_leaves(exp.state.params["preprocessor"])[0]
    )
    np.testing.assert_array_equal(p0, p1)


def test_experiment_pipeline_with_noise(tiny_config, tmp_path, monkeypatch):
    """On-the-fly noise injection happens before the pipelined forward;
    training must run and stay finite with noise_level > 0 under PP."""
    from vit_tpu.train.loop import Experiment

    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _pp_experiment_config(tiny_config, 2)
    cfg["noise"] = {"noise_level": 0.5}
    metrics = Experiment(cfg, seed=0).fit()
    assert np.isfinite(metrics["train_loss"])
    assert np.isfinite(metrics["val_mae"])


def test_experiment_pipeline_rejections(tiny_config):
    from vit_tpu.train.loop import Experiment

    bad_layers = _pp_experiment_config(tiny_config, 2)
    bad_layers["model"]["num_hidden_layers"] = 3
    with pytest.raises(ValueError, match="divisible by"):
        Experiment(bad_layers, seed=0)

    # PP x TP needs the stage-resident layout (the replicated-canonical
    # pipeline has no per-leaf TP specs); resident PP x TP itself is
    # covered by tests/test_pp_resident.py.
    with_tp = _pp_experiment_config(
        tiny_config, 2, model_parallel=2, pipeline_stage_params=False
    )
    with pytest.raises(ValueError, match="stage-resident"):
        Experiment(with_tp, seed=0)

    with_sp = _pp_experiment_config(tiny_config, 2, sequence_parallel=2)
    with pytest.raises(ValueError, match="sequence_parallel"):
        Experiment(with_sp, seed=0)

    with_ring = _pp_experiment_config(tiny_config, 2)
    with_ring["model"]["attn_impl"] = "ring"
    with pytest.raises(ValueError, match="ring"):
        Experiment(with_ring, seed=0)

    bad_mb = _pp_experiment_config(tiny_config, 2, pipeline_microbatches=3)
    with pytest.raises(ValueError, match="pipeline_microbatches"):
        Experiment(bad_mb, seed=0)


def test_rejects_bad_microbatch_and_ring():
    config = _config(layers=4)
    bundle, params, x = _init(config)  # batch 8
    mesh = _mesh(pp=4)
    with pytest.raises(ValueError, match="num_microbatches"):
        apply_pipelined(bundle.module, params, x, mesh=mesh, num_microbatches=3)
    # A ring-attention module can't trace without an active mesh, so reuse
    # the structurally-identical plain params; the pipeline must reject it
    # before any attention is traced.
    ring_bundle = get_model(_config(layers=4, attn_impl="ring"))
    with pytest.raises(ValueError, match="ring"):
        apply_pipelined(
            ring_bundle.module, params, x, mesh=mesh, num_microbatches=2
        )
    with pytest.raises(ValueError, match="dropout_rng"):
        pipeline_encoder(
            stack_stage_params(params["encoder"], 4),
            jnp.zeros((8, 8, 32)),
            cfg=bundle.vit_config, mesh=mesh,
            num_microbatches=2, deterministic=False,
        )
