"""Memory-real pipeline parallelism (train.pipeline_stage_params, default).

The point of PP is per-device memory: encoder params AND optimizer state
must live stage-sharded over the `pipe` axis as the RESIDENT layout (1/P
bytes per device), not be replicated and restacked per step. These tests
pin, on the 8-device CPU mesh:

* residency — per-device live bytes of encoder params + moments shrink
  ~1/P vs the replicated layout;
* parity — training matches the replicated-canonical pipeline (same
  math, different layout) and the monolithic model (dropout off);
* checkpoints — saved in the canonical per-layer layout: a monolithic
  (pp=1) run restores/evaluates a PP-resident checkpoint and vice versa;
* composition — PP x TP (encoder kernels sharded over `model` inside the
  pipeline body) and MoE x PP (router aux threaded through the pipeline).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.models.builder import get_model
from vit_tpu.parallel.pipeline import (
    apply_pipelined,
    canonical_params,
    convert_params_shaped,
    stage_resident_params,
)
from vit_tpu.train.loop import Experiment


def _pp_cfg(tiny_config, pp, layers=2, **train_extra):
    cfg = dict(tiny_config)
    cfg["model"] = dict(
        tiny_config["model"],
        num_hidden_layers=layers,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    train = dict(tiny_config["train"], ep=2, batch_size=16,
                 pipeline_parallel=pp)
    train.update(train_extra)
    cfg["train"] = train
    return cfg


def _device0_bytes(tree) -> int:
    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for sh in getattr(leaf, "addressable_shards", []):
            if sh.device == dev0:
                total += sh.data.nbytes
    return total


def test_resident_params_and_opt_state_shrink_per_device(
    tiny_config, tmp_path, monkeypatch
):
    """THE memory claim: device-0's live bytes for encoder params and for
    the optimizer moments are ~1/P of the replicated pipeline's."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    res = Experiment(_pp_cfg(tiny_config, 2), seed=0)
    rep = Experiment(
        _pp_cfg(tiny_config, 2, pipeline_stage_params=False), seed=0
    )
    from vit_tpu.train.optim import OptSpec, build_optimizer

    for exp in (res, rep):
        exp.datamodule.setup("fit")
        spec = OptSpec.from_config(exp.config, 1, monitor_metric=exp.monitor)
        exp.state = exp._init_state(build_optimizer(spec))
    assert res.pp_resident and not rep.pp_resident

    p_res = _device0_bytes(res.state.params["encoder"])
    p_rep = _device0_bytes(rep.state.params["encoder"])
    assert p_res == pytest.approx(p_rep / 2, rel=0.01), (
        f"resident encoder params {p_res} B/device vs replicated {p_rep}"
    )
    # moments: everything in opt_state minus the replicated scalars; the
    # encoder share must halve too (AdamW mu+nu)
    o_res = _device0_bytes(res.state.opt_state)
    o_rep = _device0_bytes(rep.state.opt_state)
    enc_total = sum(
        l.nbytes for l in jax.tree_util.tree_leaves(rep.state.params["encoder"])
    )
    # AdamW: mu + nu = 2x params; the non-encoder moments stay replicated
    assert o_rep - o_res == pytest.approx(2 * enc_total / 2, rel=0.01)
    # ... and the resident encoder leaves are actually pipe-sharded
    leaf = jax.tree_util.tree_leaves(res.state.params["encoder"])[0]
    assert "pipe" in str(leaf.sharding.spec)


def test_resident_matches_replicated_pipeline_and_monolithic(
    tiny_config, tmp_path, monkeypatch
):
    """Same seed, three layouts: monolithic, replicated-PP, resident-PP.
    With dropout off all three train the same math."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    m_mono = Experiment(_pp_cfg(tiny_config, 1), seed=0).fit()
    m_rep = Experiment(
        _pp_cfg(tiny_config, 2, pipeline_stage_params=False), seed=0
    ).fit()
    m_res = Experiment(_pp_cfg(tiny_config, 2), seed=0).fit()
    assert m_res["train_loss"] == pytest.approx(m_rep["train_loss"], rel=1e-5)
    assert m_res["val_mae"] == pytest.approx(m_rep["val_mae"], rel=1e-5)
    assert m_res["val_mae"] == pytest.approx(m_mono["val_mae"], rel=2e-3)


def test_resident_checkpoint_is_canonical_and_interchangeable(
    tiny_config, tmp_path, monkeypatch
):
    """Checkpoints gather to the canonical per-layer dict: a monolithic run
    restores a PP-resident checkpoint exactly, and a PP-resident run
    resumes a monolithic checkpoint — params, optimizer moments and step
    all line up (--ckpt/torch-bridge contract untouched)."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    exp = Experiment(_pp_cfg(tiny_config, 2, save=True), seed=0)
    m = exp.fit()

    # evaluate the SAME checkpoint from a monolithic experiment
    mono = Experiment(_pp_cfg(tiny_config, 1, save=True), seed=1)
    t_mono = mono.test(ckpt="last")
    t_res = exp.test(ckpt="last")
    assert t_mono["test_mae"] == pytest.approx(t_res["test_mae"], rel=1e-6)
    # restored monolithic params == gathered resident params
    got = jax.device_get(mono.state.params["encoder"]["layer_0"])
    want = canonical_params(jax.device_get(exp.state.params))["encoder"]["layer_0"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, want,
    )

    # resume THROUGH the layout boundary: monolithic run continues the
    # PP-resident checkpoint; a fresh PP run resumes it too
    cont = Experiment(_pp_cfg(tiny_config, 1, save=True, ep=3), seed=2,
                      ckpt_path="last")
    mc = cont.fit()
    assert int(cont.state.step) == 3 * 6  # 96/16 = 6 steps/epoch
    cont_pp = Experiment(_pp_cfg(tiny_config, 2, save=True, ep=4), seed=3,
                         ckpt_path="last")
    mpp = cont_pp.fit()
    assert int(cont_pp.state.step) == 4 * 6
    assert np.isfinite(mpp["train_loss"]) and np.isfinite(mc["train_loss"])


def test_opt_state_structural_conversion_roundtrip(tiny_config):
    """convert_params_shaped finds exactly the params-shaped subtrees
    (AdamW mu/nu) and the resident<->canonical round-trip is lossless."""
    import optax

    bundle = get_model(_pp_cfg(tiny_config, 2))
    x = jnp.zeros((4, tiny_config["model"]["image_size"]), jnp.float32)
    params = bundle.module.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adamw(1e-3)
    resident = stage_resident_params(params, 2)
    opt = tx.init(resident)
    td = jax.tree_util.tree_structure(resident)
    canon = convert_params_shaped(opt, td, canonical_params)
    # canonical moments must mirror the canonical params structure
    td_c = jax.tree_util.tree_structure(params)
    seen = []
    jax.tree_util.tree_map(
        lambda x: seen.append(x) or x, canon,
        is_leaf=lambda s: jax.tree_util.tree_structure(s) == td_c,
    )
    # back again, bit-exact
    back = convert_params_shaped(
        canon, td_c, lambda p: stage_resident_params(p, 2)
    )
    # bit-exact round-trip INCLUDING the pass-through scalars (step counts)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt, back,
    )
    assert jax.tree_util.tree_structure(opt) == jax.tree_util.tree_structure(back)


def test_pp_x_tp_composition(tiny_config, tmp_path, monkeypatch):
    """Pipeline x tensor parallelism: stage kernels shard over `model`
    (GSPMD-auto inside the pipeline body); training matches monolithic."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _pp_cfg(tiny_config, 2, model_parallel=2)
    # hidden 64 so the TP rule (out-features >= 2*tp, divisible) engages
    cfg["model"]["hidden_size"] = 64
    exp = Experiment(cfg, seed=0)
    assert dict(exp.mesh.shape) == {"data": 2, "model": 2, "pipe": 2}
    m = exp.fit()

    mono_cfg = _pp_cfg(tiny_config, 1)
    mono_cfg["model"]["hidden_size"] = 64
    m_mono = Experiment(mono_cfg, seed=0).fit()
    assert m["val_mae"] == pytest.approx(m_mono["val_mae"], rel=2e-3)
    assert m["train_loss"] == pytest.approx(m_mono["train_loss"], rel=2e-3)
    # an encoder kernel is actually sharded over BOTH pipe and model
    spec_strs = [
        str(l.sharding.spec)
        for l in jax.tree_util.tree_leaves(exp.state.params["encoder"])
    ]
    assert any("pipe" in s and "model" in s for s in spec_strs), spec_strs


def test_moe_x_pp_composition(tiny_config, tmp_path, monkeypatch):
    """MoE inside the pipeline: the routers' load-balance aux is collected
    through the shard_map (bubble ticks masked) and added to the objective;
    with one microbatch the aux equals the monolithic full-batch value."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _pp_cfg(tiny_config, 2)
    cfg["model"] = dict(cfg["model"], moe_experts=2, moe_aux_weight=0.01,
                        moe_capacity_factor=2.0)
    exp = Experiment(cfg, seed=0)
    m = exp.fit()
    assert np.isfinite(m["train_loss"]) and np.isfinite(m["val_mae"])

    # forward + aux parity vs monolithic (deterministic, m=1 -> exact batch)
    bundle = exp.bundle
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 512)), jnp.float32
    )
    params = bundle.module.init(jax.random.PRNGKey(0), x)["params"]
    logits_m, cols = bundle.module.apply(
        {"params": params}, x, deterministic=True, mutable=["losses"]
    )
    leaves = jax.tree_util.tree_leaves(cols["losses"])
    aux_m = float(sum(np.mean(np.asarray(a)) for a in leaves) / len(leaves))
    logits_p, aux_p = apply_pipelined(
        bundle.module, params, x, mesh=exp.mesh, num_microbatches=1,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_m), atol=1e-5
    )
    # the pipeline returns the PRE-WEIGHTED regularizer (aux_w * LB)
    assert float(aux_p) == pytest.approx(0.01 * aux_m, rel=1e-5)


def test_moe_x_pp_x_ep_composition(tiny_config, tmp_path, monkeypatch):
    """The full stack: experts sharded over `model` (EP) inside pipeline
    stages, data parallel outside — dp2 x ep2 x pp2 on 8 devices."""
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    cfg = _pp_cfg(tiny_config, 2, model_parallel=2)
    cfg["model"] = dict(cfg["model"], moe_experts=2, moe_aux_weight=0.01,
                        moe_capacity_factor=2.0)
    exp = Experiment(cfg, seed=0)
    assert dict(exp.mesh.shape) == {"data": 2, "model": 2, "pipe": 2}
    m = exp.fit()
    assert np.isfinite(m["train_loss"]) and np.isfinite(m["val_mae"])


def test_zero1_rejected_with_resident_pp(tiny_config):
    cfg = _pp_cfg(tiny_config, 2, opt_state_sharding=True)
    with pytest.raises(ValueError, match="stage-resident|redundant"):
        Experiment(cfg, seed=0)
