"""Optimizer/scheduler factory tests: schedule math, plateau, early stop."""

import numpy as np
import pytest

from vit_tpu.train.optim import (
    EarlyStopping,
    OptSpec,
    PlateauScheduler,
    build_optimizer,
    schedule_scale,
    set_learning_rate,
)


def _spec(**kw):
    base = dict(lr=1e-3, opt_type="adamw", steps_per_epoch=10, total_epochs=20)
    base.update(kw)
    return OptSpec(**base)


def test_from_config_resolves_scheduler_aliases():
    cfg = {"opt": {"lr": 0.01, "type": "AdamW", "lr_sch": "CosineAnnealingLR"},
           "train": {"ep": 7}}
    spec = OptSpec.from_config(cfg, steps_per_epoch=5)
    assert spec.scheduler == "cosine"
    # reference kwarg extraction reads the OPT section only: T_max ->
    # opt.ep -> 100 (train.ep does NOT set the cosine period)
    assert spec.t_max == 100
    assert spec.lr == 0.01
    cfg["opt"]["ep"] = 7
    assert OptSpec.from_config(cfg, steps_per_epoch=5).t_max == 7
    cfg["opt"]["T_max"] = 3
    assert OptSpec.from_config(cfg, steps_per_epoch=5).t_max == 3


def test_from_config_plateau_disabled_without_val():
    cfg = {"opt": {"lr": 1e-3, "lr_sch": "plateau"}, "train": {"ep": 5}}
    spec = OptSpec.from_config(cfg, 5, has_val=False)
    assert spec.scheduler is None


def test_cosine_schedule_values():
    spec = _spec(scheduler="cosine", t_max=10)
    f = schedule_scale(spec)
    assert float(f(0)) == pytest.approx(1.0)
    # epoch 5 of T_max 10 -> cos(pi/2) midpoint = 0.5
    assert float(f(5 * 10)) == pytest.approx(0.5, abs=1e-6)
    assert float(f(10 * 10)) == pytest.approx(0.0, abs=1e-6)


def test_warmup_linear_prefix():
    spec = _spec(scheduler="cosine", t_max=10, warmup_epochs=4)
    f = schedule_scale(spec)
    assert float(f(0)) == pytest.approx(0.1)  # start at 10% of LR
    assert float(f(2 * 10)) == pytest.approx(0.1 + 0.9 * 0.5)
    # after warmup the cosine clock starts at 0 (SequentialLR semantics)
    assert float(f(4 * 10)) == pytest.approx(1.0)


def test_onecycle_schedule_shape():
    spec = _spec(scheduler="onecycle", total_epochs=10, steps_per_epoch=10)
    f = schedule_scale(spec)
    start = float(f(0))
    peak = float(f(30))  # pct_start=0.3 * 100 steps
    end = float(f(100))
    assert start == pytest.approx(1 / 25.0, rel=1e-3)
    assert peak == pytest.approx(1.0, rel=1e-3)
    assert end < start / 100


def test_constant_schedule():
    spec = _spec(scheduler="constant", constant_factor=0.5, constant_total_iters=3)
    f = schedule_scale(spec)
    assert float(f(0)) == pytest.approx(0.5)
    assert float(f(2 * 10)) == pytest.approx(0.5)
    assert float(f(3 * 10)) == pytest.approx(1.0)


def test_set_learning_rate_roundtrip():
    import jax.numpy as jnp

    spec = _spec()
    tx = build_optimizer(spec)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    state = set_learning_rate(state, jnp.asarray(0.5))
    assert float(state[-1].hyperparams["learning_rate"]) == 0.5
    grads = {"w": jnp.ones((3,))}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_optimizer_table_fallbacks():
    for name in ("adam", "adamw", "sgd", "rmsprop", "adadelta", "adagrad",
                 "adamax", "rprop", "asgd", "sparseadam"):
        tx = build_optimizer(_spec(opt_type=name))
        assert tx is not None


def test_every_listed_optimizer_updates():
    """Every name in the 11-optimizer table must survive a real
    tx.update(grads, state, params) call — lbfgs previously crashed at the
    first step because optax's default zoom linesearch demands value/grad/
    value_fn kwargs the train step never passes."""
    import jax.numpy as jnp

    for name in ("adam", "adamw", "sgd", "rmsprop", "adadelta", "adagrad",
                 "adamax", "rprop", "asgd", "sparseadam", "lbfgs"):
        tx = build_optimizer(_spec(opt_type=name))
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.full((4,), 0.1)}, state, params)
        assert np.all(np.isfinite(np.asarray(updates["w"]))), name


def test_plateau_counts_nan_as_bad_epoch():
    """torch ReduceLROnPlateau parity: NaN fails is_better -> bad epoch ->
    the LR is eventually reduced (previously NaN was skipped entirely and a
    diverged run kept full LR until the 500-epoch early stop)."""
    from vit_tpu.train.optim import PlateauScheduler

    p = PlateauScheduler(factor=0.5, patience=1, mode="min")
    p.step(1.0)
    assert p.step(float("nan")) == 1.0   # bad 1
    assert p.step(float("nan")) == 0.5   # bad 2 > patience -> reduce


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        import jax.numpy as jnp

        tx = build_optimizer(_spec(opt_type="frobnicate"))
        tx.init({"w": jnp.ones(1)})


def test_plateau_scheduler_torch_semantics():
    p = PlateauScheduler(factor=0.5, patience=2, mode="min")
    assert p.step(1.0) == 1.0
    # patience=2: two bad epochs tolerated, third triggers
    assert p.step(1.0) == 1.0
    assert p.step(1.0) == 1.0
    assert p.step(1.0) == 0.5
    # improvement resets
    p.step(0.5)
    assert p.num_bad == 0


def test_early_stopping():
    es = EarlyStopping(patience=3, mode="min")
    assert not es.step(1.0)
    assert not es.step(0.9)
    assert not es.step(0.95)
    assert not es.step(0.95)
    assert es.step(0.95)  # 3rd epoch without improvement


def test_moment_dtype_bf16_halves_mu_storage():
    """opt.moment_dtype: bf16 stores adam-family first moments in bfloat16
    (round-4 perf knob; measured ~1.2 ms/step on v5e ViT-B/16)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.train.optim import OptSpec, build_optimizer

    spec = OptSpec.from_config(
        {"opt": {"type": "AdamW", "lr": 1e-3, "moment_dtype": "bf16"},
         "train": {"ep": 1}},
        steps_per_epoch=1,
    )
    assert spec.moment_dtype == "bf16"
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = build_optimizer(spec).init(params)
    mus = [leaf for leaf in jax.tree_util.tree_leaves(state)
           if getattr(leaf, "dtype", None) == jnp.bfloat16]
    assert mus, "no bf16 leaves in the optimizer state"

    # default stays fp32
    spec32 = OptSpec.from_config(
        {"opt": {"type": "AdamW", "lr": 1e-3}, "train": {"ep": 1}},
        steps_per_epoch=1,
    )
    state32 = build_optimizer(spec32).init(params)
    assert not [leaf for leaf in jax.tree_util.tree_leaves(state32)
                if getattr(leaf, "dtype", None) == jnp.bfloat16]


def test_moment_dtype_bf16_training_step_stays_finite():
    import jax
    import jax.numpy as jnp
    import optax

    from vit_tpu.train.optim import OptSpec, build_optimizer

    spec = OptSpec(lr=1e-2, opt_type="adam", moment_dtype="bfloat16")
    tx = build_optimizer(spec)
    params = {"w": jnp.ones((8,), jnp.float32)}
    state = tx.init(params)
    for _ in range(3):
        grads = {"w": jnp.full((8,), 0.1, jnp.float32)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert bool(jnp.isfinite(params["w"]).all())


def test_moment_dtype_inert_outside_adam_family(capsys):
    """adamax/rmsprop have no optax mu_dtype: the knob must not crash the
    build (round-4 review finding) and must say it has no effect."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.train.optim import OptSpec, build_optimizer

    params = {"w": jnp.ones((4,), jnp.float32)}
    for name in ("adamax", "rmsprop", "sgd"):
        tx = build_optimizer(OptSpec(lr=1e-3, opt_type=name,
                                     moment_dtype="bf16"))
        state = tx.init(params)  # must not raise
        assert not [leaf for leaf in jax.tree_util.tree_leaves(state)
                    if getattr(leaf, "dtype", None) == jnp.bfloat16]
        out = capsys.readouterr().out
        assert "no effect" in out, f"missing inert-knob warning for {name}"


def test_moment_dtype_rejects_unknown():
    import jax.numpy as jnp
    import pytest as _pytest

    from vit_tpu.train.optim import OptSpec, build_optimizer

    with _pytest.raises(ValueError, match="moment_dtype"):
        build_optimizer(OptSpec(opt_type="adamw", moment_dtype="fp8")).init(
            {"w": jnp.ones((2,), jnp.float32)}
        )
