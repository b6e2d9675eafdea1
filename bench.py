#!/usr/bin/env python
"""Benchmark: baseline ViT training throughput on one TPU chip.

Workload = the reference baseline (`configs/exp/att_clp/baseline.yaml`,
BASELINE.md): 4096-pixel spectra, patch/stride 32 -> 129 tokens, hidden 32,
3 layers, 2 heads, MAE-monitored regression, AdamW, batch 64, 10k train
spectra. Headline metric = images/sec/chip through the fused-epoch path
(one lax.scan dispatch per epoch — the production configuration); extras
report the per-step path, bf16, and p50 eval latency.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
measured against the documented A100-PyTorch estimate in BASELINE.md
(A100_TORCH_EST_IPS). Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time

import numpy as np

A100_TORCH_EST_IPS = 25_000.0  # see BASELINE.md "Benchmark protocol"

N_TRAIN = 10_000
BATCH = 64
WARMUP_EPOCHS = 2
BENCH_EPOCHS = 3
EVAL_REPS = 50


def _config(precision: str) -> dict:
    return {
        "project": "bench",
        "model": {
            "name": "vit",
            "task_type": "reg",
            "image_size": 4096,
            "patch_size": 32,
            "hidden_size": 32,
            "num_hidden_layers": 3,
            "num_attention_heads": 2,
            "stride_size": 32,
            "proj_fn": "SW",
        },
        "train": {"batch_size": BATCH, "ep": 40, "precision": precision},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
    }


def build(precision: str):
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
    from vit_tpu.train.loop import (
        TrainState,
        make_eval_step,
        make_train_epoch,
        make_train_step,
    )
    from vit_tpu.train.optim import OptSpec, build_optimizer

    bundle = get_model(_config(precision))
    mesh = make_mesh(num_devices=1)
    repl = replicated_sharding(mesh)
    bshard = batch_sharding(mesh)

    steps_per_epoch = N_TRAIN // BATCH
    rng = np.random.default_rng(0)
    data = {
        "x": np.asarray(rng.standard_normal((N_TRAIN, 4096)), np.float32),
        "error": np.full((N_TRAIN, 4096), 0.01, np.float32),
        "label": np.asarray(rng.random((N_TRAIN, 1)), np.float32),
    }
    data_dev = jax.device_put(data, repl)
    batch = jax.device_put({k: v[:BATCH] for k, v in data.items()}, bshard)
    perm = jax.device_put(
        np.arange(steps_per_epoch * BATCH, dtype=np.int32), repl
    )

    params = bundle.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4096)))["params"]
    spec = OptSpec(
        lr=1e-3, opt_type="adamw", steps_per_epoch=steps_per_epoch, total_epochs=40
    )
    tx = build_optimizer(spec)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(1),
        plateau_scale=jnp.ones((), jnp.float32),
        frozen=jnp.zeros((), jnp.float32),
    )
    state = jax.device_put(state, repl)
    train_epoch = make_train_epoch(
        bundle, tx, spec, 0.0, BATCH, steps_per_epoch, repl
    )
    train_step = make_train_step(bundle, tx, spec, 0.0, repl, bshard)
    eval_step = make_eval_step(bundle, repl, bshard)
    return state, data_dev, perm, batch, train_epoch, train_step, eval_step, steps_per_epoch


# NOTE on synchronization: under the axon TPU tunnel,
# ``jax.block_until_ready`` returns before remote execution finishes — every
# timing below forces a REAL sync by copying a result to the host
# (np.asarray), exactly what the training loop does once per epoch.


def bench_fused(state, data_dev, perm, train_epoch, steps_per_epoch):
    for _ in range(WARMUP_EPOCHS):
        state, losses, _ = train_epoch(state, data_dev, perm)
    np.asarray(losses)
    times = []
    for _ in range(BENCH_EPOCHS):
        t0 = time.perf_counter()
        state, losses, _ = train_epoch(state, data_dev, perm)
        np.asarray(losses)  # hard sync (host copy)
        times.append(time.perf_counter() - t0)
    return steps_per_epoch * BATCH / float(np.median(times)), state


def bench_per_step(state, batch, train_step, steps_per_epoch):
    """Per-step-path throughput measured like real training: dispatch a full
    epoch of steps, sync once at the end (losses pipeline on device)."""
    for _ in range(5):
        state, m = train_step(state, batch)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    losses = []
    for _ in range(steps_per_epoch):
        state, m = train_step(state, batch)
        losses.append(m["loss"])
    np.asarray(losses[-1])  # hard sync on the last step's result
    return steps_per_epoch * BATCH / (time.perf_counter() - t0), state


def bench_eval(state, batch, eval_step):
    np.asarray(eval_step(state.params, batch))
    times = []
    for _ in range(EVAL_REPS):
        t0 = time.perf_counter()
        np.asarray(eval_step(state.params, batch))  # hard sync
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main() -> None:
    import jax as _jax

    if _jax.default_backend() == "tpu":
        _jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout masks

    setup_log = io.StringIO()
    with contextlib.redirect_stdout(setup_log):
        (state, data_dev, perm, batch, train_epoch, train_step, eval_step,
         steps_per_epoch) = build("32")
        ips_fused, state = bench_fused(state, data_dev, perm, train_epoch, steps_per_epoch)
        # per-step path benches from a fresh state (the fused one was donated)
        (state2, _, _, batch2, _, train_step2, eval_step2, _) = build("32")
        ips_step, state2 = bench_per_step(state2, batch2, train_step2, steps_per_epoch)
        eval_p50_ms = bench_eval(state2, batch2, eval_step2)

        (state3, data3, perm3, _, train_epoch3, _, _, spe3) = build("bf16")
        ips_bf16, _ = bench_fused(state3, data3, perm3, train_epoch3, spe3)
    print(setup_log.getvalue(), file=sys.stderr)

    import jax

    value = ips_fused
    result = {
        "metric": "ViT baseline train images/sec/chip (fp32, fused epoch)",
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / A100_TORCH_EST_IPS, 3),
        "extras": {
            "train_ips_per_step_path": round(ips_step, 1),
            "train_ips_bf16_fused": round(ips_bf16, 1),
            "eval_step_p50_ms": round(eval_p50_ms, 3),
            "batch_size": BATCH,
            "n_train": N_TRAIN,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline_note": f"vs estimated A100 torch {A100_TORCH_EST_IPS:.0f} img/s (BASELINE.md)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
