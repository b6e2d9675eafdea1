#!/usr/bin/env python
"""Benchmark: baseline ViT training throughput on one TPU chip.

Workload = the reference baseline (`configs/exp/att_clp/baseline.yaml`,
BASELINE.md): 4096-pixel spectra, patch/stride 32 -> 129 tokens, hidden 32,
3 layers, 2 heads, MAE-monitored regression, AdamW, batch 64 — measured as
images/sec/chip on the jit train step, plus p50 eval-step latency.

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

# Estimated A100 PyTorch-Lightning throughput for this workload (see
# BASELINE.md "Benchmark protocol"): the model is tiny (39k params), so the
# reference is bounded by per-step framework overhead (~2.5 ms/step
# Lightning+DDP dispatch) => ~64 / 2.5e-3 = 25.6k images/s.
A100_TORCH_EST_IPS = 25_000.0

WARMUP_STEPS = 5
BENCH_STEPS = 50
EVAL_REPS = 50


def build(precision: str):
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
    from vit_tpu.train.loop import TrainState, make_eval_step, make_train_step
    from vit_tpu.train.optim import OptSpec, build_optimizer

    config = {
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
        "train": {"batch_size": 64, "ep": 40, "precision": precision},
        "loss": {"name": "mae"},
        "opt": {"type": "AdamW", "lr": 1e-3, "lr_sch": "none"},
        "data": {"param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
    }
    bundle = get_model(config)
    mesh = make_mesh(num_devices=1)
    repl = replicated_sharding(mesh)
    bshard = batch_sharding(mesh)

    batch_size = 64
    rng = np.random.default_rng(0)
    batch = {
        "x": np.asarray(rng.standard_normal((batch_size, 4096)), np.float32),
        "error": np.full((batch_size, 4096), 0.01, np.float32),
        "label": np.asarray(rng.random((batch_size, 1)), np.float32),
    }
    batch = jax.device_put(batch, bshard)

    params = bundle.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4096)))["params"]
    spec = OptSpec(lr=1e-3, opt_type="adamw", steps_per_epoch=157, total_epochs=40)
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
    train_step = make_train_step(bundle, tx, spec, noise_level=0.0, state_sharding=repl,
                                 batch_sharding_=bshard)
    eval_step = make_eval_step(bundle, repl, bshard)
    return state, batch, train_step, eval_step, batch_size


def bench_train(state, batch, train_step, batch_size: int):
    import jax

    for _ in range(WARMUP_STEPS):
        state, m = train_step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, m = train_step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return BENCH_STEPS * batch_size / dt, state


def bench_eval(state, batch, eval_step):
    import jax

    out = eval_step(state.params, batch)
    jax.block_until_ready(out)
    times = []
    for _ in range(EVAL_REPS):
        t0 = time.perf_counter()
        out = eval_step(state.params, batch)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main() -> None:
    # Keep stdout clean for the single JSON line: builder prints -> stderr.
    setup_log = io.StringIO()
    with contextlib.redirect_stdout(setup_log):
        state, batch, train_step, eval_step, batch_size = build("32")
        ips_fp32, state = bench_train(state, batch, train_step, batch_size)
        eval_p50_ms = bench_eval(state, batch, eval_step)

        state_bf, batch_bf, train_step_bf, _, _ = build("bf16")
        ips_bf16, _ = bench_train(state_bf, batch_bf, train_step_bf, batch_size)
    print(setup_log.getvalue(), file=sys.stderr)

    import jax

    n_chips = 1  # single-chip bench (mesh size 1)
    value = ips_fp32 / n_chips
    result = {
        "metric": "ViT baseline train images/sec/chip (fp32)",
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / A100_TORCH_EST_IPS, 3),
        "extras": {
            "train_ips_bf16": round(ips_bf16, 1),
            "eval_step_p50_ms": round(eval_p50_ms, 3),
            "batch_size": batch_size,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline_note": f"vs estimated A100 torch {A100_TORCH_EST_IPS:.0f} img/s (BASELINE.md)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
