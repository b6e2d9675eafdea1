#!/usr/bin/env python
"""Benchmark: training throughput on one TPU chip. Prints ONE JSON line.

Headline = the reference baseline workload (`configs/exp/att_clp/baseline.yaml`,
BASELINE.md): 4096-pixel spectra, patch/stride 32 -> 129 tokens, hidden 32,
3 layers, 2 heads, MAE-monitored regression, AdamW, batch 64, 10k train
spectra — images/sec/chip through the production fast path
(``train.epochs_per_dispatch=40``: the whole 40-epoch workload in ONE
lax.scan dispatch, one host round-trip per run). Extras report the
single-epoch fused path, the per-step path, bf16, p50 eval latency (plus
the amortized on-device eval latency — the dispatch p50 is tunnel RPC
floor here), and the image-ViT family (ViT-S/16 CIFAR-shape and ViT-B/16
bf16) where the MXU, not dispatch overhead, sets the ceiling.

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
measured against the A100-PyTorch estimate documented there, anchored by a
measured torch-CPU datapoint (scripts/bench_torch_reference.py).
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
# Whole-run dispatch: the baseline workload is 40 epochs (train.ep), so the
# production fast path can amortize the ~29 ms tunnel RPC over the entire
# run — one host round-trip per 40 epochs (~0.7 ms/epoch).
EPOCHS_PER_DISPATCH = 40
EVAL_REPS = 50
EVAL_SCAN_ITERS = 200  # on-device eval latency: iterations per dispatch
IMG_STEPS = 16  # image-family steps per timed dispatch


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


def build(precision: str, n_epochs: int = 1):
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
    # x + label only: the baseline workload runs noise_level=0, so the
    # 'error' column would be a dead 164 MB that the fused epoch
    # permutation-gathers every epoch (Experiment.fit filters it the same
    # way).
    data = {
        "x": np.asarray(rng.standard_normal((N_TRAIN, 4096)), np.float32),
        "label": np.asarray(rng.random((N_TRAIN, 1)), np.float32),
    }
    data_dev = jax.device_put(data, repl)
    batch = jax.device_put({k: v[:BATCH] for k, v in data.items()}, bshard)
    from vit_tpu.data.pipeline import epoch_permutation

    total = steps_per_epoch * BATCH
    if n_epochs > 1:
        perm = jax.device_put(
            np.stack([
                epoch_permutation(N_TRAIN, BATCH, steps_per_epoch, 0, e)
                for e in range(n_epochs)
            ]),
            repl,
        )
        frozen_vec = jax.device_put(np.zeros(n_epochs, np.float32), repl)
    else:
        perm = jax.device_put(np.arange(total, dtype=np.int32), repl)
        frozen_vec = None

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
    # gather_mode='step' is the production Experiment default and the clean
    # round-4 A/B winner (98.20 vs 99.73 ms/epoch, BASELINE.md round-4 table).
    train_epoch = make_train_epoch(
        bundle, tx, spec, 0.0, BATCH, steps_per_epoch, repl, n_epochs=n_epochs,
        gather_mode="step",
    )
    train_step = make_train_step(bundle, tx, spec, 0.0, repl, bshard)
    eval_step = make_eval_step(bundle, repl, bshard)
    return (state, data_dev, perm, frozen_vec, batch, train_epoch, train_step,
            eval_step, steps_per_epoch, bundle)


# NOTE on synchronization: under the axon TPU tunnel,
# ``jax.block_until_ready`` returns before remote execution finishes — every
# timing below forces a REAL sync by copying a result to the host
# (np.asarray), exactly what the training loop does once per dispatch.


def bench_fused(state, data_dev, perm, frozen_vec, train_epoch, steps_per_epoch,
                n_epochs=1, reps=3):
    def dispatch(st):
        if n_epochs > 1:
            st, losses, _ = train_epoch(st, data_dev, perm, frozen_vec)
        else:
            st, losses, _ = train_epoch(st, data_dev, perm)
        return st, losses

    for _ in range(2):
        state, losses = dispatch(state)
    np.asarray(losses)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = dispatch(state)
        np.asarray(losses)  # hard sync (host copy)
        times.append(time.perf_counter() - t0)
    per_epoch = float(np.median(times)) / n_epochs
    return steps_per_epoch * BATCH / per_epoch, state


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


def bench_eval_on_device(state, batch, bundle):
    """On-device eval-step latency, amortized over EVAL_SCAN_ITERS forwards
    inside ONE dispatch (like the train numbers). The per-dispatch
    ``bench_eval`` p50 above is ~100% tunnel RPC floor in this deployment
    (BASELINE.md) — this is the model number, that one is the tunnel
    number."""
    import jax
    import jax.numpy as jnp

    module = bundle.module

    @jax.jit
    def run(params, x):
        def body(carry, _):
            # chain the carry into the input so iterations can't be hoisted
            logits = module.apply(
                {"params": params}, x + carry * 1e-30, deterministic=True
            )
            return carry + logits.sum() * 1e-30, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=EVAL_SCAN_ITERS
        )
        return acc

    x = batch["x"]
    np.asarray(run(state.params, x))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(state.params, x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / EVAL_SCAN_ITERS * 1e3


def bench_lr_sweep() -> float:
    """Wall-clock of the 7-value LR sweep as ONE vmapped launch (BASELINE
    target metric #3): the baseline workload at 4 epochs, 7 replicas trained
    simultaneously, including compile. The reference runs 7 independent
    processes; here the whole grid is one program."""
    import tempfile

    import yaml

    from vit_tpu.opt.parallel_sweep import ParallelSweepRunner

    cfg = _config("32")
    cfg["train"]["ep"] = 4
    cfg["data"] = {"param": "log_g", "label_norm": "minmax",
                   "file_path": "__synthetic__"}
    with tempfile.TemporaryDirectory() as td:
        # Synthetic data: the sweep engine loads via SpecDataModule, so
        # stage a real (small) HDF5 file in the reference schema.
        from vit_tpu.data.synthetic import write_dummy_h5

        h5 = f"{td}/bench.h5"
        write_dummy_h5(h5, n=2048, length=4096, seed=0)
        cfg["data"].update(file_path=h5, val_path=h5, num_samples=2048)
        cfg_path = f"{td}/bench_sweep.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        runner = ParallelSweepRunner(
            cfg_path,
            lr_values=[1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2],
            schedulers=["none"],
            results_dir=f"{td}/runs",
            seed=0,
        )
        t0 = time.perf_counter()
        best = runner.run()
        dt = time.perf_counter() - t0
        assert best is not None
    return dt


def _timed_dispatch(dispatch, iters: int, reps: int = 2) -> float:
    """Median wall-time per scanned iteration of ``dispatch()`` with a hard
    host sync (np.asarray of its result) — one warm call first for compile.
    The shared scaffold for every amortized-scan measurement here."""
    np.asarray(dispatch())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(dispatch())
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters


def bench_image_family():
    """Train-step throughput for the standard image-ViT presets (bf16).

    These are the compute-bound shapes where the MXU sets the ceiling;
    measured by amortizing IMG_STEPS full train steps inside one lax.scan
    dispatch with a hard host sync (tunnel-proof)."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.models.vit import compute_loss
    from vit_tpu.train.optim import OptSpec, build_optimizer

    out = {}
    cases = [
        # (tag, model cfg, batch)
        ("vit_s16_cifar_bf16", {
            "name": "vit-s16", "task_type": "cls", "input_kind": "image",
            "image_size": 32, "patch_size": 4, "num_labels": 10,
            "num_channels": 3, "pos_encoding_type": "learned",
        }, 128),
        # remat=False + batch 64/chip beats remat=True + batch 128 by 32%
        # on v5e 16GB (76.8 vs 202 ms/step measured); remat is for larger
        # global batches / longer sequences.
        ("vit_b16_224_bf16", {
            "name": "vit-b16", "task_type": "cls", "input_kind": "image",
            "image_size": 224, "num_labels": 1000, "num_channels": 3,
            "pos_encoding_type": "learned", "remat": False, "attn_impl": "auto",
        }, 64),
        # round-4 perf preset: tanh GELU + bf16 first moments + bf16 softmax
        # accumulation (BASELINE.md "ViT-B/16 MFU pass"; measured 1009.6
        # img/s = the >=50%-of-peak mark). exact-erf/fp32-moment/fp32-softmax
        # parity stays the default.
        ("vit_b16_perf_preset", {
            "name": "vit-b16", "task_type": "cls", "input_kind": "image",
            "image_size": 224, "num_labels": 1000, "num_channels": 3,
            "pos_encoding_type": "learned", "remat": False, "attn_impl": "auto",
            "gelu_approximate": True, "softmax_dtype": "bfloat16",
            "_moment_dtype": "bf16",
        }, 64),
        # MoE family anchor: 8-expert top-2 S/16 (120.6M params, 5.7x the
        # dense capacity) — single-chip, all experts local (no EP). Measured
        # disposition in BASELINE.md "MoE family": capacity lever, not a
        # throughput lever; 45 TF/s achieved on the E*C slot FLOPs.
        ("vit_s16_moe8_top2", {
            "name": "vit-s16", "task_type": "cls", "input_kind": "image",
            "image_size": 32, "patch_size": 4, "num_labels": 10,
            "num_channels": 3, "pos_encoding_type": "learned",
            "moe_experts": 8, "moe_top_k": 2, "moe_capacity_factor": 1.25,
        }, 128),
    ]
    for tag, mcfg, batch in cases:
        mcfg = dict(mcfg)
        moment_dtype = mcfg.pop("_moment_dtype", None)
        cfg = {
            "project": "bench", "model": dict(mcfg),
            "train": {"batch_size": batch, "ep": 1, "precision": "bf16"},
            "loss": {"name": "ce"}, "data": {}, "noise": {"noise_level": 0},
        }
        bundle = get_model(cfg)
        vc = bundle.vit_config
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((batch, vc.image_size, vc.image_size, 3)), jnp.float32
        )
        y = jnp.asarray(rng.integers(0, vc.num_labels, batch), jnp.int32)
        params = bundle.module.init(jax.random.PRNGKey(0), x[:1])["params"]
        spec = OptSpec(lr=1e-3, opt_type="adamw", steps_per_epoch=1,
                       total_epochs=1, moment_dtype=moment_dtype)
        tx = build_optimizer(spec)
        opt_state = tx.init(params)

        # Same training objective as Experiment (incl. the MoE aux loss at
        # the config's weight) — the benchmark must time the production step.
        from vit_tpu.train.loop import make_train_forward

        train_forward, moe_aux_w = make_train_forward(bundle)

        def one_step(carry, _):
            params, opt_state, key = carry
            key, dr = jax.random.split(key)

            def loss_fn(p):
                out = train_forward(p, x, dr)
                logits, aux = out if isinstance(out, tuple) else (out, 0.0)
                return compute_loss(logits, y, "cls", "ce") + moe_aux_w * aux

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates
            )
            return (params, opt_state, key), loss

        @jax.jit
        def run(params, opt_state):
            carry, losses = jax.lax.scan(
                one_step, (params, opt_state, jax.random.PRNGKey(1)), None,
                length=IMG_STEPS,
            )
            return carry[0], carry[1], losses

        carry = [params, opt_state]

        def dispatch(carry=carry, run=run):
            carry[0], carry[1], losses = run(carry[0], carry[1])
            return losses

        dt = _timed_dispatch(dispatch, IMG_STEPS)
        out[f"{tag}_ips"] = round(batch / dt, 1)
        out[f"{tag}_step_ms"] = round(dt * 1e3, 3)
    return out


def bench_longctx_train():
    """Stride-1 long-context training step: T=4066 tokens (4096-px spectra,
    patch 32, stride 1), bf16 + MLP-sublayer remat, flash attention with
    in-kernel probs dropout at the measured-best default blocks. The
    capability headline — the reference torch stack cannot run this shape
    without materializing ~2.1 GB/step of attention probabilities
    (BASELINE.md round-2/4 rows). remat: "mlp" is the measured-best mode
    that still bounds activation memory: 49.1 ms/step vs 58.4 (remat: true)
    and 47.1 (no remat, all residuals saved) — BASELINE.md "Remat
    granularity"."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.models.vit import compute_loss
    from vit_tpu.train.loop import make_train_forward
    from vit_tpu.train.optim import OptSpec, build_optimizer

    BATCH_S1, STEPS = 16, 8
    cfg = {
        "project": "bench",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 4096,
            "patch_size": 32, "hidden_size": 128, "num_hidden_layers": 3,
            "num_attention_heads": 2, "stride_size": 1, "proj_fn": "SW",
            "attn_impl": "auto", "remat": "mlp",
        },
        "train": {"batch_size": BATCH_S1, "ep": 1, "precision": "bf16"},
        "loss": {"name": "mae"}, "data": {}, "noise": {"noise_level": 0},
    }
    bundle = get_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH_S1, 4096)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(BATCH_S1), jnp.float32)
    params = bundle.module.init(jax.random.PRNGKey(0), x[:1])["params"]
    spec = OptSpec(lr=1e-3, opt_type="adamw", steps_per_epoch=1, total_epochs=1)
    tx = build_optimizer(spec)
    opt_state = tx.init(params)
    train_forward, _ = make_train_forward(bundle)

    def one_step(carry, _):
        params, opt_state, key = carry
        key, dr = jax.random.split(key)

        def loss_fn(p):
            return compute_loss(train_forward(p, x, dr), y, "reg", "mae")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        return (params, opt_state, key), loss

    @jax.jit
    def run(params, opt_state):
        carry, losses = jax.lax.scan(
            one_step, (params, opt_state, jax.random.PRNGKey(1)), None,
            length=STEPS,
        )
        return carry[0], carry[1], losses

    carry = [params, opt_state]

    def dispatch(carry=carry, run=run):
        carry[0], carry[1], losses = run(carry[0], carry[1])
        return losses

    dt = _timed_dispatch(dispatch, STEPS)
    return {
        "stride1_t4066_train_ips": round(BATCH_S1 / dt, 1),
        "stride1_t4066_step_ms": round(dt * 1e3, 3),
    }


def bench_serving():
    """ViT-B/16 batch-128 inference (vit_tpu.serve's deployment shape):
    bf16, the serving perf preset (bf16 + tanh GELU + bf16 softmax),
    calibrated static-scale W8A8 int8 (1.15x over bf16 at batch 128 —
    BASELINE.md round-5 "Serving"), and the preset x int8 composition
    (the round-5 serving best: 4,052 img/s standalone probe, 1.68x over
    plain bf16). Measured by amortizing IMG_STEPS forwards inside one
    scan dispatch with a hard host sync. Dynamic-W8A8/weight-only are
    NOT timed here — measured 0.98-0.99x at this batch; their value is
    small-batch speed and resident-weight size."""
    import jax
    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.ops.quant import (
        calibrate_activation_scales,
        quantize_dense_params,
        quantized_apply,
        strip_quantized,
    )

    BATCH_SERVE = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((BATCH_SERVE, 224, 224, 3)), jnp.float32
    )
    out = {}
    for tag, extra in (
        ("serve_b16_bf16", {}),
        ("serve_b16_preset", {"gelu_approximate": True,
                              "softmax_dtype": "bfloat16"}),
    ):
        cfg = {
            "project": "bench",
            "model": {
                "name": "vit-b16", "task_type": "cls", "input_kind": "image",
                "image_size": 224, "num_labels": 1000, "num_channels": 3,
                "pos_encoding_type": "learned", "remat": False,
                "attn_impl": "auto", **extra,
            },
            "train": {"batch_size": BATCH_SERVE, "precision": "bf16"},
            "loss": {"name": "ce"}, "data": {}, "noise": {"noise_level": 0},
        }
        bundle = get_model(cfg)
        params = bundle.module.init(jax.random.PRNGKey(0), x[:1])["params"]
        module = bundle.module

        @jax.jit
        def run(p, xx):
            def body(carry, _):
                logits = module.apply(
                    {"params": p}, xx + carry * 1e-30, deterministic=True
                )
                return carry + logits.sum().astype(jnp.float32) * 1e-30, None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=IMG_STEPS
            )
            return acc

        dt = _timed_dispatch(
            lambda run=run, params=params: run(params, x), IMG_STEPS
        )
        out[f"{tag}_ips"] = round(BATCH_SERVE / dt, 1)

        # Calibrated W8A8 on both modules: one eager calibration forward
        # on a 32-sample slice, then the timed scan. On the preset module
        # this is the composed serving best (preset epsilon-ops + int8
        # MXU matmuls stack — 4,052 img/s in the round-5 probe).
        table = quantize_dense_params(params)
        stripped = strip_quantized(params, table)
        ctable = calibrate_activation_scales(
            module, {"params": stripped}, table, x[:32], deterministic=True
        )

        @jax.jit
        def run_q(p, q, xx):
            def body(carry, _):
                logits = quantized_apply(
                    module, {"params": p}, q, xx + carry * 1e-30,
                    deterministic=True,
                )
                return carry + logits.sum().astype(jnp.float32) * 1e-30, None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=IMG_STEPS
            )
            return acc

        dt = _timed_dispatch(
            lambda run_q=run_q, stripped=stripped, ctable=ctable: run_q(
                stripped, ctable, x
            ),
            IMG_STEPS,
        )
        key = (
            "serve_b16_int8_calib_ips"
            if tag == "serve_b16_bf16"
            else "serve_b16_preset_int8_ips"
        )
        out[key] = round(BATCH_SERVE / dt, 1)
    return out


def bench_flash_longctx():
    """Long-context attention training pass (fwd + dq/dk/dv backward) at the
    stride-1 shape class: T=4096, d=64, B·H=32, bf16, flash kernel at its
    measured-best default blocks vs XLA attention (BASELINE.md round-4
    "flash block-size sweep"). Skipped off-TPU — the flash path falls back
    to the same XLA program there."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return {}

    from vit_tpu.ops.flash_attention import flash_attention

    T, D, BH, ITERS = 4096, 64, 32, 10
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # Arrays live 3-D (B·H, T, d): carrying a leading length-1 dim through
    # the scan measurably degrades XLA's program for the autodiff side
    # (~30 vs ~18 ms/iter, reshape-in-body fusion) — measured round 4.
    q = jax.random.normal(kq, (BH, T, D), jnp.bfloat16)
    k = jax.random.normal(kk, (BH, T, D), jnp.bfloat16)
    v = jax.random.normal(kv, (BH, T, D), jnp.bfloat16)
    scale = D**-0.5

    def _timed(loss_fn):
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

        def body(carry, _):
            q, k, v = carry
            dq, _, _ = grad_fn(q, k, v)
            return (q + 1e-12 * dq.astype(q.dtype), k, v), None

        @jax.jit
        def run(q, k, v):
            (q, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=ITERS)
            return jnp.sum(q.astype(jnp.float32))

        return _timed_dispatch(lambda: run(q, k, v), ITERS) * 1e3

    def _xla_autodiff(q, k, v):
        # the idiomatic XLA formulation (autodiff backward, heads flattened
        # into the batch dim), NOT the flash fallback's recompute-based
        # VJP — that would flatter the ratio
        s = jnp.einsum(
            "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bqk,bkd->bqd", p, v)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def _flash(q, k, v):
        o = flash_attention(*(t.reshape(1, BH, T, D) for t in (q, k, v)))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    flash_ms = _timed(_flash)
    xla_ms = _timed(_xla_autodiff)
    return {
        "flash_t4096_bf16_fwdbwd_ms": round(flash_ms, 3),
        "xla_attn_t4096_bf16_fwdbwd_ms": round(xla_ms, 3),
        "flash_vs_xla_t4096_bf16": round(xla_ms / flash_ms, 3),
    }


def main() -> None:
    import jax as _jax

    from vit_tpu.hardware import enable_compilation_cache

    if _jax.default_backend() == "tpu":
        _jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout masks
    # Production default: persistent executable cache. Steady-state numbers
    # are unaffected (they amortize inside dispatches after a warm call);
    # the sweep wall-clock metric includes compile, so BASELINE.md records
    # its cold and warm readings separately.
    enable_compilation_cache()

    setup_log = io.StringIO()
    with contextlib.redirect_stdout(setup_log):
        # headline: production fast path (10 epochs per dispatch)
        (state, data_dev, perm, frozen_vec, batch, train_epoch, train_step,
         eval_step, steps_per_epoch, _) = build("32", n_epochs=EPOCHS_PER_DISPATCH)
        ips_block, _ = bench_fused(
            state, data_dev, perm, frozen_vec, train_epoch, steps_per_epoch,
            n_epochs=EPOCHS_PER_DISPATCH,
        )
        # extras: single-epoch fused, per-step, eval p50, bf16, image family
        (state1, data1, perm1, _, batch1, epoch1, step1, eval1, spe1,
         bundle1) = build("32")
        ips_fused, state1 = bench_fused(state1, data1, perm1, None, epoch1, spe1)
        ips_step, state1 = bench_per_step(state1, batch1, step1, spe1)
        eval_p50_ms = bench_eval(state1, batch1, eval1)
        eval_dev_ms = bench_eval_on_device(state1, batch1, bundle1)

        (state3, data3, perm3, _, _, epoch3, _, _, spe3, _) = build("bf16")
        ips_bf16, _ = bench_fused(state3, data3, perm3, None, epoch3, spe3)

        image_metrics = bench_image_family()
        image_metrics.update(bench_serving())
        image_metrics.update(bench_flash_longctx())
        image_metrics.update(bench_longctx_train())
        lr_sweep_wall_s = bench_lr_sweep()
    print(setup_log.getvalue(), file=sys.stderr)

    import jax

    value = ips_block
    result = {
        "metric": "ViT baseline train images/sec/chip (fp32, whole-run 40-epoch fused dispatch)",
        "value": round(value, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / A100_TORCH_EST_IPS, 3),
        "extras": {
            "train_ips_fused_single_epoch": round(ips_fused, 1),
            "train_ips_per_step_path": round(ips_step, 1),
            "train_ips_bf16_fused": round(ips_bf16, 1),
            "eval_step_p50_ms": round(eval_p50_ms, 3),
            "eval_step_on_device_ms": round(eval_dev_ms, 4),
            "lr_sweep_7x4ep_wall_s": round(lr_sweep_wall_s, 1),
            "batch_size": BATCH,
            "n_train": N_TRAIN,
            "epochs_per_dispatch": EPOCHS_PER_DISPATCH,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "baseline_note": (
                f"vs estimated A100 torch {A100_TORCH_EST_IPS:.0f} img/s "
                "(BASELINE.md; anchored by measured torch-CPU datapoint)"
            ),
            **image_metrics,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
