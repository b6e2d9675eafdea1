"""Parallel LR + scheduler grid search as vmapped TPU replicas.

CLI/artifact parity with `/root/reference/src/opt/parallel_sweep.py`
(``ParallelSweepRunner``, ``SweepConfig``, ``SweepResult``, the
``summary.yaml`` / ``best_config.yaml`` schema consumed by
``launch.sh lr``), re-architected for TPU:

The reference runs one *process per GPU*, each training the full model
independently (`parallel_sweep.py:371-420,689-690`). Here the whole grid
trains in ONE launch: per-replica parameters/optimizer states are stacked
on a leading replica axis, the train/eval steps are ``jax.vmap``-ed over
it, and the replica axis is sharded over the mesh ``data`` axis — one
hyperparameter combo per TPU core (the north-star contract), with the
batch broadcast to every replica.

Scheduler handling: the per-replica learning rate is a host-computed
vector ``base_lr_r * sched_scale_r(epoch) * plateau_scale_r`` refreshed
each epoch (cosine closed-form; plateau via R independent host
controllers), injected into the vmapped optimizer — schedules that differ
*structurally* across replicas never enter the compiled graph, so one
compile covers the whole grid.

Semantics preserved per trial: seed = ``seed + idx`` for init/noise
streams; per-replica early stopping (sweep patience 100, reference
`vit.py:364-365`) freezes a stopped replica's state in-graph via a 0/1
active mask (and ends the epoch loop once every replica stopped);
per-trial failures (non-finite metrics, i.e. divergence) surface as
``status='error'`` without aborting the sweep, and a mid-sweep exception
marks only the still-active replicas failed while completed results are
kept (reference `parallel_sweep.py:193-209`); ``duration_sec`` is the
per-replica wall-clock from sweep start until that replica stopped
(early-stop/divergence) or the sweep ended; best = the replica's last
computed metric (the reference reads ``trainer.callback_metrics`` after
fit); data order = per-replica shuffle streams seeded ``seed + idx``
(reference `parallel_sweep.py:155` ``seed_everything(seed + idx)`` gives
each trial an independent shuffle) — each replica gathers its own
permutation on-read inside its scan, so no stacked per-replica epoch
array is ever materialized.
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
import math
import os
import sys
import time
from datetime import datetime
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

__all__ = ["SweepConfig", "SweepResult", "ParallelSweepRunner"]

DEFAULT_LRS = [1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2]


@dataclasses.dataclass
class SweepConfig:
    idx: int
    lr: float
    scheduler: Optional[str] = None
    factor: Optional[float] = None
    patience: Optional[int] = None
    T_max: Optional[int] = None
    eta_min: Optional[float] = None

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in dataclasses.asdict(self).items() if v is not None}

    def to_opt_config(self) -> Dict[str, Any]:
        opt: Dict[str, Any] = {"lr": self.lr}
        if self.scheduler and self.scheduler != "none":
            opt["lr_sch"] = self.scheduler
            if self.scheduler == "plateau":
                if self.factor is not None:
                    opt["factor"] = self.factor
                if self.patience is not None:
                    opt["patience"] = self.patience
            elif self.scheduler == "cosine":
                if self.T_max is not None:
                    opt["T_max"] = self.T_max
                if self.eta_min is not None:
                    opt["eta_min"] = self.eta_min
        return opt


@dataclasses.dataclass
class SweepResult:
    config: SweepConfig
    metric: Optional[float]
    duration_sec: float
    status: str = "ok"
    message: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "config": self.config.to_dict(),
            "metric": self.metric,
            "duration_sec": self.duration_sec,
            "status": self.status,
            "message": self.message,
        }


def _replica_devices(n_replicas: int, n_devices: int) -> int:
    """Largest divisor of the replica count that fits the device count.

    One replica per core when R <= n_devices (the "one combo per TPU core"
    contract, SURVEY §2.8); gcd would collapse e.g. the flagship 7-LR grid
    on 8 cores to a single device.
    """
    return max(d for d in range(1, min(n_replicas, n_devices) + 1)
               if n_replicas % d == 0)


def _cosine_scale(epoch: int, t_max: int, eta_ratio: float) -> float:
    # torch CosineAnnealingLR is periodic past T_max (no clamp).
    return eta_ratio + (1.0 - eta_ratio) * 0.5 * (1 + math.cos(math.pi * epoch / t_max))


def sweep_epoch_scales(
    configs: List[SweepConfig],
    epoch: int,
    warmup_epochs: int,
    plateau_scales: Dict[int, float],
    max_epochs: int,
) -> np.ndarray:
    """Per-replica LR scale at ``epoch``.

    Composes the SAME linear-warmup prefix the real training step applies
    (``schedule_scale``, train/optim.py: 0.1-start ramp, main scheduler
    clock starts after warmup) with the trial's scheduler and the host
    plateau scale — the reference sweeps full ``Experiment``s, so every
    trial's LR curve includes warmup
    (`/root/reference/src/opt/optimizer.py:117-144`). An LR selected
    without warmup on a config that trains *with* warmup would be tuned
    for the wrong dynamics.
    """
    scales = np.ones(len(configs), np.float32)
    warm = int(warmup_epochs or 0)
    for i, c in enumerate(configs):
        if warm > 0 and epoch < warm:
            s = 0.1 + 0.9 * min(epoch / warm, 1.0)
        elif c.scheduler == "cosine":
            t_max = int(c.T_max or max_epochs)
            eta_ratio = (c.eta_min or 0.0) / c.lr if c.lr else 0.0
            s = _cosine_scale(max(epoch - warm, 0), t_max, eta_ratio)
        else:
            s = 1.0
        if c.scheduler == "plateau":
            s *= plateau_scales.get(i, 1.0)
        scales[i] = s
    return scales


class _SequentialSweepEngine:
    """Sequential-fidelity fallback: one full :class:`Experiment` per trial.

    The vmapped engine substitutes dynamics it cannot nest inside the
    replica vmap (``attn_impl: ring`` -> xla, ``pipeline_parallel`` -> 1)
    — deterministically identical math, but the dropout STREAMS differ, so
    the lr/scheduler it selects was never validated on the dynamics the
    final run trains. This engine trains each trial UNSUBSTITUTED, one at
    a time (ring shard_maps the sequence, the pipeline shard_maps stages —
    exactly as the final run will), and emits the same ``summary.yaml`` /
    ``best_config.yaml`` artifacts. Slower by ~R x; use it when the config
    uses ring/pipeline parallelism and fidelity matters more than
    wall-clock. Reference artifact contract:
    `/root/reference/src/opt/parallel_sweep.py:371-420` (the reference is
    sequential-per-process too).

    Per-trial semantics match the vmapped engine: seed = ``seed + idx``
    (independent init/noise/shuffle streams), per-trial divergence or
    exception -> ``status='error'`` without aborting the sweep, metric =
    the trial's last computed monitor value.
    """

    def __init__(self, base_config: dict, configs: List[SweepConfig],
                 metric_name: str, metric_goal: str, seed: int,
                 skip_test: bool = True):
        self.base_config = base_config
        self.configs = configs
        self.metric_name = metric_name
        self.metric_goal = metric_goal
        self.seed = seed
        self.skip_test = skip_test

    def run(self) -> List[SweepResult]:
        from vit_tpu.train.loop import Experiment

        results: List[SweepResult] = []
        for c in self.configs:
            cfg = copy.deepcopy(self.base_config)
            cfg.setdefault("train", {})["save"] = False
            cfg.setdefault("project", "vit-opt-sweep")
            (cfg.setdefault("viz", {}))["enable"] = False
            cfg.setdefault("opt", {}).update(c.to_opt_config())
            t0 = time.perf_counter()
            try:
                exp = Experiment(cfg, seed=self.seed + c.idx)
                metrics = exp.fit()
                metric = metrics.get(self.metric_name)
                metric = float(metric) if metric is not None else None
                status, msg = "ok", None
                if metric is None or not math.isfinite(metric):
                    status, msg = "error", (
                        f"{self.metric_name} is "
                        f"{'missing' if metric is None else 'non-finite'}"
                    )
            except Exception as e:  # isolate per-trial failures
                metric, status, msg = None, "error", f"{type(e).__name__}: {e}"
            results.append(SweepResult(
                config=c, metric=metric,
                duration_sec=time.perf_counter() - t0,
                status=status, message=msg,
            ))
        return results


class _VmapSweepEngine:
    """Train every SweepConfig simultaneously as vmapped replicas."""

    def __init__(self, base_config: dict, configs: List[SweepConfig],
                 metric_name: str, metric_goal: str, seed: int,
                 skip_test: bool = True):
        self.base_config = base_config
        self.configs = configs
        self.metric_name = metric_name
        self.metric_goal = metric_goal
        self.seed = seed
        self.skip_test = skip_test

    def run(self) -> List[SweepResult]:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_tpu.data.datasets import SpecDataModule
        from vit_tpu.data.pipeline import Batcher, epoch_permutation, prefetch_to_device
        from vit_tpu.models.builder import get_model
        from vit_tpu.models.vit import compute_loss
        from vit_tpu.parallel.mesh import make_mesh
        from vit_tpu.train.loop import (
            TrainState,
            _mask_preprocessor,
            make_train_forward,
        )
        from vit_tpu.train.metrics import regression_metrics, classification_metrics
        from vit_tpu.train.optim import (
            OptSpec,
            PlateauScheduler,
            build_optimizer,
            set_learning_rate,
        )
        from vit_tpu.utils import seed_everything

        t_start = time.perf_counter()
        cfg = copy.deepcopy(self.base_config)
        cfg.setdefault("train", {}).setdefault("save", False)
        cfg.setdefault("project", "vit-opt-sweep")
        (cfg.setdefault("viz", {}))["enable"] = False  # reference `:150-152`
        if (cfg.get("model", {}) or {}).get("attn_impl") == "ring":
            # Ring attention shard_maps over the mesh the replicas are
            # vmapped across; sweep with the xla kernel instead. The two
            # are deterministically identical (tests/test_ring_attention.py),
            # but with attention dropout active the mask STREAMS differ
            # (in-ring global hash offsets vs HashDropout coords), so swept
            # dynamics are statistically — not bit — equivalent to the
            # final ring run.
            print("[sweep] attn_impl: ring -> xla for the vmapped sweep "
                  "(identical math deterministically; dropout mask streams "
                  "differ; the final run trains with ring)")
            cfg["model"]["attn_impl"] = "xla"
        if int((cfg.get("train", {}) or {}).get("pipeline_parallel", 1) or 1) > 1:
            # Same reasoning as ring: the GPipe shard_map can't nest inside
            # the replica vmap; replicas train the identical math unstaged
            # (deterministically equal; dropout streams differ under PP).
            print("[sweep] train.pipeline_parallel -> 1 for the vmapped "
                  "sweep (identical math; the final run trains pipelined)")
            cfg["train"]["pipeline_parallel"] = 1
        seed_everything(self.seed)

        bundle = get_model(cfg)
        task = bundle.vit_config.task_type
        # Same datamodule dispatch as Experiment (loop.py): the reference
        # engine sweeps anything Experiment accepts
        # (`/root/reference/src/opt/parallel_sweep.py:150-164`).
        if bundle.vit_config.input_kind == "image":
            from vit_tpu.data.images import ImageDataModule

            dm = ImageDataModule.from_config(cfg)
        else:
            dm = SpecDataModule.from_config(cfg)
        dm.setup("fit")
        if dm.val is None or len(dm.val) == 0:
            raise RuntimeError("LR sweep requires a validation set (data.val_path)")

        R = len(self.configs)
        train_cfg = cfg.get("train", {}) or {}
        batch_size = int(train_cfg.get("batch_size", 64))
        max_epochs = int(train_cfg.get("ep", 10))
        noise_level = float((cfg.get("noise", {}) or {}).get("noise_level", 0) or 0)
        steps_per_epoch = max(1, -(-len(dm.train) // batch_size))

        # Mesh: replica axis over _replica_devices(R, n_dev) cores.
        n_dev = len(jax.devices())
        dp = _replica_devices(R, n_dev)
        mesh = make_mesh(num_devices=max(1, dp))
        rep_shard = NamedSharding(mesh, P("data"))  # replica axis sharded
        repl = NamedSharding(mesh, P())

        # Per-replica init (seed + idx parity with `parallel_sweep.py:155`).
        module = bundle.module
        sample = dm.train.model_input
        dummy = jnp.zeros((1,) + tuple(sample.shape[1:]), jnp.float32)
        init_keys = jnp.stack(
            [jax.random.PRNGKey(self.seed + c.idx) for c in self.configs]
        )
        params_r = jax.jit(
            jax.vmap(lambda k: module.init(k, dummy)["params"]),
            out_shardings=rep_shard,
        )(init_keys)

        # The FULL OptSpec Experiment would resolve (weight decay, grad
        # clip, optimizer family — every opt field, not a hand-picked
        # subset), with the trial-varied pieces neutralized: lr=1.0 (the
        # per-replica LR vector is injected at runtime) and scheduler=None
        # (per-replica schedules + warmup are host-computed in
        # ``sweep_epoch_scales``). lr_sch is stripped BEFORE resolution so
        # a base-config onecycle can't zero the warmup the trials train
        # with.
        cfg_for_spec = copy.deepcopy(cfg)
        (cfg_for_spec.get("opt", {}) or {}).pop("lr_sch", None)
        spec = OptSpec.from_config(
            cfg_for_spec, steps_per_epoch,
            monitor_metric=self.metric_name, has_val=True,
        )
        spec = dataclasses.replace(
            spec, lr=1.0, scheduler=None, total_epochs=max_epochs
        )
        warmup_epochs = int(spec.warmup_epochs or 0)
        tx = build_optimizer(spec)
        opt_state_r = jax.jit(jax.vmap(tx.init), out_shardings=rep_shard)(params_r)

        state = TrainState(
            step=jnp.zeros((R,), jnp.int32),
            params=params_r,
            opt_state=opt_state_r,
            rng=jnp.stack([jax.random.PRNGKey(10_000 + self.seed + c.idx) for c in self.configs]),
            plateau_scale=jnp.ones((R,), jnp.float32),
            frozen=jnp.zeros((R,), jnp.float32),
        )
        state = jax.device_put(state, rep_shard)
        loss_name = bundle.loss_name
        has_preproc = bundle.has_preprocessor

        def frozen_flag(epoch: int) -> float:
            """Experiment._frozen_flag semantics (`prepca/callbacks.py:31-62`):
            -1 permanent freeze; >0 freeze the first N epochs; 0 never."""
            fe = bundle.freeze_epochs
            if not has_preproc or fe == 0:
                return 0.0
            return 1.0 if (fe == -1 or epoch < fe) else 0.0

        # Same training objective as Experiment (loop.py::make_train_forward):
        # for MoE configs this collects the sown Switch load-balance aux loss —
        # without it the swept dynamics would train a different objective than
        # the final run (and the top-1 router would get no gradient at all).
        train_forward, moe_aux_w = make_train_forward(bundle)

        def one_step(state: TrainState, batch, lr):
            rng, noise_rng, dropout_rng = jax.random.split(state.rng, 3)
            x = batch["x"]
            if noise_level > 0 and "error" in batch:
                x = x + jax.random.normal(noise_rng, x.shape, x.dtype) * batch["error"] * noise_level

            def loss_fn(p):
                out = train_forward(p, x, dropout_rng)
                logits, aux = out if isinstance(out, tuple) else (out, 0.0)
                return (
                    compute_loss(logits, batch["label"], task, loss_name)
                    + moe_aux_w * aux
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            if has_preproc:
                # Same freeze semantics as the real training step
                # (loop.py::_mask_preprocessor): the selected LR/scheduler
                # must be tuned for the dynamics Experiment will actually run.
                grads = _mask_preprocessor(grads, 1.0 - state.frozen)
            opt_state = set_learning_rate(state.opt_state, lr)
            updates, opt_state = tx.update(grads, opt_state, state.params)
            if has_preproc:
                updates = _mask_preprocessor(updates, 1.0 - state.frozen)
            params = jax.tree_util.tree_map(lambda p, u: p + u.astype(p.dtype), state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params, opt_state=opt_state, rng=rng),
                loss,
            )

        def replica_epoch(state: TrainState, data, perm, lr, active):
            """One replica's whole epoch: lax.scan over its OWN batch order.

            ``perm`` is this replica's flat index vector (seeded
            ``seed + idx + epoch`` — per-trial shuffles, reference
            `parallel_sweep.py:155`); each step gathers its 64 rows
            on-read so the stacked (steps, batch, ...) epoch array is
            never materialized (the same gather-on-read the fused epoch
            uses, loop.py::make_train_epoch).

            ``active`` (0/1) freezes early-stopped/diverged replicas: the
            epoch runs (vmap has no per-lane skip) but the state is held —
            the reference analogue is a finished trial idling its process.
            """
            idx = perm.reshape(steps_per_epoch, batch_size)

            def body(st, ib):
                batch = {k: jnp.take(v, ib, axis=0) for k, v in data.items()}
                new_st, loss = one_step(st, batch, lr)
                held = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(active > 0, n, o), new_st, st
                )
                return held, loss

            state, losses = jax.lax.scan(body, state, idx)
            return state, losses

        def all_replicas_epoch(state, data, perm_r, lrs, active):
            # perm_r: (R, steps*batch) — one independent shuffle per replica.
            return jax.vmap(replica_epoch, in_axes=(0, None, 0, 0, 0))(
                state, data, perm_r, lrs, active
            )

        # The whole grid trains one full epoch in ONE dispatch: vmap over
        # replicas x scan over steps (the per-step RPC round-trip dominates
        # wall-clock in tunneled deployments).
        vepoch = jax.jit(
            all_replicas_epoch,
            donate_argnums=(0,),
            in_shardings=(rep_shard, repl, rep_shard, rep_shard, rep_shard),
            out_shardings=(rep_shard, rep_shard),
        )
        veval = jax.jit(
            jax.vmap(
                lambda p, b: module.apply({"params": p}, b["x"], deterministic=True),
                in_axes=(0, None),
            ),
            in_shardings=(rep_shard, repl),
            out_shardings=repl,
        )

        # Host-side per-replica schedule state.
        base_lrs = np.asarray([c.lr for c in self.configs], np.float32)
        mode = "min" if self.metric_goal == "minimize" else "max"
        # Resolve the ranking metric against what the task actually produces
        # BEFORE building the schedulers — a missing key would otherwise read
        # as NaN and deactivate every replica as 'diverged'.
        metric_key = self.metric_name.replace("val_", "")
        available = ("acc",) if task == "cls" else ("mae", "mse", "r2")
        if metric_key not in available:
            if task == "cls" and metric_key == "mae":
                # CLI default on a classification config: follow the task
                # monitor like Experiment does (acc, maximized).
                print("[sweep] metric val_mae unavailable for cls; "
                      "ranking by val_acc (maximize)")
                metric_key, mode = "acc", "max"
            else:
                raise ValueError(
                    f"metric '{self.metric_name}' is not produced by task "
                    f"'{task}' (available: "
                    f"{', '.join('val_' + a for a in available)})"
                )
        plateaus = {
            i: PlateauScheduler(c.factor or 0.1, c.patience or 10, mode=mode)
            for i, c in enumerate(self.configs)
            if c.scheduler == "plateau"
        }

        def epoch_lrs(epoch: int) -> np.ndarray:
            return base_lrs * sweep_epoch_scales(
                self.configs, epoch, warmup_epochs,
                {i: p.scale for i, p in plateaus.items()}, max_epochs,
            )

        # 'error' is only read by noise injection — shipping (and
        # permutation-gathering, every epoch) a dead 164 MB column at
        # noise_level=0 costs real bandwidth.
        need = ("x", "error", "label") if noise_level > 0 else ("x", "label")
        train_cols = {
            k: v for k, v in dm.train.arrays().items() if k in need
        }
        train_data_dev = jax.device_put(train_cols, repl)
        n_train = len(dm.train)
        # x/label only — flux/error never cross to device for eval
        val_arrays = {
            k: v for k, v in dm.val.arrays().items() if k in ("x", "label")
        }
        vbs = min(batch_size, len(dm.val))

        # Per-replica host controllers (reference: each trial is an
        # independent Experiment with sweep patience 100, `vit.py:364-365`).
        from vit_tpu.train.optim import EarlyStopping

        early = [EarlyStopping(patience=100, mode=mode) for _ in range(R)]
        last_metrics = np.full(R, np.nan, np.float64)
        active = np.ones(R, np.float32)
        statuses = ["ok"] * R
        messages: List[Optional[str]] = [None] * R
        durations = np.zeros(R, np.float64)

        dispatch_failed = False

        def _deactivate(i: int, status: str, message: Optional[str]) -> None:
            active[i] = 0.0
            statuses[i] = status
            messages[i] = message
            durations[i] = time.perf_counter() - t_start

        # Preemption safety (same contract as Experiment.fit): the first
        # SIGTERM stops the sweep at the next epoch boundary and the
        # summary/best artifacts are written from the epochs that completed.
        # Tests inject a pre-triggered guard via ``self.preempt_guard``.
        from vit_tpu.train.preempt import PreemptionGuard

        guard = getattr(self, "preempt_guard", None)
        if guard is None:
            guard = PreemptionGuard(
                enabled=bool(train_cfg.get("handle_preemption", True))
            )
        guard.install()
        try:
            for epoch in range(max_epochs):
                perm = jax.device_put(
                    np.stack([
                        epoch_permutation(n_train, batch_size,
                                          steps_per_epoch,
                                          self.seed + c.idx, epoch)
                        for c in self.configs
                    ]),
                    rep_shard,
                )
                lrs = jax.device_put(jnp.asarray(epoch_lrs(epoch)), rep_shard)
                active_dev = jax.device_put(jnp.asarray(active), rep_shard)
                if has_preproc:
                    state = state.replace(frozen=jax.device_put(
                        jnp.full((R,), frozen_flag(epoch), jnp.float32), rep_shard
                    ))
                state, _losses = vepoch(state, train_data_dev, perm, lrs, active_dev)
                # per-replica validation
                vb = Batcher(val_arrays, vbs, eval_mode=True)
                logits_all, labels_all = [], []
                for batch in prefetch_to_device(iter(vb), sharding=repl):
                    logits = veval(state.params, batch)  # (R, B, K)
                    m = np.asarray(jax.device_get(batch["mask"]))
                    logits_all.append(np.asarray(jax.device_get(logits))[:, m])
                    labels_all.append(np.asarray(jax.device_get(batch["label"]))[m])
                logits_cat = np.concatenate(logits_all, axis=1)  # (R, N, K)
                labels_cat = np.concatenate(labels_all, axis=0)  # (N, K)
                for i in range(R):
                    if active[i] == 0.0:
                        continue  # frozen state: metric cannot change
                    if task == "cls":
                        m = classification_metrics(logits_cat[i], labels_cat)
                    else:
                        m = regression_metrics(logits_cat[i], labels_cat)
                    last_metrics[i] = m.get(metric_key, np.nan)
                    if not math.isfinite(float(last_metrics[i])):
                        _deactivate(i, "error", "non-finite metric (diverged)")
                        continue
                    if i in plateaus:
                        plateaus[i].step(float(last_metrics[i]))
                    if early[i].step(float(last_metrics[i])):
                        _deactivate(i, "ok", f"early-stopped at epoch {epoch}")
                finite = np.where(np.isfinite(last_metrics), last_metrics, np.nan)
                if not np.all(np.isnan(finite)):
                    best_i = int(
                        np.nanargmin(finite) if mode == "min" else np.nanargmax(finite)
                    )
                    print(
                        f"[sweep] epoch {epoch}: {self.metric_name} "
                        f"min={np.nanmin(finite):.5f} max={np.nanmax(finite):.5f} "
                        f"best=replica {best_i} (lr={self.configs[best_i].lr:.1e}) "
                        f"active={int(active.sum())}/{R}",
                        flush=True,
                    )
                if not active.any():
                    print(f"[sweep] all replicas stopped at epoch {epoch}")
                    break
                if guard.triggered:
                    for i in range(R):
                        if active[i] > 0:
                            _deactivate(i, "ok",
                                        f"preemption stop at epoch {epoch}")
                    print(f"[sweep] preemption stop at epoch {epoch} — "
                          "writing artifacts from completed epochs")
                    break
        except Exception as e:  # noqa: BLE001 — per-trial isolation
            # Completed/stopped replicas keep their results; only the
            # still-active ones become errors (reference isolates any
            # per-trial exception without killing the pool). The state may
            # have been donated/poisoned by the failed dispatch, so the
            # optional test eval below must be skipped too.
            dispatch_failed = True
            print(f"[sweep] epoch dispatch failed: {e}")
            for i in range(R):
                if active[i] > 0:
                    _deactivate(i, "error", f"{type(e).__name__}: {e}")
        finally:
            guard.uninstall()

        # Optional per-replica test evaluation (reference --run-test; test
        # metrics are reported, never used for selection). Diverged replicas
        # are skipped — their params are NaN.
        test_msgs: List[Optional[str]] = [None] * R
        if not self.skip_test and not dispatch_failed and any(s == "ok" for s in statuses):
            dm.setup("test")
            if dm.test is not None and len(dm.test) > 0:
                tb = Batcher(dm.test.arrays(), min(batch_size, len(dm.test)), eval_mode=True)
                logits_all, labels_all = [], []
                for batch in prefetch_to_device(iter(tb), sharding=repl):
                    logits = veval(state.params, batch)
                    m = np.asarray(jax.device_get(batch["mask"]))
                    logits_all.append(np.asarray(jax.device_get(logits))[:, m])
                    labels_all.append(np.asarray(jax.device_get(batch["label"]))[m])
                tl = np.concatenate(logits_all, axis=1)
                tlab = np.concatenate(labels_all, axis=0)
                for i in range(R):
                    if statuses[i] != "ok":
                        continue
                    mm = (classification_metrics(tl[i], tlab) if task == "cls"
                          else regression_metrics(tl[i], tlab))
                    test_msgs[i] = f"test_{metric_key}={mm.get(metric_key, float('nan')):.6f}"

        wall = time.perf_counter() - t_start
        results = []
        for i, c in enumerate(self.configs):
            v = float(last_metrics[i])
            ok = statuses[i] == "ok" and math.isfinite(v)
            msg = messages[i]
            if ok and test_msgs[i]:
                msg = f"{msg}; {test_msgs[i]}" if msg else test_msgs[i]
            results.append(
                SweepResult(
                    config=c,
                    metric=v if math.isfinite(v) else None,
                    duration_sec=float(durations[i]) if durations[i] > 0 else wall,
                    status="ok" if ok else "error",
                    message=msg,
                )
            )
        return results


class ParallelSweepRunner:
    """Grid construction, execution, and summary/best-config artifacts."""

    def __init__(
        self,
        base_config_path: str,
        lr_values: Optional[List[float]] = None,
        schedulers: Optional[List[str]] = None,
        plateau_factors: Optional[List[float]] = None,
        plateau_patience: Optional[List[int]] = None,
        cosine_T_max: Optional[int] = None,
        cosine_eta_min: Optional[float] = None,
        metric_name: str = "val_mae",
        metric_goal: str = "minimize",
        results_dir: Optional[str] = None,
        gpu_ids: Optional[List[int]] = None,
        seed: int = 42,
        skip_test: bool = True,
        engine: str = "vmap",
    ) -> None:
        from vit_tpu.config import load_config
        from vit_tpu.hardware import enable_compilation_cache

        if engine not in ("vmap", "sequential"):
            raise ValueError(
                f"engine must be 'vmap' or 'sequential', got {engine!r}"
            )
        self.base_config_path = base_config_path
        self.base_config = load_config(base_config_path)
        # The vmapped sweep program is the most expensive compile in the
        # repo (7-replica stacked train step) — cache it across launches.
        enable_compilation_cache(self.base_config)
        self.lr_values = [float(x) for x in (lr_values or DEFAULT_LRS)]
        self.schedulers = list(schedulers or ["none"])
        self.plateau_factors = [float(x) for x in (plateau_factors or [0.8])]
        self.plateau_patience = [int(x) for x in (plateau_patience or [10])]
        self.cosine_T_max = cosine_T_max or int(
            (self.base_config.get("train", {}) or {}).get("ep", 10)
        )
        self.cosine_eta_min = cosine_eta_min if cosine_eta_min is not None else 1e-7
        self.metric_name = metric_name
        self.metric_goal = metric_goal
        self.gpu_ids = gpu_ids or list(range(8))
        self.seed = seed
        self.skip_test = skip_test
        self.engine = engine

        results_root = results_dir or "./opt_runs"
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.run_dir = os.path.join(results_root, f"parallel_sweep_{stamp}")
        self.summary_path = os.path.join(self.run_dir, "summary.yaml")
        self.best_config_path = os.path.join(self.run_dir, "best_config.yaml")
        self.sweep_configs = self._build_sweep_configs()

    def _build_sweep_configs(self) -> List[SweepConfig]:
        configs: List[SweepConfig] = []
        idx = 0
        for lr in self.lr_values:
            for scheduler in self.schedulers:
                if scheduler == "plateau":
                    for factor in self.plateau_factors:
                        for patience in self.plateau_patience:
                            configs.append(SweepConfig(idx, lr, "plateau", factor, patience))
                            idx += 1
                elif scheduler == "cosine":
                    configs.append(
                        SweepConfig(idx, lr, "cosine",
                                    T_max=self.cosine_T_max, eta_min=self.cosine_eta_min)
                    )
                    idx += 1
                else:
                    configs.append(
                        SweepConfig(idx, lr, scheduler if scheduler != "none" else None)
                    )
                    idx += 1
        return configs

    def run(self, dry_run: bool = False) -> Optional[SweepResult]:
        kind = (
            "vmapped TPU replicas" if self.engine == "vmap"
            else "sequential full-fidelity trials"
        )
        print("=" * 62)
        print(f"Parallel LR sweep ({kind}): {len(self.sweep_configs)} configs")
        print(f"  base config : {self.base_config_path}")
        print(f"  metric      : {self.metric_name} ({self.metric_goal})")
        print(f"  lr values   : {self.lr_values}")
        print(f"  schedulers  : {self.schedulers}")
        print("=" * 62)
        if dry_run:
            print("\n[Dry run] Would execute the following configurations:")
            for cfg in self.sweep_configs[:10]:
                print(f"  {cfg.to_dict()}")
            if len(self.sweep_configs) > 10:
                print(f"  ... and {len(self.sweep_configs) - 10} more")
            return None

        os.makedirs(self.run_dir, exist_ok=True)
        engine_cls = (
            _VmapSweepEngine if self.engine == "vmap" else _SequentialSweepEngine
        )
        engine = engine_cls(
            self.base_config, self.sweep_configs, self.metric_name,
            self.metric_goal, self.seed, skip_test=self.skip_test,
        )
        results = engine.run()
        for i, r in enumerate(results):
            self._print_progress(r, i + 1, len(results))
        best = self._select_best(results)
        self._write_summary(results, best)
        self._write_best_config(best)
        self._print_footer(best)
        return best

    def _print_progress(self, result: SweepResult, completed: int, total: int) -> None:
        cfg_str = f"lr={result.config.lr:.1e}"
        if result.config.scheduler:
            cfg_str += f" sch={result.config.scheduler}"
            if result.config.scheduler == "plateau":
                cfg_str += f" f={result.config.factor} p={result.config.patience}"
        metric_str = f"{result.metric:.6f}" if result.metric is not None else "N/A"
        icon = "ok" if result.status == "ok" else "XX"
        print(f"[{completed:3d}/{total:3d}] {icon} {cfg_str:40s} | "
              f"{self.metric_name}={metric_str:10s} | {result.duration_sec:5.1f}s")
        if result.message:
            print(f"    -> {result.message}")

    def _print_footer(self, best: SweepResult) -> None:
        print("\n" + "=" * 62)
        print("Sweep finished!")
        print("\nBest configuration:")
        print(f"  LR          : {best.config.lr:.6f}")
        if best.config.scheduler:
            print(f"  Scheduler   : {best.config.scheduler}")
            if best.config.scheduler == "plateau":
                print(f"  Factor      : {best.config.factor}")
                print(f"  Patience    : {best.config.patience}")
            elif best.config.scheduler == "cosine":
                print(f"  T_max       : {best.config.T_max}")
                print(f"  eta_min     : {best.config.eta_min}")
        print(f"  {self.metric_name:11s}: {best.metric:.6f}")
        print(f"\nSummary  : {self.summary_path}")
        print(f"Best cfg : {self.best_config_path}")
        print("=" * 62)

    def _select_best(self, results: List[SweepResult]) -> SweepResult:
        valid = [
            r for r in results
            if r.status == "ok" and r.metric is not None and math.isfinite(r.metric)
        ]
        if not valid:
            raise RuntimeError("All trials failed. Check logs above for details.")
        reverse = self.metric_goal == "maximize"
        return sorted(valid, key=lambda r: r.metric, reverse=reverse)[0]

    def _write_summary(self, results: List[SweepResult], best: SweepResult) -> None:
        data = {
            "generated_at": datetime.now().isoformat(),
            "base_config": str(self.base_config_path),
            "metric": {"name": self.metric_name, "goal": self.metric_goal},
            "search_space": {
                "lr_values": self.lr_values,
                "schedulers": self.schedulers,
                "plateau_factors": self.plateau_factors,
                "plateau_patience": self.plateau_patience,
                "cosine_T_max": self.cosine_T_max,
                "cosine_eta_min": self.cosine_eta_min,
            },
            "gpus": self.gpu_ids,
            "engine": self.engine,
            "num_configs": len(self.sweep_configs),
            "results": [r.to_dict() for r in results],
            "best": best.to_dict(),
        }
        with open(self.summary_path, "w", encoding="utf-8") as f:
            yaml.safe_dump(data, f, sort_keys=False, allow_unicode=True)

    def _write_best_config(self, best: SweepResult) -> None:
        best_config = copy.deepcopy(self.base_config)
        best_config.setdefault("opt", {})
        best_config["opt"].update(best.config.to_opt_config())
        best_config.setdefault("_meta", {})
        best_config["_meta"].update({
            "generator": "vit_tpu.opt.parallel_sweep",
            "metric": self.metric_name,
            "goal": self.metric_goal,
            "best_metric": best.metric,
            "search_dir": str(self.run_dir),
            "timestamp": datetime.now().isoformat(),
        })
        with open(self.best_config_path, "w", encoding="utf-8") as f:
            yaml.safe_dump(best_config, f, sort_keys=False, allow_unicode=True)


def _parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Parallel LR sweep (vmapped TPU replicas)")
    parser.add_argument("base_config", help="Path to the base YAML config")
    parser.add_argument("--lr", nargs="+", type=float,
                        help="Learning rate values (default: 1e-5 ... 1e-2)")
    parser.add_argument("--schedulers", nargs="+", choices=["plateau", "cosine", "none"],
                        help="Scheduler types to search (default: none)")
    parser.add_argument("--plateau-factor", nargs="+", type=float,
                        help="Plateau reduction factors (default: 0.8)")
    parser.add_argument("--plateau-patience", nargs="+", type=int,
                        help="Plateau patience values (default: 10)")
    parser.add_argument("--cosine-T-max", type=int, help="Cosine T_max (default: train.ep)")
    parser.add_argument("--cosine-eta-min", type=float, help="Cosine eta_min (default: 1e-7)")
    parser.add_argument("--metric", default="val_mae", help="Monitored metric name")
    parser.add_argument("--goal", choices=("minimize", "maximize"), default="minimize")
    parser.add_argument("--gpus", help="Comma-separated replica ids (count is informational on TPU)")
    parser.add_argument("--results-dir", help="Directory for sweep results (default: ./opt_runs)")
    parser.add_argument("--seed", type=int, default=42, help="Base random seed")
    parser.add_argument("--engine", choices=("vmap", "sequential"),
                        default="vmap",
                        help="vmap: the whole grid as vmapped replicas in "
                             "one compile (fast; substitutes ring->xla and "
                             "unstages the pipeline). sequential: one full "
                             "Experiment per trial, UNSUBSTITUTED dynamics "
                             "(use for ring/pipeline configs when the tuned "
                             "lr must see the real dropout streams)")
    parser.add_argument("--run-test", action="store_true",
                        help="Also execute the test loop after each fit")
    parser.add_argument("--dry-run", action="store_true",
                        help="Only print the sweep plan without training")
    return parser.parse_args()


def main() -> int:
    args = _parse_args()
    gpu_ids = (
        [int(g.strip()) for g in args.gpus.split(",")] if args.gpus else list(range(8))
    )
    runner = ParallelSweepRunner(
        base_config_path=args.base_config,
        lr_values=args.lr,
        schedulers=args.schedulers,
        plateau_factors=args.plateau_factor,
        plateau_patience=args.plateau_patience,
        cosine_T_max=args.cosine_T_max,
        cosine_eta_min=args.cosine_eta_min,
        metric_name=args.metric,
        metric_goal=args.goal,
        results_dir=args.results_dir,
        gpu_ids=gpu_ids,
        seed=args.seed,
        skip_test=not args.run_test,
        engine=args.engine,
    )
    runner.run(dry_run=args.dry_run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
