"""jit-compiled train/eval loop and the Experiment facade.

This is the TPU-native replacement for the reference's Lightning runtime
(`/root/reference/src/basemodule.py:143-251`, `/root/reference/src/vit.py:58-465`):
the inversion-of-control (callbacks/hooks) becomes an explicit host loop
around two compiled functions.

* ``train_step`` — loss (+on-the-fly noise injection, `vit.py:83-92`),
  grads, global-norm clip (0.5 default), optimizer update with the LR
  computed in-graph as ``base_lr * schedule(step) * plateau_scale``
  (plateau decisions are host-side but only change a traced scalar — no
  recompile). Preprocessor freeze (`prepca/callbacks.py` semantics) is a
  0/1 scalar that masks both the gradients entering the optimizer and the
  final updates, so frozen params neither move nor pollute momenta.
* ``eval_step`` — deterministic forward returning fp32 logits; metric
  reduction happens host-side on the mask-selected rows (exact despite
  static-shape padding).
* ``Experiment`` — fit/test with early stopping (patience 500 / sweep 100),
  ReduceLROnPlateau, best/last checkpointing on ``val_<monitor>``, W&B/console
  logging with the reference's metric key names, and ``--ckpt`` resume.

Data parallelism: batches are placed with a ``data``-axis `NamedSharding`
(double-buffered, :func:`vit_tpu.data.pipeline.prefetch_to_device`); params
are replicated; XLA inserts the gradient all-reduce over ICI — the
reference's ``'ddp'`` with zero hand-written communication.
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vit_tpu.data.datasets import RegSpecDataset, SpecDataModule, parse_param_list
from vit_tpu.data.pipeline import Batcher, epoch_permutation, prefetch_to_device
from vit_tpu.models.builder import ModelBundle, get_model
from vit_tpu.models.vit import compute_loss
from vit_tpu.parallel.mesh import (
    active_mesh_scope,
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated_sharding,
)
from vit_tpu.train.checkpoint import CheckpointManager, default_ckpt_dir
from vit_tpu.train.logging import MetricLogger
from vit_tpu.train.metrics import (
    classification_metrics,
    monitor_for_task,
    regression_extras,
    regression_metrics,
)
from vit_tpu.train.optim import (
    EarlyStopping,
    OptSpec,
    PlateauScheduler,
    build_optimizer,
    schedule_scale,
    set_learning_rate,
)
from vit_tpu.utils import count_params, seed_everything

__all__ = ["TrainState", "Experiment", "make_train_step", "make_eval_step"]


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    rng: jnp.ndarray
    plateau_scale: jnp.ndarray  # f32 scalar, host-updated
    frozen: jnp.ndarray  # f32 scalar: 1.0 while the preprocessor is frozen


def _mask_preprocessor(tree: Any, keep: jnp.ndarray) -> Any:
    """Scale every leaf under the top-level 'preprocessor' scope by ``keep``."""

    def mask(path, leaf):
        if path and getattr(path[0], "key", None) == "preprocessor":
            return leaf * keep.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(mask, tree)


def _micro_constraint(batch_sharding_):
    """(sharding, dp_shards) for the (accum, micro_batch, ...) chunk stack:
    keep each micro-batch spread over the DP axis. Without this, contiguous
    chunks map to row ranges living on a subset of shards and GSPMD reshards
    on every micro-step. Applied only when the micro-batch divides the shard
    count (checked at trace time in the grads fn)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not isinstance(batch_sharding_, NamedSharding):
        return None
    axes = [a for a in batch_sharding_.spec if a is not None]
    if not axes:
        return None
    mesh = batch_sharding_.mesh
    dp = 1
    for a in axes:
        names = a if isinstance(a, tuple) else (a,)
        for name in names:
            dp *= mesh.shape[name]
    return NamedSharding(mesh, P(None, *axes)), dp


def make_train_forward(bundle: ModelBundle):
    """Training forward shared by every step builder (Experiment's grads fn,
    the vmapped sweep, ``bench.py``): returns ``(apply_fn, moe_aux_weight)``.

    ``apply_fn(params, x, dropout_rng)`` returns ``logits`` for dense models,
    or ``(logits, reg)`` for MoE models where ``reg`` is the PRE-WEIGHTED
    router regularizer (``moe_aux_weight * Switch-LB + moe_z_weight *
    z-loss``) collected from the ``losses`` collection each router sows into
    (:mod:`vit_tpu.models.moe`). Callers add ``weight * reg`` to the
    training objective with the returned weight (1.0 when any router
    regularizer is on); eval metrics exclude it. Centralized here so the
    sweep and the benchmark train the SAME objective as :class:`Experiment`.
    """
    module = bundle.module
    vc = bundle.vit_config
    is_moe = getattr(vc, "moe_experts", 0) > 1
    aux_w = float(getattr(vc, "moe_aux_weight", 0.0) or 0.0) if is_moe else 0.0
    z_w = float(getattr(vc, "moe_z_weight", 0.0) or 0.0) if is_moe else 0.0
    if aux_w > 0.0 or z_w > 0.0:
        # The returned regularizer is PRE-WEIGHTED (aux_w * LB + z_w * z)
        # so callers add it with weight 1.0 — one contract whether the
        # router sows only `moe_aux` or also `moe_z`.
        def apply_fn(params, x, dropout_rng):
            logits, cols = module.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": dropout_rng}, mutable=["losses"],
            )
            flat, _ = jax.tree_util.tree_flatten_with_path(cols["losses"])
            aux_vals = [
                jnp.mean(v) for p, v in flat
                if "moe_z" not in jax.tree_util.keystr(p)
            ]
            z_vals = [
                jnp.mean(v) for p, v in flat
                if "moe_z" in jax.tree_util.keystr(p)
            ]
            reg = aux_w * (sum(aux_vals) / max(len(aux_vals), 1))
            if z_vals:
                reg = reg + z_w * (sum(z_vals) / len(z_vals))
            return logits, reg

        return apply_fn, 1.0

    def apply_fn(params, x, dropout_rng):
        return module.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": dropout_rng},
        )

    return apply_fn, 0.0


def _make_grads_fn(bundle: ModelBundle, noise_level: float, accum_steps: int = 1,
                   micro_constraint=None, apply_fn=None):
    """(params, batch, noise_rng, dropout_rng) -> (loss, grads), shared by the
    per-step and fused-epoch paths.

    ``accum_steps > 1`` (``train.accumulate_steps``) chunks the optimizer
    batch into micro-batches scanned sequentially, averaging grads/losses —
    the large-batch update with 1/A of the activation memory. Each chunk
    draws its own noise/dropout fold; with stochasticity off the result is
    exactly the unaccumulated large-batch gradient (mean of equal-size chunk
    means).

    ``apply_fn(params, x, dropout_rng) -> logits`` overrides the training
    forward (pipeline parallelism swaps in
    :func:`vit_tpu.parallel.pipeline.apply_pipelined`); the default is the
    monolithic ``module.apply``.
    """
    task = bundle.vit_config.task_type
    loss_name = bundle.loss_name
    default_apply, moe_aux_w = make_train_forward(bundle)
    if apply_fn is None:
        apply_fn = default_apply

    def loss_of(params, batch, noise_rng, dropout_rng):
        x = batch["x"]
        if noise_level > 0 and "error" in batch:
            x = x + jax.random.normal(noise_rng, x.shape, x.dtype) * batch["error"] * noise_level
        out = apply_fn(params, x, dropout_rng)
        logits, aux = out if isinstance(out, tuple) else (out, 0.0)
        return (
            compute_loss(logits, batch["label"], task, loss_name)
            + moe_aux_w * aux
        )

    if accum_steps <= 1:
        def grads_fn(params, batch, noise_rng, dropout_rng):
            return jax.value_and_grad(loss_of)(params, batch, noise_rng, dropout_rng)

        return grads_fn

    def grads_fn(params, batch, noise_rng, dropout_rng):
        b = batch["x"].shape[0]
        if b % accum_steps != 0:
            raise ValueError(
                f"batch {b} not divisible by accumulate_steps {accum_steps}"
            )
        mb = b // accum_steps
        chunks = {
            k: v.reshape((accum_steps, mb) + v.shape[1:]) for k, v in batch.items()
        }
        if micro_constraint is not None and mb % micro_constraint[1] == 0:
            # one up-front reshard; every scanned micro-batch then stays
            # DP-sharded with no per-micro-step collectives
            chunks = jax.lax.with_sharding_constraint(chunks, micro_constraint[0])
        nkeys = jax.random.split(noise_rng, accum_steps)
        dkeys = jax.random.split(dropout_rng, accum_steps)

        def body(carry, xs):
            loss_sum, gsum = carry
            chunk, nk, dk = xs
            loss, grads = jax.value_and_grad(loss_of)(params, chunk, nk, dk)
            gsum = jax.tree_util.tree_map(lambda a, g: a + g, gsum, grads)
            return (loss_sum + loss, gsum), None

        zeros = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        (loss_sum, gsum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros), (chunks, nkeys, dkeys)
        )
        inv = 1.0 / accum_steps
        return loss_sum * inv, jax.tree_util.tree_map(lambda g: g * inv, gsum)

    return grads_fn


def _make_step_body(grads_fn, tx, spec, schedule, has_preproc):
    """The ONE training-step semantics shared by the per-step and fused-epoch
    paths (their equivalence — same data, same update math, identical to
    well under fp-noise — is a package invariant, CLAUDE.md):
    ``(state, batch) -> (new_state, (loss, lr))``."""

    def step_body(state: TrainState, batch):
        rng, noise_rng, dropout_rng = jax.random.split(state.rng, 3)
        loss, grads = grads_fn(state.params, batch, noise_rng, dropout_rng)
        if has_preproc:
            grads = _mask_preprocessor(grads, 1.0 - state.frozen)
        lr = spec.lr * schedule(state.step) * state.plateau_scale
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        if has_preproc:
            updates = _mask_preprocessor(updates, 1.0 - state.frozen)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, (loss, lr)

    return step_body


def make_train_step(
    bundle: ModelBundle,
    tx,
    spec: OptSpec,
    noise_level: float,
    state_sharding=None,
    batch_sharding_=None,
    repl_sharding=None,
    accum_steps: int = 1,
    apply_fn=None,
) -> Callable:
    """Build the jitted training step. Donates the state for in-place HBM reuse.

    Explicit in/out shardings pin the compile signature: host-side updates to
    the plateau/freeze scalars (uncommitted arrays) would otherwise flip the
    committed-ness part of the jit cache key and recompile every epoch.
    """
    schedule = schedule_scale(spec)
    has_preproc = bundle.has_preprocessor
    grads_fn = _make_grads_fn(
        bundle, noise_level, accum_steps,
        micro_constraint=_micro_constraint(batch_sharding_) if accum_steps > 1 else None,
        apply_fn=apply_fn,
    )

    step_body = _make_step_body(grads_fn, tx, spec, schedule, has_preproc)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        new_state, (loss, lr) = step_body(state, batch)
        return new_state, {"loss": loss, "lr": lr}

    kwargs = {}
    if state_sharding is not None:
        # state_sharding may be a TrainState-shaped pytree (tensor-parallel
        # layouts) or a single sharding (replicated params, pure DP).
        repl = repl_sharding if repl_sharding is not None else state_sharding
        kwargs = dict(
            in_shardings=(state_sharding, batch_sharding_),
            out_shardings=(state_sharding, repl),
        )
    return jax.jit(train_step, donate_argnums=(0,), **kwargs)


def make_train_epoch(
    bundle: ModelBundle,
    tx,
    spec: OptSpec,
    noise_level: float,
    batch_size: int,
    steps_per_epoch: int,
    state_sharding=None,
    batch_constraint=None,
    with_val: bool = False,
    repl_sharding=None,
    n_epochs: int = 1,
    accum_steps: int = 1,
    gather_mode: str = "block",
    apply_fn=None,
    eval_apply_fn=None,
) -> Callable:
    """Whole-epoch training as ONE dispatch: ``lax.scan`` over steps.

    The tiny baseline model is dispatch-bound (~0.45 ms/step wall vs
    ~0.15 ms compute); with the epoch's data resident in HBM and a
    host-supplied shuffled index vector, scanning all steps in a single
    compiled call removes the per-step host round-trip. Semantics match the
    per-step path exactly (same RNG stream layout per step, same LR
    schedule/plateau/freeze scalars).

    ``n_epochs == 1`` (default): returns ``fn(state, data, perm[, val_x]) ->
    (state, losses (steps,), last_lr[, val_logits])`` where ``data`` is the
    column dict of full epoch arrays and ``perm`` an int32 index vector of
    length ``steps_per_epoch * batch_size`` (cycled-padded by the host like
    the Batcher).

    ``n_epochs > 1`` (``train.epochs_per_dispatch``): an outer scan runs N
    epochs per dispatch, amortizing the host round-trip (~29 ms on tunneled
    deployments) over N. ``perm`` becomes ``(N, steps*batch)``, a ``frozen``
    vector ``(N,)`` sets the freeze flag per epoch, and outputs grow a
    leading epoch axis (fused val logits are per-epoch, so host-side
    metrics/plateau/early-stop still see every epoch). Identical update
    trajectory to N single-epoch dispatches.
    """
    module = bundle.module
    schedule = schedule_scale(spec)
    has_preproc = bundle.has_preprocessor
    # batch_constraint is (None, 'data')-shaped for the stacked epoch; the
    # per-step micro constraint drops its leading step axis.
    grads_fn = _make_grads_fn(
        bundle, noise_level, accum_steps,
        micro_constraint=_micro_constraint(batch_constraint) if accum_steps > 1 else None,
        apply_fn=apply_fn,
    )

    one_step = _make_step_body(grads_fn, tx, spec, schedule, has_preproc)

    # per-step batch sharding (the batch_constraint minus its leading steps
    # axis), for the 'step' gather mode under DP
    step_constraint = None
    if batch_constraint is not None:
        from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

        step_constraint = _NS(
            batch_constraint.mesh, _P(*tuple(batch_constraint.spec)[1:])
        )

    def run_one_epoch(state, data, perm, val_x):
        if gather_mode == "step":
            # Gather-on-read: each scan step takes only its batch's rows,
            # fused into the step's compute — the stacked (steps, batch,
            # ...) epoch array is never materialized (halves the epoch's
            # permutation traffic: no 164 MB gather-write + re-read on the
            # baseline workload). Same rows reach the same steps with
            # bit-identical values; the two modes compile different XLA
            # programs, so fusion may reorder reductions (~1e-8 rel drift
            # measured — tests/test_fused_epoch.py).
            idx = perm.reshape(steps_per_epoch, batch_size)

            def gather_step(st, ib):
                batch = {k: jnp.take(v, ib, axis=0) for k, v in data.items()}
                if step_constraint is not None:
                    batch = jax.lax.with_sharding_constraint(
                        batch, step_constraint
                    )
                return one_step(st, batch)

            state, (losses, lrs) = jax.lax.scan(gather_step, state, idx)
        else:
            # ONE gather for the whole epoch, then scan over the stacked
            # (steps, batch, ...) leading axis.
            epoch_data = {
                k: jnp.take(v, perm, axis=0).reshape(
                    (steps_per_epoch, batch_size) + v.shape[1:]
                )
                for k, v in data.items()
            }
            if batch_constraint is not None:
                # DP: shard each step's batch over the mesh data axis; XLA
                # inserts the gradient all-reduce inside the scan body.
                epoch_data = jax.lax.with_sharding_constraint(
                    epoch_data, batch_constraint
                )
            state, (losses, lrs) = jax.lax.scan(one_step, state, epoch_data)
        if val_x is None:
            return state, losses, lrs[-1], None
        # Fused validation: forward the (pre-noised) val inputs with the
        # just-updated params in the SAME dispatch — the whole epoch costs
        # one host round-trip. Scanned in batch-size chunks to bound memory.
        n_val = val_x.shape[0]
        n_chunks = max(1, -(-n_val // batch_size))
        pad = n_chunks * batch_size - n_val
        val_padded = jnp.pad(val_x, ((0, pad),) + ((0, 0),) * (val_x.ndim - 1))
        chunks = val_padded.reshape((n_chunks, batch_size) + val_x.shape[1:])
        if batch_constraint is not None:
            # DP: shard each val chunk over the data axis like the train
            # batches (the padded chunks are exactly batch_size rows, so the
            # same (None, 'data') layout applies).
            chunks = jax.lax.with_sharding_constraint(chunks, batch_constraint)

        def val_step(_, chunk):
            # eval_apply_fn: the fused-val forward override (stage-resident
            # pipeline runs — the monolithic apply can't read stacked params)
            if eval_apply_fn is not None:
                logits = eval_apply_fn(state.params, chunk)
            else:
                logits = module.apply(
                    {"params": state.params}, chunk, deterministic=True
                )
            return None, logits

        _, val_logits = jax.lax.scan(val_step, None, chunks)
        val_logits = val_logits.reshape((n_chunks * batch_size, -1))[:n_val]
        return state, losses, lrs[-1], val_logits

    if n_epochs == 1:
        def epoch_fn(state: TrainState, data: Dict[str, jnp.ndarray],
                     perm: jnp.ndarray, *val_args):
            val_x = val_args[0] if val_args else None
            state, losses, last_lr, val_logits = run_one_epoch(state, data, perm, val_x)
            if val_x is None:
                return state, losses, last_lr
            return state, losses, last_lr, val_logits
    else:
        def epoch_fn(state: TrainState, data: Dict[str, jnp.ndarray],
                     perms: jnp.ndarray, frozen_vec: jnp.ndarray, *val_args):
            val_x = val_args[0] if val_args else None

            def one_epoch(state, xs):
                perm, frozen = xs
                state = state.replace(frozen=frozen)
                state, losses, last_lr, val_logits = run_one_epoch(
                    state, data, perm, val_x
                )
                outs = (losses, last_lr) + (
                    (val_logits,) if val_x is not None else ()
                )
                return state, outs

            state, outs = jax.lax.scan(one_epoch, state, (perms, frozen_vec))
            if val_x is None:
                return (state,) + outs  # losses (N, steps), last_lr (N,)
            return (state,) + outs  # + val_logits (N, n_val, K)

    kwargs = {}
    if state_sharding is not None:
        repl = repl_sharding if repl_sharding is not None else state_sharding
        # inputs after state: data, perm(s) [, frozen_vec] [, val_x]
        n_in = 2 + (1 if n_epochs > 1 else 0) + (1 if with_val else 0)
        # outputs after state: losses, last_lr [, val_logits]
        n_out = 2 + (1 if with_val else 0)
        kwargs = dict(
            in_shardings=(state_sharding,) + (repl,) * n_in,
            out_shardings=(state_sharding,) + (repl,) * n_out,
        )
    return jax.jit(epoch_fn, donate_argnums=(0,), **kwargs)


def make_eval_step(
    bundle: ModelBundle, params_sharding=None, batch_sharding_=None,
    repl_sharding=None,
) -> Callable:
    module = bundle.module

    def eval_step(params, batch):
        return module.apply({"params": params}, batch["x"], deterministic=True)

    kwargs = {}
    if params_sharding is not None:
        repl = repl_sharding if repl_sharding is not None else params_sharding
        kwargs = dict(
            in_shardings=(params_sharding, batch_sharding_),
            out_shardings=repl,
        )
    return jax.jit(eval_step, **kwargs)


def _dataset_label_bounds(ds) -> Optional[list]:
    """Fixed denormalized axis bounds from a RegSpecDataset's minmax label
    stats (the ORIGINAL parameter ranges — reference `plotter.py:73-100`);
    None lets the viz fall back to first-epoch data ranges."""
    if (
        getattr(ds, "label_norm", None) == "minmax"
        and getattr(ds, "label_min", None) is not None
        and getattr(ds, "label_max", None) is not None
    ):
        lo = np.ravel(np.asarray(ds.label_min, np.float64))
        hi = np.ravel(np.asarray(ds.label_max, np.float64))
        return [(float(a), float(b)) for a, b in zip(lo, hi)]
    return None


def _host_loss(logits: np.ndarray, labels: np.ndarray, task: str, loss_name: str) -> float:
    if task == "cls":
        z = logits - logits.max(axis=-1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
        return float(-logp[np.arange(len(labels)), labels.astype(int)].mean())
    diff = logits.reshape(len(logits), -1) - labels.reshape(len(labels), -1)
    if "l1" in (loss_name or "l2").lower():
        return float(np.abs(diff).mean())
    return float((diff**2).mean())


def _with_mesh(method):
    """Scope the process-global active mesh to this Experiment entry point.

    Traces inside (ring attention) see ``self.mesh``; on exit the previous
    value is restored, so a finished run can't leak its mesh into later
    library traces. ONLY decorated entry points (``fit``/``test``/
    ``_init_state``) see the mesh — ``__init__`` does not set it, so any new
    tracing entry point must carry this decorator too.
    """

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        with active_mesh_scope(self.mesh):
            return method(self, *args, **kwargs)

    return wrapper


class Experiment:
    """Facade: build model + data + optimizer, then ``fit`` / ``test``.

    Mirrors the reference ``Experiment`` (`/root/reference/src/vit.py:437-465`)
    surface: ``Experiment(config, use_wandb, sweep, ckpt_path).run()``.
    """

    def __init__(
        self,
        config: dict,
        use_wandb: bool = False,
        sweep: bool = False,
        ckpt_path: Optional[str] = None,
        num_devices: Optional[int] = None,
        seed: int = 42,
    ) -> None:
        self.config = config
        self.sweep = sweep
        self.ckpt_path = ckpt_path
        self.seed = seed
        # Multi-host FIRST: jax.distributed.initialize must run before
        # anything touches the backend (jax.default_backend below would
        # otherwise pin a single-host runtime).
        maybe_initialize_distributed()
        # Persistent XLA compilation cache: re-runs of already-compiled
        # (program, shapes) pairs skip the 20 s–3 min remote compile
        # (train.compilation_cache: false disables).
        from vit_tpu.hardware import enable_compilation_cache

        enable_compilation_cache(config)
        seed_everything(seed)
        train_cfg0 = config.get("train", {}) or {}
        # Dropout-mask generation dominates small-model step time with the
        # default threefry PRNG (~2.3x whole-epoch cost measured on v5e);
        # rbg is the TPU-recommended fast generator. Different random
        # streams, identical semantics. Disable with train.fast_rng: false.
        if bool(train_cfg0.get("fast_rng", True)) and jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "rbg")

        self.bundle = get_model(config)
        if self.bundle.vit_config.input_kind == "image":
            from vit_tpu.data.images import ImageDataModule

            self.datamodule = ImageDataModule.from_config(config)
        else:
            self.datamodule = SpecDataModule.from_config(config)
        train_cfg = config.get("train", {}) or {}
        self.max_epochs = int(train_cfg.get("ep", 10))
        self.debug = bool(train_cfg.get("debug", 0))
        self.save = bool(train_cfg.get("save", False))
        self.batch_size = int(train_cfg.get("batch_size", 64))
        self.noise_level = float((config.get("noise", {}) or {}).get("noise_level", 0) or 0)
        # Gradient accumulation: optimizer batch = batch_size, computed as
        # accumulate_steps sequential micro-batches (1/A activation memory).
        self.accum_steps = int(train_cfg.get("accumulate_steps", 1) or 1)
        if self.batch_size % self.accum_steps != 0:
            raise ValueError(
                f"train.batch_size {self.batch_size} must divide by "
                f"train.accumulate_steps {self.accum_steps}"
            )
        # Profiling (SURVEY §5: expose jax.profiler behind a config flag).
        profile = train_cfg.get("profile")
        self.profile_dir: Optional[str] = None
        if profile:
            self.profile_dir = (
                profile if isinstance(profile, str) else "./results/profile"
            )
        from vit_tpu.hardware import get_prefetch_depth

        self.prefetch_depth = get_prefetch_depth(config)
        if num_devices is None:
            num_devices = train_cfg.get("gpus")  # CLI-injected device count
        # Tensor parallelism: train.model_parallel splits a `model` mesh axis
        # (column-parallel kernels via infer_param_shardings); default 1 = the
        # reference's pure-DP mode. Sequence parallelism
        # (train.sequence_parallel + model.attn_impl: ring) reuses the same
        # axis for ring attention's K/V rotation instead — params stay
        # replicated over it, the sequence is sharded.
        tp = int(train_cfg.get("model_parallel", 1) or 1)
        self.sp = int(train_cfg.get("sequence_parallel", 1) or 1)
        if tp > 1 and self.sp > 1:
            raise ValueError(
                "train.model_parallel and train.sequence_parallel both split "
                "the 'model' mesh axis — set at most one of them"
            )
        if tp > 1 and self.bundle.vit_config.attn_impl == "ring":
            # The ring kernel shards the SEQUENCE over whatever sized the
            # 'model' axis; under TP it would silently reshard TP-sharded
            # QKV every layer and blame train.sequence_parallel in errors.
            raise ValueError(
                "model.attn_impl: ring shards the sequence over the 'model' "
                "mesh axis and cannot compose with train.model_parallel > 1; "
                "use train.sequence_parallel instead"
            )
        axis_split = max(tp, self.sp)
        if self.sp > 1 and self.bundle.vit_config.attn_impl != "ring":
            print(
                f"[experiment] train.sequence_parallel={self.sp} has no "
                "effect without model.attn_impl: ring"
            )
        # Pipeline parallelism: train.pipeline_parallel splits the encoder's
        # layers into GPipe stages over a `pipe` mesh axis
        # (vit_tpu/parallel/pipeline.py); train.pipeline_microbatches (default
        # = stage count) sets the schedule's microbatch count. By default
        # (train.pipeline_stage_params, on) the run is MEMORY-REAL: encoder
        # params AND optimizer state live stage-sharded over `pipe` as the
        # resident layout (1/P per-device bytes — a model whose params+opt
        # exceed one chip can train), with checkpoints gathered to the
        # canonical per-layer layout on save and restacked on restore, so
        # --ckpt/torch-bridge interchange is unchanged. pipeline_stage_params:
        # false keeps the round-4 layout (replicated canonical params,
        # in-step restack) for composition with zero1. Composes with
        # train.model_parallel (stage kernels shard over `model`, GSPMD-auto
        # inside the pipeline body) and with MoE (router aux threaded
        # through the pipeline; with model_parallel the experts are
        # expert-parallel inside each stage).
        self.pp = int(train_cfg.get("pipeline_parallel", 1) or 1)
        self.pp_resident = self.pp > 1 and bool(
            train_cfg.get("pipeline_stage_params", True)
        )
        if self.pp > 1:
            if self.bundle.vit_config.attn_impl == "ring":
                raise ValueError(
                    "model.attn_impl: ring cannot run inside the pipeline "
                    "(the ring shard_maps the sequence over its own mesh "
                    "axis); use attn_impl auto/xla/flash with "
                    "train.pipeline_parallel"
                )
            if self.sp > 1:
                raise ValueError(
                    "train.sequence_parallel cannot compose with "
                    "train.pipeline_parallel (ring attention shard_maps the "
                    "sequence over the axis the pipeline body would need)"
                )
            if tp > 1 and not self.pp_resident:
                raise ValueError(
                    "train.model_parallel x pipeline_parallel requires the "
                    "stage-resident layout (train.pipeline_stage_params: "
                    "true, the default)"
                )
            layers = self.bundle.vit_config.num_hidden_layers
            if layers % self.pp != 0:
                raise ValueError(
                    f"model.num_hidden_layers={layers} must be divisible by "
                    f"train.pipeline_parallel={self.pp}"
                )
        self.pp_microbatches = int(
            train_cfg.get("pipeline_microbatches", 0) or 0
        ) or self.pp
        if self.pp <= 1 and int(
            train_cfg.get("pipeline_microbatches", 0) or 0
        ) > 0:
            print(
                "[experiment] train.pipeline_microbatches has no effect "
                "without train.pipeline_parallel > 1"
            )
        # ZeRO-1-style optimizer-state sharding (rebuild-only, TPU-native):
        # train.opt_state_sharding shards every >=1-D optimizer-state leaf
        # (AdamW mu/nu and friends) over the `data` mesh axis on its leading
        # dim. Params stay replicated; the per-step update math is
        # elementwise per leaf, so each device updates only its 1/dp slice
        # and GSPMD all-gathers the param deltas — the classic ZeRO-1
        # memory/traffic trade. Cuts resident optimizer state from 2x to
        # 2/dp x param bytes (fp32 AdamW; B/16 on 8 chips: 688 MB -> 86 MB).
        self.zero1 = bool(train_cfg.get("opt_state_sharding", False))
        if self.zero1 and axis_split > 1:
            raise ValueError(
                "train.opt_state_sharding composes with data/pipeline "
                "parallelism only: under model_parallel the moments already "
                "inherit the tensor-parallel layouts; set model_parallel/"
                "sequence_parallel to 1"
            )
        if self.zero1 and self.pp_resident:
            raise ValueError(
                "train.opt_state_sharding is redundant with the stage-"
                "resident pipeline layout (encoder optimizer state is "
                "already 1/P-sharded over `pipe`); set "
                "train.pipeline_stage_params: false to combine zero1 with "
                "the replicated-params pipeline"
            )
        # The pipelined forward sees the PER-FORWARD batch: with gradient
        # accumulation that is batch_size/accum_steps rows, and each of the
        # M microbatches must still split over the data axis.
        fwd_batch = self.batch_size // self.accum_steps
        if self.pp > 1 and fwd_batch % self.pp_microbatches != 0:
            raise ValueError(
                f"the per-forward batch {fwd_batch} (train.batch_size "
                f"{self.batch_size} / accumulate_steps {self.accum_steps}) "
                f"must divide by train.pipeline_microbatches "
                f"{self.pp_microbatches}"
            )
        self.mesh = make_mesh(
            num_devices=num_devices, model_parallel=axis_split,
            pipeline_parallel=self.pp,
        )
        # Keep per-device batch shape static: the data axis must divide batch
        # (under PP, each MICROBATCH's rows are what the data axis splits).
        n_data = self.mesh.shape.get("data", 1)
        rows = fwd_batch // self.pp_microbatches if self.pp > 1 else self.batch_size
        data_par = math.gcd(rows, n_data)
        if data_par != n_data:
            print(f"[experiment] batch rows {rows} not divisible by "
                  f"{n_data} data shards; using {data_par}")
            self.mesh = make_mesh(
                num_devices=data_par * axis_split * self.pp,
                model_parallel=axis_split, pipeline_parallel=self.pp,
            )
        # The active mesh (ring attention reads it at trace time) is scoped
        # to the tracing entry points via @_with_mesh — never left set after
        # a run completes.
        self.batch_shard = batch_sharding(self.mesh)
        self.repl_shard = replicated_sharding(self.mesh)

        self.monitor, self.monitor_mode = monitor_for_task(self.bundle.vit_config.task_type)
        self.logger = MetricLogger(
            project=config.get("project", "vit-tpu"),
            name=self.bundle.model_name,
            use_wandb=use_wandb,
            config=config,
            save_artifacts=self.save,
        )
        self.ckpt = CheckpointManager(
            default_ckpt_dir(),
            self.bundle.model_name,
            monitor=self.monitor,
            mode=self.monitor_mode,
            enabled=self.save,
            # train.async_ckpt: overlap the checkpoint disk write with the
            # next epoch's compute (orbax background thread); fenced by
            # ckpt.wait() before any read-back. Identical artifacts.
            async_save=bool(train_cfg.get("async_ckpt", False)),
        )
        self.state: Optional[TrainState] = None
        self.state_shard = self.repl_shard  # refined by _init_state (TP trees)
        self._eval_step = None
        self._capture_step = None
        self._moe_stats_step = None
        self.callback_metrics: Dict[str, float] = {}

    # -- construction helpers -------------------------------------------
    def _train_apply_fn(self):
        """Training-forward override: the GPipe-staged encoder when
        ``train.pipeline_parallel > 1``, else None (monolithic apply).

        Eval/val/capture keep the monolithic forward on the same canonical
        params — identical results, and viz capture stays supported.
        """
        if self.pp <= 1:
            return None
        from vit_tpu.parallel.pipeline import apply_pipelined

        module = self.bundle.module
        mesh, m = self.mesh, self.pp_microbatches
        batch_axis = "data" if self.mesh.shape.get("data", 1) > 1 else None
        resident = self.pp_resident
        tp_axis = "model" if self.mesh.shape.get("model", 1) > 1 else None

        def apply_fn(params, x, dropout_rng):
            return apply_pipelined(
                module, params, x, mesh=mesh, num_microbatches=m,
                batch_axis=batch_axis, deterministic=False,
                rngs={"dropout": dropout_rng},
                resident=resident, tp_axis=tp_axis,
            )

        return apply_fn

    def _pp_eval_apply_fn(self):
        """Deterministic pipelined forward on the resident params — the
        eval/val analogue of :meth:`_train_apply_fn` (the monolithic
        ``module.apply`` cannot consume the stage-resident tree)."""
        from vit_tpu.parallel.pipeline import apply_pipelined

        module = self.bundle.module
        mesh, m = self.mesh, self.pp_microbatches
        batch_axis = "data" if self.mesh.shape.get("data", 1) > 1 else None
        tp_axis = "model" if self.mesh.shape.get("model", 1) > 1 else None

        def eval_apply(params, x):
            out = apply_pipelined(
                module, params, x, mesh=mesh, num_microbatches=m,
                batch_axis=batch_axis, deterministic=True,
                resident=True, tp_axis=tp_axis,
            )
            return out[0] if isinstance(out, tuple) else out

        return eval_apply

    # -- stage-resident layout conversions (pipeline_stage_params) -------
    def _state_to_canonical(self, state: "TrainState") -> "TrainState":
        """Resident (stacked encoder) -> canonical per-layer state; host-side
        numpy in, numpy out (no device placement). Optimizer moments are
        converted by structural matching (params-shaped subtrees)."""
        from vit_tpu.parallel.pipeline import (
            canonical_params,
            convert_params_shaped,
        )

        td = jax.tree_util.tree_structure(state.params)
        return state.replace(
            params=canonical_params(state.params),
            opt_state=convert_params_shaped(
                state.opt_state, td, canonical_params
            ),
        )

    def _state_to_resident(self, state: "TrainState") -> "TrainState":
        """Canonical -> resident (inverse of :meth:`_state_to_canonical`)."""
        from vit_tpu.parallel.pipeline import (
            convert_params_shaped,
            stage_resident_params,
        )

        td = jax.tree_util.tree_structure(state.params)
        conv = lambda p: stage_resident_params(p, self.pp)  # noqa: E731
        return state.replace(
            params=conv(state.params),
            opt_state=convert_params_shaped(state.opt_state, td, conv),
        )

    def _ckpt_state(self) -> "TrainState":
        """The state as checkpoints store it: canonical per-layer layout
        (gathered to host first under the stage-resident pipeline)."""
        if not self.pp_resident:
            return self.state
        # device_get gathers the pipe-sharded leaves to host numpy — the
        # full tree exists on HOST RAM only, never replicated into HBM.
        return self._state_to_canonical(jax.device_get(self.state))

    def _restore_state(self, spec: str) -> "TrainState":
        """Restore ``best|last|path`` into the run's resident layout."""
        target = self.state
        if self.pp_resident:
            target = self._state_to_canonical(jax.device_get(self.state))
        restored = CheckpointManager.restore(self.ckpt.resolve(spec), target)
        if self.pp_resident:
            restored = self._state_to_resident(restored)
        return jax.device_put(restored, self.state_shard)

    @_with_mesh
    def _init_state(self, tx) -> TrainState:
        cfg = self.bundle.vit_config
        rng = jax.random.PRNGKey(self.seed)
        init_rng, state_rng = jax.random.split(rng)
        if cfg.input_kind == "image":
            dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.num_channels), jnp.float32)
        else:
            # Model input dim = the RAW spectrum length (a preprocessor may
            # have auto-adjusted cfg.image_size to its output dim); take it
            # from whichever dataset split is loaded.
            in_dim = None
            for split in (self.datamodule.train, self.datamodule.val, self.datamodule.test):
                flux = getattr(split, "flux", None)
                if flux is not None:
                    in_dim = flux.shape[1]
                    break
            if in_dim is None:
                in_dim = cfg.image_size
                if self.bundle.has_preprocessor:
                    raise RuntimeError(
                        "Cannot infer the raw input dimension for a model with a "
                        "preprocessor before any dataset is loaded; call "
                        "datamodule.setup() first."
                    )
            dummy = jnp.zeros((1, in_dim), jnp.float32)
        variables = self.bundle.module.init(init_rng, dummy)
        params = variables["params"]
        tp = self.mesh.shape.get("model", 1)
        if getattr(self, "sp", 1) > 1:
            tp = 1  # SP reuses the axis for sequence sharding; params replicate
        if getattr(self, "pp_resident", False):
            # Memory-real pipeline: the RESIDENT layout is the stacked
            # (P, L/P, ...) encoder sharded over `pipe` (optionally x TP over
            # `model`); the optimizer initialized ON that tree inherits the
            # same shardings, so params + moments are both 1/P per device.
            from vit_tpu.parallel.pipeline import (
                resident_param_shardings,
                stage_resident_params,
            )

            resident = stage_resident_params(params, self.pp)
            shardings = resident_param_shardings(
                resident, self.mesh, tp_axis="model" if tp > 1 else None
            )
            resident = jax.device_put(resident, shardings)
            opt_state = tx.init(resident)
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.repl_shard)
                if getattr(x, "ndim", None) == 0
                else x,
                opt_state,
            )
            state = TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self.repl_shard),
                params=resident,
                opt_state=opt_state,
                rng=jax.device_put(state_rng, self.repl_shard),
                plateau_scale=self._scalar(1.0),
                frozen=self._scalar(0.0),
            )
            self.state_shard = jax.tree_util.tree_map(lambda x: x.sharding, state)
            return state
        if tp > 1:
            # Tensor-parallel layout: params per infer_param_shardings; the
            # optimizer moments inherit the params' shardings (eager optax
            # init computes follow-the-data); host-updated scalars committed
            # replicated so the jit cache key stays stable.
            from vit_tpu.parallel.mesh import infer_param_shardings

            params = jax.device_put(params, infer_param_shardings(params, self.mesh))
            opt_state = tx.init(params)
            # 0-d leaves (step counts, injected lr) come out uncommitted;
            # commit them replicated for a stable signature.
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.repl_shard)
                if getattr(x, "ndim", None) == 0
                else x,
                opt_state,
            )
            state = TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self.repl_shard),
                params=params,
                opt_state=opt_state,
                rng=jax.device_put(state_rng, self.repl_shard),
                plateau_scale=self._scalar(1.0),
                frozen=self._scalar(0.0),
            )
            self.state_shard = jax.tree_util.tree_map(lambda x: x.sharding, state)
            return state
        opt_state = tx.init(params)
        if self.zero1 and self.mesh.shape.get("data", 1) > 1:
            # ZeRO-1: moments shard their leading dim over `data`; params
            # and scalar counts replicate (rule + math note in
            # parallel.mesh.zero1_shard_opt_state).
            from ..parallel.mesh import zero1_shard_opt_state

            opt_state = zero1_shard_opt_state(opt_state, self.mesh)
            state = TrainState(
                step=jax.device_put(jnp.zeros((), jnp.int32), self.repl_shard),
                params=jax.device_put(params, self.repl_shard),
                opt_state=opt_state,
                rng=jax.device_put(state_rng, self.repl_shard),
                plateau_scale=self._scalar(1.0),
                frozen=self._scalar(0.0),
            )
            self.state_shard = jax.tree_util.tree_map(lambda x: x.sharding, state)
            return state
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=state_rng,
            plateau_scale=jnp.ones((), jnp.float32),
            frozen=jnp.zeros((), jnp.float32),
        )
        # Commit every leaf with the replicated sharding so the jit signature
        # is identical on the first and every later call (no recompiles).
        self.state_shard = self.repl_shard
        return jax.device_put(state, self.repl_shard)

    def _scalar(self, value: float) -> jnp.ndarray:
        """Replicated committed f32 scalar (stable jit cache key)."""
        return jax.device_put(jnp.asarray(value, jnp.float32), self.repl_shard)

    def _frozen_flag(self, epoch: int) -> float:
        """PreprocessorFreezeCallback semantics (`prepca/callbacks.py:31-62`):
        -1 permanent freeze; >0 freeze for the first N epochs; 0 never."""
        fe = self.bundle.freeze_epochs
        if not self.bundle.has_preprocessor or fe == 0:
            return 0.0
        if fe == -1:
            return 1.0
        return 1.0 if epoch < fe else 0.0

    # -- evaluation -------------------------------------------------------
    def _run_eval(
        self, dataset, batch_size: int, collect_inputs: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Forward the dataset; returns (logits, labels) for real rows."""
        if self._eval_step is None:
            params_shard = (
                self.state_shard.params
                if isinstance(self.state_shard, TrainState)
                else self.state_shard
            )
            if self.pp_resident:
                # Stage-resident pipeline: the monolithic module.apply can't
                # consume the stacked params — eval runs the deterministic
                # pipelined forward on the SAME resident tree.
                eval_apply = self._pp_eval_apply_fn()
                self._eval_step = jax.jit(
                    lambda params, batch: eval_apply(params, batch["x"]),
                    in_shardings=(params_shard, self.batch_shard),
                    out_shardings=self.repl_shard,
                )
            else:
                self._eval_step = make_eval_step(
                    self.bundle, params_shard, self.batch_shard,
                    repl_sharding=self.repl_shard,
                )
        n_shards = self.mesh.shape.get("data", 1)
        # Under the resident pipeline each eval batch also splits into the
        # schedule's microbatches, so the row unit grows accordingly.
        unit = n_shards * (self.pp_microbatches if self.pp_resident else 1)
        bs = max(unit, (batch_size // unit) * unit)
        # Only x/label cross to device: eval reads batch['x'] in-graph and
        # label/mask host-side — shipping the flux/error duplicates tripled
        # the host->device volume per eval epoch.
        cols = {k: v for k, v in dataset.arrays().items() if k in ("x", "label")}
        batcher = Batcher(cols, bs, eval_mode=True)
        logits_all, labels_all = [], []
        params = self.state.params
        for i, batch in enumerate(
            prefetch_to_device(iter(batcher), sharding=self.batch_shard)
        ):
            logits = self._eval_step(params, batch)
            mask = np.asarray(jax.device_get(batch["mask"]))
            logits_all.append(np.asarray(jax.device_get(logits))[mask])
            labels_all.append(np.asarray(jax.device_get(batch["label"]))[mask])
            if self.debug and i == 0:
                break  # fast-dev-run: one eval batch (Lightning parity)
        return np.concatenate(logits_all), np.concatenate(labels_all)

    def _run_capture_eval(self, dataset, num_samples: int):
        """Eval with diagnostics captured (attention probs, activations,
        CLS states) via the intermediates collection — the jit-safe
        replacement for the reference's forward hooks.

        Memory discipline happens ON DEVICE: attention probs are sown
        batch-mean, MLP activations are reduced to stats + a
        ``viz.sample_rate`` subsample inside the same jit, and the capture
        batch is capped by token count so stride-1 (~4k token) configs fit
        in HBM (budget: ``viz.capture_memory_mb``, default 512)."""
        import numpy as _np

        from vit_tpu.viz.diagnostics import (
            capture_batch_cap,
            extract_diagnostics,
            reduce_intermediates,
        )

        vcfg = self.bundle.vit_config
        viz_cfg = self.config.get("viz", {}) or {}
        if self._capture_step is None:
            module = self.bundle.module
            sample_rate = float(viz_cfg.get("sample_rate", 0.15))
            num_layers = vcfg.num_hidden_layers

            def capture_step(params, batch):
                logits, state = module.apply(
                    {"params": params},
                    batch["x"],
                    deterministic=True,
                    capture=True,
                    mutable=["intermediates"],
                )
                reduced = reduce_intermediates(
                    state["intermediates"], num_layers, sample_rate
                )
                return logits, reduced

            self._capture_step = jax.jit(capture_step)
        budget = int(float(viz_cfg.get("capture_memory_mb", 512)) * 1024**2)
        cap = capture_batch_cap(
            vcfg.seq_len, vcfg.num_attention_heads, vcfg.intermediate_size, budget
        )
        n = min(num_samples, len(dataset), cap)
        if n < min(num_samples, len(dataset)):
            print(f"[viz] capture batch capped at {n} by token count "
                  f"(T={vcfg.seq_len}, budget={budget // 1024**2} MB)")
        # Only 'x' enters the capture graph — labels stay host-side and
        # flux/error are never read, so transferring them would be ~3x the
        # needed bytes every diagnostics epoch.
        all_arrays = dataset.arrays()
        # arrays() omits 'label' for label-less datasets — diagnostics then
        # carry logits only (None labels), matching the old arrays.get path.
        labels = all_arrays.get("label")
        labels_host = _np.asarray(labels[:n]) if labels is not None else None
        batch = jax.device_put(
            {"x": all_arrays["x"][:n]},
            self.batch_shard
            if n % self.mesh.shape.get("data", 1) == 0
            else self.repl_shard,
        )
        capture_params = self.state.params
        if self.pp_resident:
            # Viz capture needs the monolithic forward (intermediates are
            # sown per named layer): gather the stage-resident tree to the
            # canonical layout, replicated. This transiently materializes
            # the FULL params on every device — viz targets small models;
            # disable viz for models that only fit stage-sharded.
            from vit_tpu.parallel.pipeline import canonical_params

            capture_params = jax.device_put(
                canonical_params(jax.device_get(self.state.params)),
                self.repl_shard,
            )
        logits, reduced = self._capture_step(capture_params, batch)
        diag = extract_diagnostics(jax.device_get(reduced))
        return (_np.asarray(jax.device_get(logits)), labels_host, diag)

    def _moe_dropped_frac(self) -> Optional[float]:
        """Mean fraction of (token, slot) assignments the MoE capacity limit
        dropped, measured on a deterministic forward over (up to) one
        batch of val rows — the per-epoch tuning signal for
        ``moe_capacity_factor`` (training adds dropout/jitter, so the
        train-time fraction can differ slightly; this makes drops VISIBLE
        rather than bit-exact). Logged as ``moe_dropped_frac``."""
        if getattr(self.bundle.vit_config, "moe_experts", 0) <= 1:
            return None
        ds = self.datamodule.val or self.datamodule.train
        if ds is None or len(ds) == 0:
            return None
        if self._moe_stats_step is None:
            module = self.bundle.module

            def stats(params, x):
                _, cols = module.apply(
                    {"params": params}, x, deterministic=True,
                    mutable=["moe_stats"],
                )
                leaves = jax.tree_util.tree_leaves(cols["moe_stats"])
                return sum(jnp.mean(l) for l in leaves) / max(len(leaves), 1)

            self._moe_stats_step = jax.jit(stats)
        params = self.state.params
        if self.pp_resident:
            from vit_tpu.parallel.pipeline import canonical_params

            params = jax.device_put(
                canonical_params(jax.device_get(params)), self.repl_shard
            )
        n = min(self.batch_size, len(ds))
        x = jax.device_put(
            np.asarray(ds.arrays()["x"][:n], np.float32), self.repl_shard
        )
        return float(jax.device_get(self._moe_stats_step(params, x)))

    def _metrics_from_arrays(
        self, logits: np.ndarray, labels: np.ndarray, prefix: str
    ) -> Dict[str, float]:
        task = self.bundle.vit_config.task_type
        out: Dict[str, float] = {
            f"{prefix}_loss": _host_loss(logits, labels, task, self.bundle.loss_name)
        }
        if task == "cls":
            m = classification_metrics(logits, labels)
        else:
            m = regression_metrics(logits, labels)
            names = parse_param_list((self.config.get("data", {}) or {}).get("param"))
            m.update(regression_extras(logits, labels, names))
        out.update({f"{prefix}_{k}": v for k, v in m.items()})
        return out

    def _eval_metrics(self, dataset, prefix: str, batch_size: int) -> Dict[str, float]:
        logits, labels = self._run_eval(dataset, batch_size)
        return self._metrics_from_arrays(logits, labels, prefix)

    # -- fit ---------------------------------------------------------------
    @_with_mesh
    def fit(self) -> Dict[str, float]:
        # Preemption safety (train.handle_preemption, default on): the
        # first SIGTERM latches a flag polled at every checkpoint boundary
        # so the run saves `last` through the normal path and returns
        # cleanly (--ckpt last resumes). Guard lifetime == this fit call.
        from vit_tpu.train.preempt import PreemptionGuard

        self._preempt = PreemptionGuard(
            enabled=bool(
                (self.config.get("train", {}) or {}).get("handle_preemption", True)
            )
        ).install()
        try:
            return self._fit_impl()
        finally:
            self._preempt.uninstall()

    def _fit_impl(self) -> Dict[str, float]:
        self.datamodule.setup("fit")
        train_ds = self.datamodule.train
        n_train = len(train_ds)
        steps_per_epoch = max(1, -(-n_train // self.batch_size))
        has_val = self.datamodule.val is not None and len(self.datamodule.val) > 0
        # Reference parity: validation itself falls back to file_path, but the
        # plateau scheduler is enabled only with an explicit data.val_path
        # (`/root/reference/src/basemodule.py:158-166`).
        explicit_val = bool((self.config.get("data", {}) or {}).get("val_path"))

        spec = OptSpec.from_config(
            self.config, steps_per_epoch, monitor_metric=self.monitor,
            has_val=explicit_val
        )
        tx = build_optimizer(spec)
        if self.state is None:
            self.state = self._init_state(tx)

        # Fused-epoch mode: one dispatch per epoch (lax.scan over steps) when
        # the epoch fits in HBM — the big throughput lever for small,
        # dispatch-bound models. Under DP the batches (train and fused-val)
        # are sharded over the data axis inside the dispatch.
        # Achieved-TFLOP/s observability (train.log_mfu): analytic matmul
        # FLOPs per step (builder.step_matmul_flops) over epoch wall-clock;
        # train.peak_tflops (e.g. 197 for v5e bf16) additionally logs `mfu`.
        flops_per_step = None
        peak_tflops = None
        if (self.config.get("train", {}) or {}).get("log_mfu"):
            from vit_tpu.models.builder import step_matmul_flops

            flops_per_step = step_matmul_flops(
                self.bundle.vit_config, self.batch_size, train=True
            )
            peak_tflops = (self.config.get("train", {}) or {}).get("peak_tflops")

        fused_cfg = (self.config.get("train", {}) or {}).get("fused_epoch", "auto")
        # Normalize truthy config spellings (1, 'true', 'yes' from CLI/sweep
        # overrides) — `fused_cfg is True` alone would silently drop them.
        if isinstance(fused_cfg, str) and fused_cfg.strip().lower() != "auto":
            fused_cfg = fused_cfg.strip().lower() in ("1", "true", "yes", "on")
        elif not isinstance(fused_cfg, (bool, str)):
            fused_cfg = bool(fused_cfg)
        # 'error' feeds noise injection only (`_make_grads_fn`); at
        # noise_level=0 it would be device-put AND permutation-gathered
        # every fused epoch (a dead 164 MB column on the baseline workload).
        need_cols = (
            ("x", "error", "label") if self.noise_level > 0 else ("x", "label")
        )
        train_cols = {
            k: v for k, v in train_ds.arrays().items() if k in need_cols
        }
        data_bytes = sum(v.nbytes for v in train_cols.values())
        use_fused = (
            (fused_cfg is True or fused_cfg == "auto")
            and not self.debug
            and data_bytes < 4 * 1024**3
        )
        if fused_cfg is False:
            use_fused = False
        if fused_cfg is True and not use_fused:
            why = "debug mode" if self.debug else (
                f"epoch data {data_bytes / 1e9:.1f} GB exceeds the 4 GB HBM gate"
            )
            print(f"[experiment] train.fused_epoch=true ignored: {why}")
        fused_val = False
        use_blocks, epd, train_epoch_block = False, 1, None
        val_x_dev = val_labels_host = None
        if use_fused:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_shards = self.mesh.shape.get("data", 1)
            batch_constraint = (
                NamedSharding(self.mesh, P(None, "data")) if n_shards > 1 else None
            )
            # Fuse the validation forward into the same dispatch when the
            # val set is small: ONE host round-trip per epoch, total. Works
            # under DP too — the val chunks get the same (None, 'data')
            # sharding as the train batches inside make_train_epoch.
            fused_val = (
                has_val
                and self.datamodule.val.model_input.nbytes < 512 * 1024**2
            )
            gather_mode = str((self.config.get("train", {}) or {}).get(
                "epoch_gather", "step") or "step").lower()
            if gather_mode not in ("step", "block"):
                raise ValueError(
                    f"train.epoch_gather must be 'step' or 'block', got "
                    f"{gather_mode!r}"
                )
            pp_eval_fn = self._pp_eval_apply_fn() if self.pp_resident else None
            train_epoch = make_train_epoch(
                self.bundle, tx, spec, self.noise_level, self.batch_size,
                steps_per_epoch, self.state_shard, batch_constraint,
                with_val=fused_val, repl_sharding=self.repl_shard,
                accum_steps=self.accum_steps, gather_mode=gather_mode,
                apply_fn=self._train_apply_fn(), eval_apply_fn=pp_eval_fn,
            )
            # Multi-epoch blocks (train.epochs_per_dispatch > 1): N epochs in
            # ONE dispatch, amortizing the host round-trip. Per-epoch val
            # metrics/plateau/early-stop are preserved (fused val returns
            # per-epoch logits); checkpoints and plateau-scale *application*
            # move to block boundaries. Off when viz needs per-epoch states.
            epd = int((self.config.get("train", {}) or {}).get(
                "epochs_per_dispatch", 1) or 1)
            viz_on = bool((self.config.get("viz", {}) or {}).get("enable", False))
            use_blocks = (
                epd > 1 and not viz_on and (fused_val or not has_val)
            )
            train_epoch_block = (
                make_train_epoch(
                    self.bundle, tx, spec, self.noise_level, self.batch_size,
                    steps_per_epoch, self.state_shard, batch_constraint,
                    with_val=fused_val, repl_sharding=self.repl_shard,
                    n_epochs=epd, accum_steps=self.accum_steps,
                    gather_mode=gather_mode, apply_fn=self._train_apply_fn(),
                    eval_apply_fn=pp_eval_fn,
                )
                if use_blocks
                else None
            )
            if epd > 1 and not use_blocks:
                why = (
                    "viz.enable requires per-epoch states"
                    if viz_on
                    else "fused validation unavailable (val split > 512 MB)"
                )
                print(
                    f"[experiment] train.epochs_per_dispatch={epd} ignored: {why}; "
                    "running one dispatch per epoch"
                )
            train_data_dev = jax.device_put(train_cols, self.repl_shard)
            if fused_val:
                val_x_dev = jax.device_put(
                    np.asarray(self.datamodule.val.model_input, np.float32),
                    self.repl_shard,
                )
                val_labels_host = np.asarray(self.datamodule.val.labels)
            train_step = None
        else:
            epd_cfg = int((self.config.get("train", {}) or {}).get(
                "epochs_per_dispatch", 1) or 1)
            if epd_cfg > 1:
                print(
                    f"[experiment] train.epochs_per_dispatch={epd_cfg} ignored: "
                    "requires the fused-epoch path (train.fused_epoch)"
                )
            train_step = make_train_step(
                self.bundle, tx, spec, self.noise_level, self.state_shard,
                self.batch_shard, repl_sharding=self.repl_shard,
                accum_steps=self.accum_steps, apply_fn=self._train_apply_fn(),
            )

        start_epoch = 0
        if self.ckpt_path:
            self.ckpt.load_best_from_meta()  # resume best-tracker state too
            self.state = self._restore_state(self.ckpt_path)
            start_epoch = int(self.state.step) // steps_per_epoch
            print(f"[experiment] resumed from {self.ckpt_path} at epoch {start_epoch}")

        n_params = count_params(self.state.params)
        self.logger.log({"num_params(M)": n_params / 1e6}, step=0)
        print(f"[experiment] {self.bundle.model_name}: {n_params / 1e6:.3f}M params, "
              f"{steps_per_epoch} steps/epoch, mesh={dict(self.mesh.shape)}")

        plateau = (
            PlateauScheduler(
                spec.plateau_factor,
                spec.plateau_patience,
                mode=spec.plateau_mode or self.monitor_mode,
            )
            if spec.scheduler == "plateau"
            else None
        )
        early = EarlyStopping(
            patience=100 if self.sweep else 500,
            mode=self.monitor_mode,
            divergence_threshold=(self.config.get("train", {}) or {}).get(
                "divergence_threshold"
            ),
        )
        if self.ckpt_path:
            # Resume host-side scheduler state: the in-graph plateau_scale is
            # restored with the TrainState, but the host PlateauScheduler /
            # EarlyStopping counters live in ckpt meta (torch restores
            # ReduceLROnPlateau state on resume; without this the first
            # post-resume validation would reset the scale to 1.0).
            meta = self.ckpt.read_meta()
            if plateau is not None:
                plateau.scale = float(jax.device_get(self.state.plateau_scale))
                if isinstance(meta.get("plateau_state"), dict):
                    plateau.load_state_dict(meta["plateau_state"])
            if isinstance(meta.get("early_stop_state"), dict):
                early.load_state_dict(meta["early_stop_state"])

        batcher = Batcher(
            train_cols,  # x/error/label only — 'flux' duplicates 'x' for the
            self.batch_size,  # train split; don't transfer it every step
            shuffle=not self.debug,
            seed=self.seed,
        )
        max_epochs = 1 if self.debug else self.max_epochs
        monitor_key = f"val_{self.monitor}"
        epoch_metrics: Dict[str, float] = {}

        # Label-norm stats into ckpt metadata so serving can denormalize
        # without the training data (vit_tpu.serve.Predictor).
        ckpt_extra = None
        if isinstance(train_ds, RegSpecDataset):
            stats = {
                k: (None if v is None else np.asarray(v).tolist())
                for k, v in train_ds.norm_stats().items()
            }
            ckpt_extra = {
                "label_norm": train_ds.label_norm,
                "label_norm_stats": stats,
            }

        # Training diagnostics (GIFs + CKA monitor), reference viz subsystem.
        from vit_tpu.viz.callback_factory import create_viz_callbacks

        denorm = train_ds.denormalize if isinstance(train_ds, RegSpecDataset) else None
        viz, cka, viz_every, viz_every_steps = create_viz_callbacks(
            self.config.get("viz"),
            save_enabled=self.save,
            model_name=self.bundle.model_name,
            param_names=parse_param_list((self.config.get("data", {}) or {}).get("param")),
            denormalize=denorm,
            label_bounds=_dataset_label_bounds(train_ds),
        )
        if viz is not None and viz_every_steps > 0 and use_fused:
            # Fused mode runs a whole epoch per dispatch; honor the step
            # frequency at the nearest epoch boundary.
            viz_every = max(1, round(viz_every_steps / steps_per_epoch))
            viz_every_steps = 0
            print(f"[viz] fused-epoch mode: log_every_n_steps -> every {viz_every} epoch(s)")
        num_viz_samples = int((self.config.get("viz", {}) or {}).get("num_viz_samples", 256))

        def _epoch_perm(epoch: int) -> np.ndarray:
            return epoch_permutation(
                len(train_ds), self.batch_size, steps_per_epoch, self.seed, epoch
            )

        block_results: Dict[int, tuple] = {}
        profiled = False
        stop_pending = False
        for epoch in range(start_epoch, max_epochs):
            self.state = self.state.replace(frozen=self._scalar(self._frozen_flag(epoch)))
            batcher.set_epoch(epoch)
            # Profile the first DISPATCH after start_epoch (post-compile
            # steady state). Cached block epochs perform no device work, so
            # the trigger is "this epoch actually dispatches" rather than a
            # fixed epoch index (which missed the tail/short-run cases in
            # block mode).
            will_dispatch = epoch not in block_results
            # Prefer a post-compile (steady-state) dispatch, but when this is
            # the run's ONLY dispatch (ep=1, or one block covering the whole
            # run) trace it anyway rather than writing no profile at all.
            dispatch_span = epd if (use_blocks and epoch + epd <= max_epochs) else 1
            only_dispatch_left = epoch + dispatch_span >= max_epochs
            profiling = (
                self.profile_dir is not None
                and not profiled
                and will_dispatch
                and (epoch > start_epoch or only_dispatch_left)
            )
            profile_includes_compile = profiling and epoch == start_epoch
            if profiling:
                os.makedirs(self.profile_dir, exist_ok=True)
                jax.profiler.start_trace(self.profile_dir)
            t0 = time.perf_counter()
            fused_val_logits = None
            block_final = True  # per-epoch checkpoint granularity by default
            block_dt = None
            if use_blocks and epoch not in block_results:
                block = list(range(epoch, min(epoch + epd, max_epochs)))
                if len(block) == epd:  # tail shorter than epd -> per-epoch path
                    perms = jax.device_put(
                        np.stack([_epoch_perm(e) for e in block]), self.repl_shard
                    )
                    frozen_vec = jax.device_put(
                        np.asarray([self._frozen_flag(e) for e in block], np.float32),
                        self.repl_shard,
                    )
                    args = (self.state, train_data_dev, perms, frozen_vec)
                    if fused_val:
                        self.state, losses_b, lrs_b, vlog_b = train_epoch_block(
                            *args, val_x_dev
                        )
                        vlog_b = np.asarray(jax.device_get(vlog_b))
                    else:
                        self.state, losses_b, lrs_b = train_epoch_block(*args)
                        vlog_b = None
                    losses_b = np.asarray(jax.device_get(losses_b))
                    lrs_b = np.asarray(jax.device_get(lrs_b))
                    # attribute the block dispatch time evenly to its epochs
                    dt_share = (time.perf_counter() - t0) / len(block)
                    for j, e in enumerate(block):
                        block_results[e] = (
                            losses_b[j],
                            float(lrs_b[j]),
                            vlog_b[j] if vlog_b is not None else None,
                            e == block[-1],
                            dt_share,
                        )
            if use_fused and epoch in block_results:
                (losses, last_lr, fused_val_logits, block_final,
                 block_dt) = block_results.pop(epoch)
                n_steps = steps_per_epoch
            elif use_fused:
                perm_dev = jax.device_put(_epoch_perm(epoch), self.repl_shard)
                if fused_val:
                    (self.state, losses, last_lr, v_out) = train_epoch(
                        self.state, train_data_dev, perm_dev, val_x_dev
                    )
                    fused_val_logits = np.asarray(jax.device_get(v_out))
                else:
                    self.state, losses, last_lr = train_epoch(
                        self.state, train_data_dev, perm_dev
                    )
                losses = jax.device_get(losses)
                n_steps = steps_per_epoch
            else:
                losses = []
                last_lr = spec.lr
                for i, batch in enumerate(
                    prefetch_to_device(
                        iter(batcher), size=self.prefetch_depth, sharding=self.batch_shard
                    )
                ):
                    self.state, m = train_step(self.state, batch)
                    losses.append(m["loss"])
                    last_lr = m["lr"]
                    if (
                        viz is not None
                        and viz_every_steps > 0
                        and has_val
                        and (epoch * steps_per_epoch + i + 1) % viz_every_steps == 0
                    ):
                        # Step-frequency diagnostics (reference
                        # callback_factory.py:18-84), labeled by global step.
                        try:
                            gstep = epoch * steps_per_epoch + i + 1
                            v_logits, v_labels, diag = self._run_capture_eval(
                                self.datamodule.val, num_viz_samples
                            )
                            viz.on_validation_epoch(gstep, v_logits, v_labels, diag)
                            if cka is not None:
                                self.logger.log(
                                    cka.on_validation_epoch(gstep, diag), step=gstep
                                )
                        except Exception as e:
                            print(f"[viz] step diagnostics skipped: {e}")
                    if self.debug and i == 0:
                        break
                n_steps = len(losses)
            if profiling:
                jax.block_until_ready(self.state.step)
                jax.profiler.stop_trace()
                profiled = True
                note = " (includes compilation)" if profile_includes_compile else ""
                print(f"[experiment] profiler trace written to {self.profile_dir}{note}")
            train_loss = float(np.mean(jax.device_get(losses)))
            # block-mode epochs report their share of the block dispatch
            # (the loop timer only sees a dict pop for cached epochs)
            dt = block_dt if block_dt is not None else time.perf_counter() - t0
            epoch_metrics = {
                "train_loss": train_loss,
                "lr": float(jax.device_get(last_lr)),
                "epoch_time_s": dt,
                "samples_per_s": n_steps * self.batch_size / max(dt, 1e-9),
            }
            if flops_per_step is not None:
                # Wall-clock includes host dispatch (and fused val), so this
                # is deployment-honest achieved throughput, not a
                # device-trace number. tflops_per_s aggregates the WHOLE
                # mesh (the global batch's FLOPs); peak_tflops is per-chip,
                # so mfu divides by the device count.
                tflops = n_steps * flops_per_step / max(dt, 1e-9) / 1e12
                epoch_metrics["tflops_per_s"] = tflops
                if peak_tflops:
                    epoch_metrics["mfu"] = tflops / (
                        float(peak_tflops) * self.mesh.size
                    )
            if self.bundle.has_preprocessor:
                epoch_metrics["preprocessor_frozen"] = float(self.state.frozen)
            if getattr(self.bundle.vit_config, "moe_experts", 0) > 1:
                dropped = self._moe_dropped_frac()
                if dropped is not None:
                    epoch_metrics["moe_dropped_frac"] = dropped

            if has_val:
                if use_fused and fused_val and fused_val_logits is not None:
                    val_metrics = self._metrics_from_arrays(
                        fused_val_logits, val_labels_host, "val"
                    )
                else:
                    val_metrics = self._eval_metrics(
                        self.datamodule.val, "val", self.datamodule.val_batch_size
                    )
                epoch_metrics.update(val_metrics)
                mon = val_metrics.get(monitor_key)
                if plateau is not None:
                    self.state = self.state.replace(
                        plateau_scale=self._scalar(plateau.step(mon))
                    )
                if viz is not None and viz_every_steps == 0 and epoch % viz_every == 0:
                    try:
                        v_logits, v_labels, diag = self._run_capture_eval(
                            self.datamodule.val, num_viz_samples
                        )
                        viz.on_validation_epoch(epoch, v_logits, v_labels, diag)
                        if cka is not None:
                            epoch_metrics.update(cka.on_validation_epoch(epoch, diag))
                    except Exception as e:  # diagnostics never fail training
                        print(f"[viz] epoch diagnostics skipped: {e}")
                stop = early.step(mon)
                if stop and not block_final and not stop_pending:
                    # Block mode: the device state already contains training
                    # through the block's final epoch (intermediate states are
                    # never materialized host-side). Flush the remaining
                    # cached epochs — no device work — so the checkpoint and
                    # reported metrics land on the state we actually hold.
                    stop_pending = True
                    print(
                        f"[experiment] early stopping triggered at epoch {epoch}; "
                        "flushing to the block boundary"
                    )
                if block_final:
                    # In block mode intermediate states are not materialized
                    # host-side; checkpoints land on block boundaries.
                    extra = dict(ckpt_extra or {})
                    extra["early_stop_state"] = early.state_dict()
                    if plateau is not None:
                        extra["plateau_state"] = plateau.state_dict()
                    self.ckpt.on_epoch_end(self._ckpt_state(), epoch, mon, config=self.config, extra=extra)
                self.logger.log_epoch(
                    epoch, epoch_metrics,
                    # per-epoch step even in block mode (state.step is the
                    # block-final step for cached epochs; identical-step
                    # rows would coalesce in W&B charts)
                    step=(epoch + 1) * steps_per_epoch,
                )
                if (stop or stop_pending) and block_final:
                    print(f"[experiment] early stopping at epoch {epoch}")
                    break
            else:
                if block_final:
                    self.ckpt.on_epoch_end(self._ckpt_state(), epoch, None, config=self.config, extra=ckpt_extra)
                self.logger.log_epoch(
                    epoch, epoch_metrics,
                    # per-epoch step even in block mode (state.step is the
                    # block-final step for cached epochs; identical-step
                    # rows would coalesce in W&B charts)
                    step=(epoch + 1) * steps_per_epoch,
                )
            if self._preempt.triggered and block_final:
                # `last` was just checkpointed by on_epoch_end above (when
                # train.save is on); stopping here leaves a resumable run.
                hint = (
                    "resume with --ckpt last" if self.save
                    else "train.save is off: nothing was persisted"
                )
                print(
                    f"[experiment] preemption stop at epoch {epoch} ({hint})"
                )
                break

        if viz is not None:
            try:
                viz.on_train_end(self.logger)
                if cka is not None:
                    cka.on_train_end(
                        viz.save_dir if viz.save_enabled else None, self.logger
                    )
            except Exception as e:
                print(f"[viz] train-end artifacts skipped: {e}")

        # Fence in-flight async checkpoint writes before anything reads the
        # checkpoint dirs back (artifact upload below, run().test("best")).
        self.ckpt.wait()
        if self.save:
            # W&B model artifacts at train end (reference log_model=save).
            meta = {"monitor": monitor_key, "best_value": self.ckpt.best_value,
                    "best_epoch": self.ckpt.best_epoch}
            self.logger.log_checkpoint(self.ckpt.best_path, "best", metadata=meta)
            self.logger.log_checkpoint(self.ckpt.last_path, "last", metadata=meta)

        self.callback_metrics = dict(epoch_metrics)
        return epoch_metrics

    # -- test ----------------------------------------------------------------
    @_with_mesh
    def test(self, ckpt: Optional[str] = None) -> Dict[str, float]:
        self.datamodule.setup("test")
        if self.state is None:
            # eval-only entry: build an optimizer-shaped state to restore into
            spec = OptSpec.from_config(self.config, 1, monitor_metric=self.monitor)
            tx = build_optimizer(spec)
            self.state = self._init_state(tx)
        if ckpt:
            self.ckpt.wait()  # async saves must land before read-back
            self.state = self._restore_state(ckpt)
        metrics = self._eval_metrics(
            self.datamodule.test, "test", self.batch_size
        )
        self.logger.log_epoch(-1, metrics)
        self.callback_metrics.update(metrics)
        # Regression test report (denormalized plots) — viz subsystem.
        try:
            self._test_report()
        except Exception as e:  # plots must never fail the eval entry point
            print(f"[experiment] test report skipped: {e}")
        return metrics

    def _test_report(self) -> None:
        """Denormalized prediction report (reference `vit.py:217-295`)."""
        ds = self.datamodule.test
        if self.bundle.vit_config.task_type != "reg" or not isinstance(ds, RegSpecDataset):
            return
        viz_cfg = self.config.get("viz", {}) or {}
        if not viz_cfg.get("enable", False):
            return
        from vit_tpu.viz.plotter import RegressionPlotter

        logits, labels = self._run_eval(ds, self.batch_size)
        # Reference reads plotting.quick_mode at report time (`vit.py:288`).
        quick = bool((self.config.get("plotting", {}) or {}).get("quick_mode", False))
        plotter = RegressionPlotter(
            param_names=parse_param_list((self.config.get("data", {}) or {}).get("param")),
            denormalize=ds.denormalize,
            model_name=self.bundle.model_name,
            quick_mode=quick,
            label_bounds=_dataset_label_bounds(ds),
        )
        plotter.generate_all_plots(logits, labels, logger=self.logger)

    def run(self) -> Dict[str, float]:
        """``fit`` then ``test`` (reference `vit.py:463-465`)."""
        self.fit()
        ckpt = "best" if (self.save and self.ckpt.best_epoch is not None) else None
        metrics = self.test(ckpt=ckpt)
        self.logger.finish()
        return metrics
