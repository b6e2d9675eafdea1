"""Mesh construction and sharding rules.

TPU-native replacement for the reference's device selection + Lightning
``'ddp'`` strategy (`/root/reference/src/hardware_utils.py:44-95`,
`/root/reference/src/basemodule.py:226-229`): instead of one process per
GPU with NCCL all-reduce, we build a `jax.sharding.Mesh` and shard the
batch over its ``data`` axis; XLA inserts the gradient all-reduce over ICI.
A ``model`` axis is reserved for tensor-parallel sharding of the larger
image-ViT family (hidden/head dims), unused (size 1) for the spectra
baseline.

Multi-host: call :func:`maybe_initialize_distributed` once per process;
the mesh then spans all hosts' devices (ICI within a slice, DCN across).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "device_grid",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "maybe_initialize_distributed",
    "num_data_shards",
    "zero1_shard_opt_state",
    "set_active_mesh",
    "active_mesh",
    "active_mesh_scope",
]

# The mesh the current Experiment (or test) is training under. Flax modules
# can't take a Mesh through their config dataclass without poisoning the
# jit cache key, so mesh-consuming kernels (ring attention) read it from
# here at TRACE time — it is a static compile-time constant, set once by
# Experiment before any step is compiled.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def active_mesh_scope(mesh: Optional[Mesh]):
    """Scope the active mesh to a block, restoring the previous value.

    ``Experiment.fit``/``test`` use this so a finished run cannot leak its
    mesh into later traces; library users wrapping manual step-building
    code get the same lifetime discipline.
    """
    prev = active_mesh()
    set_active_mesh(mesh)
    try:
        yield mesh
    finally:
        set_active_mesh(prev)


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched under a multi-host coordinator.

    No-op for single-host runs (the common case on v4-8/v5e-8 slices). On
    TPU pods ``jax.distributed.initialize()`` auto-detects the topology;
    launchers that aren't auto-detectable (manual process groups, the CPU
    integration test) pass the explicit trio via ``JAX_COORDINATOR_ADDRESS``
    + ``JAX_NUM_PROCESSES`` + ``JAX_PROCESS_ID``.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return  # single-host: decide from env alone — touching the backend
        # here (e.g. jax.process_count()) would initialize it and make a
        # later jax.distributed.initialize() impossible.
    kwargs = {}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized
        print(f"[mesh] jax.distributed.initialize skipped: {e}")


def device_grid(devs: Sequence, shape: Sequence[int]) -> np.ndarray:
    """Place ``devs`` into a ``shape`` grid, topology-aware on TPU.

    The grid's trailing axes carry the chatty collectives (``model``/
    ``pipe``), the leading axis the per-step gradient all-reduce
    (``data``), so placement must keep trailing-axis groups on the fast
    network:

    * **Multi-slice TPU** (devices carry distinct ``slice_index``): the
      ``data`` axis absorbs the DCN dimension — each trailing-axes group
      lives inside ONE slice (ICI), and only the data all-reduce crosses
      DCN (``mesh_utils.create_hybrid_device_mesh``).
    * **Single-slice TPU**: ``mesh_utils.create_device_mesh`` orders
      devices along the physical torus so neighboring mesh coordinates
      are ICI neighbors.
    * **CPU / virtual / unplaceable** (capped device lists, missing
      coords, indivisible shapes): deterministic enumeration order — the
      numerics are placement-independent, only collective latency is.
    """
    devs = list(devs)
    if len(devs) <= 1 or getattr(devs[0], "platform", "") != "tpu":
        return np.asarray(devs).reshape(shape)
    from jax.experimental import mesh_utils

    slice_ids = {getattr(d, "slice_index", 0) for d in devs}
    try:
        if len(slice_ids) > 1:
            n_slices = len(slice_ids)
            if shape[0] % n_slices != 0:
                raise ValueError(
                    f"data axis {shape[0]} not divisible by {n_slices} "
                    "slices; model/pipe groups would cross DCN"
                )
            ici = (shape[0] // n_slices,) + tuple(shape[1:])
            dcn = (n_slices,) + (1,) * (len(shape) - 1)
            return mesh_utils.create_hybrid_device_mesh(
                ici, dcn, devices=devs, allow_split_physical_axes=True
            )
        return mesh_utils.create_device_mesh(
            shape, devices=devs, allow_split_physical_axes=True
        )
    except Exception as e:  # perf-only concern: fall back, visibly
        print(f"[mesh] topology-aware placement unavailable ({e}); "
              "using enumeration order")
        return np.asarray(devs).reshape(shape)


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data", "model"),
    pipeline_parallel: int = 1,
) -> Mesh:
    """Build a ``(data, model[, pipe])`` mesh over the available devices.

    ``num_devices`` caps how many devices participate (reference
    ``train.gpus`` semantics); ``model_parallel`` splits off a TP axis.
    ``pipeline_parallel > 1`` appends a ``pipe`` axis for GPipe stages
    (:mod:`vit_tpu.parallel.pipeline`); with the default 1 the mesh stays
    two-axis so existing shardings/specs are unchanged. Device placement
    into the grid is topology-aware on TPU (see :func:`device_grid`):
    model/pipe groups ride ICI, the data axis crosses slices.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None and num_devices > 0:
        devs = devs[: int(num_devices)]
    n = len(devs)
    pp = int(pipeline_parallel)
    if model_parallel < 1 or pp < 1 or n % (model_parallel * pp) != 0:
        raise ValueError(
            f"model_parallel={model_parallel} x pipeline_parallel={pp} "
            f"must divide device count {n}"
        )
    if pp > 1:
        shape = (n // (model_parallel * pp), model_parallel, pp)
        return Mesh(device_grid(devs, shape),
                    axis_names=tuple(axis_names) + ("pipe",))
    shape = (n // model_parallel, model_parallel)
    return Mesh(device_grid(devs, shape), axis_names=tuple(axis_names))


def num_data_shards(mesh: Mesh) -> int:
    return mesh.shape.get("data", 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-1 layout: shard each moment leaf's leading dim over ``data``.

    Leaves whose leading dim doesn't divide the data-parallel degree (and
    scalar step counts) replicate. Sharding is layout only — the optimizer
    update is elementwise per leaf, so training math is unchanged
    (tests/test_zero1.py pins parity against the replicated path). This is
    THE production rule: `Experiment._init_state` and the driver dryrun
    (`__graft_entry__.dryrun_multichip`) both call it, so they can't drift.
    """
    dp = mesh.shape.get("data", 1)
    repl = NamedSharding(mesh, P())

    def shard_leaf(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp == 0:
            spec = P(*(["data"] + [None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(shard_leaf, opt_state)


def infer_param_shardings(params, mesh: Mesh):
    """Column-parallel kernel layout over the ``model`` axis (GSPMD seeding).

    Dense kernels shard their output-features dim when divisible by the TP
    degree; GSPMD propagates activation shardings and inserts the collectives.
    Biases, LayerNorm scales, and indivisible kernels replicate. This is a
    sharding *hint*, not a hand-scheduled Megatron plan (no explicit
    row-parallel pairing; XLA chooses the gather/reduce points). Exposed via
    ``train.model_parallel`` in the Experiment config and exercised by
    ``tests/test_model_parallel.py`` and the driver dryrun. With ``model=1``
    this degenerates to pure data parallelism (the reference's only mode).
    """
    tp = mesh.shape.get("model", 1)
    _MOE_EXPERT_LEAVES = {"wi", "wi_bias", "wo", "wo_bias"}

    def rule(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if (
            tp > 1
            and hasattr(leaf, "ndim")
            and "moe" in names
            and names
            and names[-1] in _MOE_EXPERT_LEAVES
            and leaf.shape[0] % tp == 0
        ):
            # Expert parallelism: the stacked expert dim shards over
            # `model` — each device holds E/K experts; GSPMD inserts the
            # token all-to-alls around the expert einsums.
            return NamedSharding(
                mesh, P(*(["model"] + [None] * (leaf.ndim - 1)))
            )
        if (
            tp > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] % tp == 0
            and leaf.shape[-1] >= 2 * tp
        ):
            spec = P(*([None] * (leaf.ndim - 1) + ["model"]))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    import jax as _jax

    return _jax.tree_util.tree_map_with_path(rule, params)
