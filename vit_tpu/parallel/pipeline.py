"""GPipe-style pipeline parallelism over a mesh axis.

Beyond-reference scaling capability (SURVEY §2.9 lists PP as "not in
reference"; the reference's biggest model fits one device). The encoder's
``L`` uniform :class:`~vit_tpu.models.vit.ViTLayer` blocks are split into
``P = mesh.shape[axis]`` contiguous stages; each device owns ``L/P`` layers
and the batch flows through the ring as ``M`` microbatches in the classic
GPipe schedule:

    tick t (of M + P - 1):  stage 0 ingests microbatch t (while t < M);
                            every stage runs its layers on its current
                            buffer; outputs hop to the next stage via
                            ``ppermute`` (ICI neighbor traffic).

The schedule is a ``lax.scan`` over ticks inside one ``shard_map`` — fully
compiled, no per-microbatch dispatch — and is differentiable end-to-end:
``ppermute`` is linear (its transpose is the reversed ring) so ``jax.grad``
yields the mirrored 1B schedule automatically, with per-stage parameter
gradients landing on the stage that owns them. Bubble fraction is the
standard ``(P-1)/(M+P-1)``; raise ``num_microbatches`` to amortize.

Parameters stay in the CANONICAL per-layer layout (``encoder/layer_{i}``)
everywhere else in the framework — checkpoints, the torch bridge, freeze
masks, and the monolithic eval path are untouched. :func:`stack_stage_params`
restacks them to ``(P, L/P, ...)`` leaves inside the jitted forward; GSPMD
shards the stacked copy over ``axis`` (sharding-constrained here) and the
stack/grad-unstack ops stay inside the compiled program. Deployments that
must never materialize replicated full params can call
:func:`pipeline_encoder` directly with stacked, stage-sharded params.

Dropout under pipelining draws per-(stage, layer, tick) folded streams —
semantically equivalent to, but a different stream than, the monolithic
forward (RNG parity in this rebuild is semantic, not bitwise — README
"Intentional differences"). Deterministic forwards match the monolithic
model to float tolerance.

No reference analogue (rebuild-only); the closest contract is the mesh
design reserved in SURVEY §2.9's parallelism checklist.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "stack_stage_params",
    "unstack_stage_params",
    "stage_resident_params",
    "canonical_params",
    "resident_param_shardings",
    "convert_params_shaped",
    "pipeline_encoder",
    "apply_pipelined",
]


def _layer_count(encoder_params: Dict[str, Any]) -> int:
    layers = [k for k in encoder_params if k.startswith("layer_")]
    n = len(layers)
    missing = [f"layer_{i}" for i in range(n) if f"layer_{i}" not in encoder_params]
    if missing:
        raise ValueError(f"encoder params missing {missing}")
    return n


def stack_stage_params(encoder_params: Dict[str, Any], num_stages: int):
    """``{layer_0..layer_{L-1}}`` -> pytree with ``(P, L/P, ...)`` leaves.

    Layer i lands at stage ``i // (L/P)``, slot ``i % (L/P)`` — contiguous
    stage assignment, preserving execution order under the per-stage scan.
    """
    num_layers = _layer_count(encoder_params)
    if num_stages < 1 or num_layers % num_stages != 0:
        raise ValueError(
            f"num_hidden_layers={num_layers} must be divisible by the "
            f"pipeline degree {num_stages}"
        )
    per_stage = num_layers // num_stages
    # Host-side conversions (checkpoint save/restore of stage-resident
    # states) come in as numpy and must STAY numpy — jnp.stack would land
    # the full gathered tree on the default device.
    stacked = jax.tree_util.tree_map(
        lambda *leaves: (
            np.stack(leaves)
            if all(isinstance(l, np.ndarray) for l in leaves)
            else jnp.stack(leaves)
        ),
        *[encoder_params[f"layer_{i}"] for i in range(num_layers)],
    )
    return jax.tree_util.tree_map(
        lambda leaf: leaf.reshape((num_stages, per_stage) + leaf.shape[1:]),
        stacked,
    )


def unstack_stage_params(stacked) -> Dict[str, Any]:
    """Inverse of :func:`stack_stage_params` (canonical per-layer dict)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    if not leaves:
        raise ValueError("empty stage params")
    num_stages, per_stage = leaves[0].shape[:2]
    flat = jax.tree_util.tree_map(
        lambda leaf: leaf.reshape((num_stages * per_stage,) + leaf.shape[2:]),
        stacked,
    )
    return {
        f"layer_{i}": jax.tree_util.tree_map(lambda leaf, i=i: leaf[i], flat)
        for i in range(num_stages * per_stage)
    }


def stage_resident_params(params: Dict[str, Any], num_stages: int):
    """Full params tree in the stage-RESIDENT layout: ``encoder`` replaced
    by its stacked ``(P, L/P, ...)`` form (everything else unchanged).

    This is the layout a memory-real pipeline run holds on device — the
    stacked leading dim shards over the ``pipe`` mesh axis so each device
    owns ONLY its stage's layer parameters (and, because the optimizer is
    initialized on this tree, only its stage's optimizer moments).
    Checkpoints always store the canonical layout (:func:`canonical_params`
    inverts this), so ``--ckpt``/torch-bridge interchange is unaffected.
    """
    out = dict(params)
    out["encoder"] = stack_stage_params(params["encoder"], num_stages)
    return out


def canonical_params(resident: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stage_resident_params` (per-layer ``encoder``)."""
    out = dict(resident)
    out["encoder"] = unstack_stage_params(resident["encoder"])
    return out


def resident_param_shardings(resident, mesh: Mesh, axis: str = "pipe",
                             tp_axis: Optional[str] = None):
    """Shardings making the resident layout memory-real: every stacked
    encoder leaf shards its stage dim over ``axis`` (1/P bytes per device);
    non-encoder leaves replicate. With ``tp_axis`` (pipeline x tensor
    parallelism) encoder kernels additionally shard their output-features
    dim over that axis when divisible (the
    :func:`vit_tpu.parallel.mesh.infer_param_shardings` rule, shifted by
    the two stacked leading dims), and MoE expert leaves shard the expert
    dim instead (expert parallelism inside the pipeline).
    """
    repl = NamedSharding(mesh, P())
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    _MOE_EXPERT_LEAVES = {"wi", "wi_bias", "wo", "wo_bias"}

    def enc_rule(path, leaf):
        spec = [axis] + [None] * (leaf.ndim - 1)
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if tp > 1 and "moe" in names and names[-1] in _MOE_EXPERT_LEAVES:
            # stacked MoE leaf: (P, L/P, E, ...) — expert dim at index 2
            if leaf.ndim >= 3 and leaf.shape[2] % tp == 0:
                spec[2] = tp_axis
        elif (
            tp > 1
            and leaf.ndim >= 4  # (P, L/P) + a >=2-D kernel
            and leaf.shape[-1] % tp == 0
            and leaf.shape[-1] >= 2 * tp
        ):
            spec[-1] = tp_axis
        return NamedSharding(mesh, P(*spec))

    out = {
        k: jax.tree_util.tree_map(lambda _: repl, v)
        for k, v in resident.items()
        if k != "encoder"
    }
    out["encoder"] = jax.tree_util.tree_map_with_path(
        enc_rule, resident["encoder"]
    )
    return out


def convert_params_shaped(tree, params_treedef, convert_fn):
    """Apply ``convert_fn`` to every subtree of ``tree`` whose structure
    equals ``params_treedef``, passing other leaves through.

    This converts optimizer state between the canonical and stage-resident
    layouts without knowing the optimizer: optax moments (AdamW mu/nu,
    SGD trace, ...) are params-SHAPED subtrees, so structural matching
    finds exactly them; step counts and schedule scalars pass through.
    """

    def is_params(x):
        return jax.tree_util.tree_structure(x) == params_treedef

    return jax.tree_util.tree_map(
        lambda x: convert_fn(x) if is_params(x) else x, tree, is_leaf=is_params
    )


def _stage_body(cfg, stage_params, h, *, deterministic, dropout_rng,
                stage_index, per_stage, tick, collect_aux=False):
    """Run one stage's ``L/P`` layers (scan over the stacked leading dim).

    ``collect_aux``: also collect the layers' sown ``losses`` collection
    (the MoE routers' load-balance loss) — returns ``(h, aux_sum)`` where
    ``aux_sum`` is the sum over this stage's layers for THIS tick's
    occupant microbatch."""
    from vit_tpu.models.vit import ViTLayer

    layer_cls = ViTLayer
    if getattr(cfg, "remat", False) is True:  # "mlp" remats inside the layer
        layer_cls = nn.remat(ViTLayer, static_argnums=(2, 3))
    layer = layer_cls(cfg)

    def body(h, xs):
        w, local_idx = xs
        rngs = None
        if not deterministic:
            # Unique stream per (global layer, tick): the tick identifies
            # the microbatch occupying this stage.
            key = jax.random.fold_in(
                jax.random.fold_in(dropout_rng, stage_index * per_stage + local_idx),
                tick,
            )
            rngs = {"dropout": key}
        if collect_aux:
            h, cols = layer.apply(
                {"params": w}, h, deterministic, False,
                rngs=rngs, mutable=["losses"],
            )
            # Pre-weighted, matching make_train_forward's monolithic
            # aggregation: aux_w * LB + z_w * z per layer.
            aux_w = float(getattr(cfg, "moe_aux_weight", 0.0) or 0.0)
            z_w = float(getattr(cfg, "moe_z_weight", 0.0) or 0.0)
            flat, _ = jax.tree_util.tree_flatten_with_path(
                cols.get("losses", {})
            )
            aux = jnp.zeros((), jnp.float32)
            for p, v in flat:
                w_ = z_w if "moe_z" in jax.tree_util.keystr(p) else aux_w
                aux = aux + w_ * jnp.mean(v)
            return h, aux
        h = layer.apply({"params": w}, h, deterministic, False, rngs=rngs)
        return h, jnp.zeros((), jnp.float32)

    h, auxes = jax.lax.scan(
        body, h, (stage_params, jnp.arange(per_stage, dtype=jnp.int32))
    )
    return h, auxes.sum()


def pipeline_encoder(
    stage_params,
    tokens: jnp.ndarray,
    *,
    cfg,
    mesh: Mesh,
    axis: str = "pipe",
    num_microbatches: int,
    batch_axis: Optional[str] = None,
    deterministic: bool = True,
    dropout_rng=None,
    collect_aux: bool = False,
    auto_axes: tuple = (),
    param_specs=None,
):
    """Encoder forward with layers pipelined over ``mesh.shape[axis]`` stages.

    ``stage_params``: pytree with ``(P, L/P, ...)`` leaves (see
    :func:`stack_stage_params`). ``tokens``: embedded ``(B, T, H)`` with
    ``B % num_microbatches == 0``; ``batch_axis`` optionally shards the
    microbatch dim over that mesh axis (compose with data parallelism; the
    per-microbatch rows must then divide by its size). Returns ``(B, T, H)``
    replicated over ``axis`` (the last stage's results are broadcast so the
    downstream LN/head can stay replicated, exactly like the DP path).

    ``collect_aux``: also return the layers' sown load-balance loss (MoE
    routers) averaged over layers AND microbatches — ``(out, aux)``. The
    per-microbatch mean is the pipelined estimator of the monolithic
    full-batch value (semantic, not bitwise, parity — the LB loss is
    nonlinear in the batch). Bubble ticks are masked out of the sum.

    ``auto_axes``: mesh axes left to GSPMD INSIDE the pipeline body (e.g.
    ``('model',)`` for pipeline x tensor/expert parallelism: the stage-local
    matmuls then run on 'model'-sharded kernels with XLA inserting the TP
    collectives). ``param_specs``: per-leaf shardings for the stacked
    params (default: stage dim over ``axis``, rest replicated).
    """
    num_stages = mesh.shape[axis]
    batch, seq, hid = tokens.shape
    m = int(num_microbatches)
    if m < 1 or batch % m != 0:
        raise ValueError(
            f"batch {batch} must be divisible by num_microbatches={m}"
        )
    leaves = jax.tree_util.tree_leaves(stage_params)
    if not leaves or leaves[0].shape[0] != num_stages:
        raise ValueError(
            f"stage params leading dim {leaves[0].shape[0] if leaves else 0} "
            f"!= '{axis}' axis size {num_stages}"
        )
    per_stage = leaves[0].shape[1]
    if not deterministic and dropout_rng is None:
        raise ValueError("dropout_rng is required when deterministic=False")
    if getattr(cfg, "attn_impl", "auto") == "ring":
        raise ValueError(
            "attn_impl='ring' cannot run inside the pipeline (the ring "
            "shard_maps the sequence over its own mesh axis); use "
            "'auto'/'xla'/'flash' with pipeline_parallel"
        )

    mb = batch // m
    x_mb = tokens.reshape(m, mb, seq, hid)
    if dropout_rng is None:
        # A placeholder key keeps the shard_map signature static; the
        # deterministic branch never folds it.
        dropout_rng = jax.random.PRNGKey(0)

    x_spec = P(None, batch_axis, None, None)
    perm = [(i, i + 1) for i in range(num_stages - 1)]
    n_layers = num_stages * per_stage

    def body(w_loc, x_loc, rng_loc):
        w_loc = jax.tree_util.tree_map(lambda l: l[0], w_loc)  # (L/P, ...)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == num_stages - 1

        def tick_fn(carry, t):
            cur, aux_acc = carry
            feed = jax.lax.dynamic_index_in_dim(
                x_loc, jnp.minimum(t, m - 1), keepdims=False
            )
            h_in = jnp.where(is_first, feed, cur)
            y, aux = _stage_body(
                cfg, w_loc, h_in,
                deterministic=deterministic, dropout_rng=rng_loc,
                stage_index=idx, per_stage=per_stage, tick=t,
                collect_aux=collect_aux,
            )
            # Bubble ticks (t < idx or t >= m + idx) process garbage buffers;
            # their aux must not pollute the load-balance loss.
            valid = ((t >= idx) & (t < m + idx)).astype(jnp.float32)
            aux_acc = aux_acc + aux * valid
            if num_stages == 1:
                return (y, aux_acc), y
            nxt = jax.lax.ppermute(y, axis, perm)
            return (nxt, aux_acc), y

        # The carry is pipe-VARYING (each stage holds a different in-flight
        # activation); a plain zeros constant would type as replicated and
        # fail scan's carry-type check under shard_map.
        cur0 = jax.lax.pcast(jnp.zeros_like(x_loc[0]), axis, to="varying")
        # The aux depends on the (data-varying) activations, so its carry
        # must be varying over the batch axis too when one is manual.
        aux_axes = (axis,) + ((batch_axis,) if batch_axis else ())
        aux0 = jax.lax.pcast(jnp.zeros((), jnp.float32), aux_axes, to="varying")
        (_, aux_sum), ys = jax.lax.scan(
            tick_fn, (cur0, aux0),
            jnp.arange(m + num_stages - 1, dtype=jnp.int32),
        )
        # Ticks P-1 .. M+P-2 on the LAST stage are the M microbatch outputs,
        # in order; other stages' tails are in-flight values to discard.
        out = jnp.where(is_last, ys[num_stages - 1:], 0)
        out = jax.lax.psum(out, axis)
        if collect_aux:
            # mean over (layers, microbatches, data shards): each shard's
            # per-microbatch LB loss is a batch-mean over ITS rows.
            denom = n_layers * m
            for a in aux_axes[1:]:
                denom *= mesh.shape[a]
            aux = jax.lax.psum(aux_sum, aux_axes) / denom
            return out, aux
        return out

    manual = frozenset(mesh.axis_names) - frozenset(auto_axes)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), x_spec, P()),
        out_specs=(x_spec, P()) if collect_aux else x_spec,
        axis_names=manual,
    )
    if param_specs is None:
        param_specs = jax.tree_util.tree_map(
            lambda l: NamedSharding(mesh, P(axis)), stage_params
        )
    with mesh:
        stage_params = jax.tree_util.tree_map(
            jax.lax.with_sharding_constraint, stage_params, param_specs
        )
        res = fn(stage_params, x_mb, dropout_rng)
    if collect_aux:
        out, aux = res
        return out.reshape(batch, seq, hid), aux
    return res.reshape(batch, seq, hid)


def apply_pipelined(
    module,
    params,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    num_microbatches: int,
    axis: str = "pipe",
    batch_axis: Optional[str] = None,
    deterministic: bool = True,
    rngs: Optional[Dict[str, Any]] = None,
    resident: bool = False,
    tp_axis: Optional[str] = None,
):
    """Full-model forward with the encoder pipelined over ``axis``.

    Mirrors :class:`~vit_tpu.models.vit.SpecViT.__call__`'s composition
    ([preprocessor] -> embeddings -> encoder -> LN -> CLS -> head) on the
    SAME canonical parameter tree ``module.apply`` consumes (or, with
    ``resident=True``, the stage-resident tree from
    :func:`stage_resident_params` — no in-step restack, params stay
    1/P-sharded), so checkpoints and the torch bridge are oblivious to
    pipelining. Embeddings, final LN, and the head run replicated over
    ``axis`` (they are a negligible FLOP fraction); only the encoder —
    where the layers and memory are — is staged. For MoE models
    (``cfg.moe_experts > 1``) returns ``(logits, aux)`` with the routers'
    load-balance loss, matching :func:`vit_tpu.train.loop
    .make_train_forward`'s contract. ``tp_axis`` composes tensor/expert
    parallelism inside each stage: that mesh axis stays GSPMD-auto in the
    pipeline body and encoder kernels shard over it
    (:func:`resident_param_shardings`). ``capture`` diagnostics are not
    supported here: the viz capture path uses the monolithic
    ``module.apply`` on the canonical params.
    """
    from vit_tpu.models.vit import (
        LN_EPS,
        ImageEmbeddings,
        SpectraEmbeddings,
    )
    from vit_tpu.models.tokenization import KERNEL_INIT

    cfg = module.cfg
    dropout_rng = (rngs or {}).get("dropout")
    if not deterministic and dropout_rng is None:
        raise ValueError("rngs={'dropout': key} is required for training mode")

    if module.preprocessor is not None:
        x = module.preprocessor.apply({"params": params["preprocessor"]}, x)

    emb_cls = ImageEmbeddings if cfg.input_kind == "image" else SpectraEmbeddings
    emb_rngs = (
        None
        if deterministic
        else {"dropout": jax.random.fold_in(dropout_rng, 0x0E)}
    )
    tokens = emb_cls(cfg).apply(
        {"params": params["embeddings"]}, x, deterministic, rngs=emb_rngs
    )

    if resident:
        stacked = params["encoder"]  # already (P, L/P, ...), pipe-sharded
    else:
        stacked = stack_stage_params(params["encoder"], mesh.shape[axis])
    is_moe = int(getattr(cfg, "moe_experts", 0) or 0) > 1
    param_specs = None
    auto_axes: tuple = ()
    if tp_axis is not None and mesh.shape.get(tp_axis, 1) > 1:
        auto_axes = (tp_axis,)
        param_specs = resident_param_shardings(
            {"encoder": stacked}, mesh, axis=axis, tp_axis=tp_axis
        )["encoder"]
    res = pipeline_encoder(
        stacked,
        tokens,
        cfg=cfg,
        mesh=mesh,
        axis=axis,
        num_microbatches=num_microbatches,
        batch_axis=batch_axis,
        deterministic=deterministic,
        dropout_rng=(
            None
            if deterministic
            else jax.random.fold_in(dropout_rng, 0x0F)
        ),
        collect_aux=is_moe,
        auto_axes=auto_axes,
        param_specs=param_specs,
    )
    h, aux = res if is_moe else (res, None)

    h = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype).apply(
        {"params": params["layernorm"]}, h
    )
    cls_token = h[:, 0, :]
    head_name = "classifier" if cfg.task_type == "cls" else "regressor"
    logits = nn.Dense(
        cfg.num_labels, dtype=jnp.float32, kernel_init=KERNEL_INIT
    ).apply({"params": params[head_name]}, cls_token.astype(jnp.float32))
    return (logits, aux) if is_moe else logits
