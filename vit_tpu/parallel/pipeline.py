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
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "stack_stage_params",
    "unstack_stage_params",
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
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
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


def _stage_body(cfg, stage_params, h, *, deterministic, dropout_rng,
                stage_index, per_stage, tick):
    """Run one stage's ``L/P`` layers (scan over the stacked leading dim)."""
    from vit_tpu.models.vit import ViTLayer

    layer_cls = ViTLayer
    if getattr(cfg, "remat", False) is True:  # "mlp" remats inside the layer
        layer_cls = nn.remat(ViTLayer, static_argnums=(2, 3))
    layer = layer_cls(cfg)

    def body(h, xs):
        w, local_idx = xs
        if deterministic:
            h = layer.apply({"params": w}, h, True, False)
        else:
            # Unique stream per (global layer, tick): the tick identifies
            # the microbatch occupying this stage.
            key = jax.random.fold_in(
                jax.random.fold_in(dropout_rng, stage_index * per_stage + local_idx),
                tick,
            )
            h = layer.apply(
                {"params": w}, h, False, False, rngs={"dropout": key}
            )
        return h, None

    h, _ = jax.lax.scan(
        body, h, (stage_params, jnp.arange(per_stage, dtype=jnp.int32))
    )
    return h


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
) -> jnp.ndarray:
    """Encoder forward with layers pipelined over ``mesh.shape[axis]`` stages.

    ``stage_params``: pytree with ``(P, L/P, ...)`` leaves (see
    :func:`stack_stage_params`). ``tokens``: embedded ``(B, T, H)`` with
    ``B % num_microbatches == 0``; ``batch_axis`` optionally shards the
    microbatch dim over that mesh axis (compose with data parallelism; the
    per-microbatch rows must then divide by its size). Returns ``(B, T, H)``
    replicated over ``axis`` (the last stage's results are broadcast so the
    downstream LN/head can stay replicated, exactly like the DP path).
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

    def body(w_loc, x_loc, rng_loc):
        w_loc = jax.tree_util.tree_map(lambda l: l[0], w_loc)  # (L/P, ...)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == num_stages - 1

        def tick_fn(cur, t):
            feed = jax.lax.dynamic_index_in_dim(
                x_loc, jnp.minimum(t, m - 1), keepdims=False
            )
            h_in = jnp.where(is_first, feed, cur)
            y = _stage_body(
                cfg, w_loc, h_in,
                deterministic=deterministic, dropout_rng=rng_loc,
                stage_index=idx, per_stage=per_stage, tick=t,
            )
            if num_stages == 1:
                return y, y
            nxt = jax.lax.ppermute(y, axis, perm)
            return nxt, y

        # The carry is pipe-VARYING (each stage holds a different in-flight
        # activation); a plain zeros constant would type as replicated and
        # fail scan's carry-type check under shard_map.
        cur0 = jax.lax.pcast(jnp.zeros_like(x_loc[0]), axis, to="varying")
        _, ys = jax.lax.scan(
            tick_fn, cur0, jnp.arange(m + num_stages - 1, dtype=jnp.int32)
        )
        # Ticks P-1 .. M+P-2 on the LAST stage are the M microbatch outputs,
        # in order; other stages' tails are in-flight values to discard.
        out = jnp.where(is_last, ys[num_stages - 1:], 0)
        return jax.lax.psum(out, axis)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), x_spec, P()),
        out_specs=x_spec,
    )
    with mesh:
        stage_params = jax.tree_util.tree_map(
            lambda l: jax.lax.with_sharding_constraint(
                l, NamedSharding(mesh, P(axis))
            ),
            stage_params,
        )
        out = fn(stage_params, x_mb, dropout_rng)
    return out.reshape(batch, seq, hid)


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
) -> jnp.ndarray:
    """Full-model forward with the encoder pipelined over ``axis``.

    Mirrors :class:`~vit_tpu.models.vit.SpecViT.__call__`'s composition
    ([preprocessor] -> embeddings -> encoder -> LN -> CLS -> head) on the
    SAME canonical parameter tree ``module.apply`` consumes, so checkpoints
    and the torch bridge are oblivious to pipelining. Embeddings, final LN,
    and the head run replicated over ``axis`` (they are a negligible FLOP
    fraction); only the encoder — where the layers and memory are — is
    staged. ``capture`` diagnostics are not supported here: the viz capture
    path uses the monolithic ``module.apply`` on the same params.
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

    stacked = stack_stage_params(params["encoder"], mesh.shape[axis])
    h = pipeline_encoder(
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
    )

    h = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype).apply(
        {"params": params["layernorm"]}, h
    )
    cls_token = h[:, 0, :]
    head_name = "classifier" if cfg.task_type == "cls" else "regressor"
    logits = nn.Dense(
        cfg.num_labels, dtype=jnp.float32, kernel_init=KERNEL_INIT
    ).apply({"params": params[head_name]}, cls_token.astype(jnp.float32))
    return logits
