"""Ring attention: sequence/context-parallel exact attention over a mesh axis.

Long-context capability beyond the reference (SURVEY §5 lists SP/CP as the
stretch goal: the reference's max is ~4k tokens on one device). Sequences
longer than one chip's HBM are sharded over a mesh axis; each device holds a
``T/N`` slice of Q, K, V and computes its queries' exact attention by
rotating the K/V shards around the ring with ``ppermute`` (ICI
neighbor-to-neighbor traffic — the TPU torus's cheapest collective) while
accumulating an online softmax, exactly like flash attention's k-block loop
but with "block" = "device shard":

    for step in range(N):                # lax.scan (reverse-differentiable)
        s      = q @ k_cur^T * scale
        m_new  = max(m, rowmax(s));  p = exp(s - m_new)
        acc    = acc * exp(m - m_new) + p @ v_cur
        l      = l * exp(m - m_new) + rowsum(p)
        k_cur, v_cur = ppermute(k_cur), ppermute(v_cur)   # ring shift

The math is the standard (non-causal) softmax attention — bit-compatible
with :func:`vit_tpu.ops.flash_attention.flash_attention` up to fp rounding —
and JAX autodiff differentiates through the scan + ppermute (the transpose
of a ring shift is the reverse shift), so no hand-written backward is
needed; the scan body is ``jax.checkpoint``-ed so the backward recomputes
each step's probability block instead of storing all N of them. Per-device
memory is O(T_local^2) transient for one block's scores (forward AND
backward) and O(T_local) persistent for K/V — context length scales
linearly with the ring size, for training as well as inference.

Attention-probability dropout (reference semantics
`/root/reference/src/models/vit_with_rope.py:79-81`) is applied IN-RING via
the same counter-based hash masks as the flash kernel: each device masks
its (Tl, Tl) block of the logically global (T, T) probability matrix using
GLOBAL coordinates (query offset from its ring position, key offset from
the rotation step, batch offset from the data shard), so the sharded
computation draws exactly the mask an unsharded run with the same seed
would. Like the flash kernel, the mask applies to the numerator
accumulator only — the softmax normalizer sums undropped probabilities,
matching ``dropout(softmax(s)) @ v``.

Usage (T must divide by the mesh axis size)::

    mesh = make_mesh(num_devices=8)            # ('data', 'model')
    out = ring_attention(q, k, v, mesh=mesh, axis="model",
                         batch_axis="data")    # DP batch + SP sequence
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention"]


def _ring_body(q, k, v, dropout_seed=None, *, axis: str, scale: float,
               batch_axis: Optional[str], dropout_rate: float):
    """Per-device computation under shard_map; q/k/v: (B, H, Tl, d)."""
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    t_local = q.shape[2]
    ring_pos = jax.lax.axis_index(axis)

    qs = q.astype(jnp.float32) * scale

    # Derive the carries from q so they inherit its varying-manual-axes
    # type (scan under shard_map requires carry in/out vma to match).
    acc0 = jnp.zeros_like(qs)
    m0 = jnp.full_like(qs[..., :1], -jnp.inf)
    l0 = jnp.zeros_like(qs[..., :1])

    use_dropout = dropout_rate > 0.0 and dropout_seed is not None
    if use_dropout:
        # Global coordinates of this device's probability block: masks must
        # be consistent with the unsharded (B, H, T, T) layout.
        b_off = (
            jax.lax.axis_index(batch_axis) * q.shape[0] if batch_axis else 0
        )
        q_off = ring_pos * t_local

    def attend(acc, m, l, k_cur, v_cur, step):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        if use_dropout:
            from vit_tpu.ops.dropout import hash_keep_mask

            # At rotation `step`, this device holds the K/V shard that
            # started on device (ring_pos - step) mod n.
            k_off = ((ring_pos - step) % n) * t_local
            keep = hash_keep_mask(
                p.shape, dropout_rate, dropout_seed,
                offsets=(b_off, 0, q_off, k_off),
            )
            p_acc = p * keep  # numerator only; l sums undropped p
        else:
            p_acc = p
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p_acc, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        return acc, m_new, l

    # Rematerialize per ring step: without this, autodiff stores the
    # (B, H, Tl, Tl) probability block of EVERY scan step as a residual —
    # O(T^2/N) per device, defeating the long-context purpose. Checkpointing
    # keeps only the O(Tl*d) step inputs and recomputes s/p in the backward.
    attend = jax.checkpoint(attend)

    def step_fn(carry, step):
        acc, m, l, k_cur, v_cur = carry
        acc, m, l = attend(acc, m, l, k_cur, v_cur, step)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (acc, m, l, k_nxt, v_nxt), None

    # n-1 rotate-and-attend steps, then the last shard without the final
    # rotation (which would only be discarded — 2 wasted ICI collectives).
    (acc, m, l, k_last, v_last), _ = jax.lax.scan(
        step_fn, (acc0, m0, l0, k, v), jnp.arange(n - 1)
    )
    acc, _, l = attend(acc, m, l, k_last, v_last, n - 1)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    batch_axis: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Exact softmax attention with the sequence sharded over ``axis``.

    ``q, k, v``: (B, H, T, d) with ``T % mesh.shape[axis] == 0``; returns
    (B, H, T, d) with the same sequence sharding. Scale is ``d**-0.5``.
    ``batch_axis`` additionally shards B over that mesh axis (compose with
    data parallelism); ``dropout_rate``/``dropout_seed`` enable in-ring
    attention-probability dropout (inverted, counter-based masks).
    """
    b, h, t, d = q.shape
    n = mesh.shape[axis]
    if t % n != 0:
        raise ValueError(
            f"sequence length {t} must be divisible by the '{axis}' "
            f"axis size {n}"
        )
    if batch_axis is not None and b % mesh.shape[batch_axis] != 0:
        raise ValueError(
            f"batch {b} must be divisible by the '{batch_axis}' "
            f"axis size {mesh.shape[batch_axis]}"
        )
    spec = P(batch_axis, None, axis, None)
    in_specs = (spec, spec, spec)
    if dropout_rate > 0.0 and dropout_seed is not None:
        in_specs = in_specs + (P(),)
        args = (q, k, v, jnp.asarray(dropout_seed, jnp.int32))
        rate = float(dropout_rate)
    else:
        args = (q, k, v)
        rate = 0.0
    fn = jax.shard_map(
        partial(
            _ring_body, axis=axis, scale=d**-0.5, batch_axis=batch_axis,
            dropout_rate=rate,
        ),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=spec,
    )
    with mesh:
        q, k, v = (
            jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
            for x in (q, k, v)
        )
        return fn(*args)
