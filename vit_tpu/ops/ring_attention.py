"""Ring attention: sequence/context-parallel exact attention over a mesh axis.

Long-context capability beyond the reference (SURVEY §5 lists SP/CP as the
stretch goal: the reference's max is ~4k tokens on one device). Sequences
longer than one chip's HBM are sharded over a mesh axis; each device holds a
``T/N`` slice of Q, K, V and computes its queries' exact attention by
rotating the K/V shards around the ring with ``ppermute`` (ICI
neighbor-to-neighbor traffic — the TPU torus's cheapest collective) while
accumulating an online softmax, exactly like flash attention's k-block loop
but with "block" = "device shard".

Within each ring step the local shard is itself processed **blockwise**
(flash-style inner loop over ``block_k``-column key blocks), so the
``(B, H, Tl, Tl)`` score matrix never materializes — peak transient memory
per device is ``O(Tl * block_k)`` and persistent memory is ``O(Tl * d)``:

    for step in range(N):                 # ring scan (K/V rotate)
        for blk in K_blocks(local shard): # flash inner loop
            s      = q @ k_blk^T * scale          # (Tl, block_k)
            m_new  = max(m, rowmax(s));  p = exp(s - m_new)
            acc    = acc * exp(m - m_new) + p @ v_blk
            l      = l * exp(m - m_new) + rowsum(p)
        k_cur, v_cur = ppermute(k_cur), ppermute(v_cur)

The math is the standard (non-causal) softmax attention — bit-compatible
with :func:`vit_tpu.ops.flash_attention.flash_attention` up to fp rounding.
The backward is a hand-written ``custom_vjp`` (the flash-attention backward
lifted to the ring): the forward saves only ``(q, k, v, o, lse)`` —
``O(Tl·d)`` residents per device — and the backward makes a second ring
pass in which dK/dV accumulators *travel with* their K/V shards, re-deriving
each probability block from the saved logsumexp (``p = exp(s - lse)``)
blockwise. Differentiating through the online-softmax scan instead would
checkpoint an ``O(Tl·d)`` accumulator per inner block — ``O(Tl²·d/block_k)``
residuals — which is why the custom VJP, not autodiff, is what makes
"context length scales linearly with ring size" true for training.

Attention-probability dropout (reference semantics
`/root/reference/src/models/vit_with_rope.py:79-81`) is applied IN-RING via
the same counter-based hash masks as the flash kernel: each device masks
its blocks of the logically global (T, T) probability matrix using GLOBAL
coordinates (query offset from its ring position, key offset from the
rotation step and inner block, batch offset from the data shard), so the
sharded computation draws exactly the mask an unsharded run with the same
seed would — block decomposition is an implementation detail, not an RNG
stream. Like the flash kernel, the mask applies to the numerator
accumulator only — the softmax normalizer sums undropped probabilities,
matching ``dropout(softmax(s)) @ v``; the backward reuses the flash
``D = rowsum(dO·O)`` identity, which survives the mask because the mask is
folded into O (derivation: `vit_tpu/ops/flash_attention.py:246-252`).

Usage (T must divide by the mesh axis size)::

    mesh = make_mesh(num_devices=8)            # ('data', 'model')
    out = ring_attention(q, k, v, mesh=mesh, axis="model",
                         batch_axis="data")    # DP batch + SP sequence
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_tpu.ops.dropout import hash_keep_mask

__all__ = ["ring_attention"]

# Default inner key-block width: large enough to keep the MXU busy, small
# enough that the (Tl, block_k) transient stays far below the (Tl, Tl) one.
_DEFAULT_BLOCK_K = 512


def _pick_block(block_k: Optional[int], t_local: int) -> int:
    """Largest divisor of ``t_local`` that is <= the requested block."""
    want = t_local if block_k is None else max(1, min(int(block_k), t_local))
    while t_local % want:
        want -= 1
    return want


def _split_blocks(x: jnp.ndarray, nb: int, bk: int) -> jnp.ndarray:
    """(B, H, Tl, d) -> (nb, B, H, bk, d) for scanning over key blocks."""
    b, h, t, d = x.shape
    return jnp.moveaxis(x.reshape(b, h, nb, bk, d), 2, 0)


def _merge_blocks(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_split_blocks`: (nb, B, H, bk, d) -> (B, H, Tl, d)."""
    nb, b, h, bk, d = y.shape
    return jnp.moveaxis(y, 0, 2).reshape(b, h, nb * bk, d)


def _offsets(axis: str, batch_axis: Optional[str], batch: int, t_local: int):
    """Global (batch, query-row) coordinates of this device's block."""
    ring_pos = jax.lax.axis_index(axis)
    b_off = (
        jax.lax.axis_index(batch_axis) * batch if batch_axis else 0
    )
    return ring_pos, b_off, ring_pos * t_local


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _ring_fwd(q, k, v, seed, params):
    axis, batch_axis, scale, rate, block_k = params
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    t_local = q.shape[2]
    bk = _pick_block(block_k, t_local)
    nb = t_local // bk
    ring_pos, b_off, q_off = _offsets(axis, batch_axis, q.shape[0], t_local)

    qs = q.astype(jnp.float32) * scale
    acc0 = jnp.zeros_like(qs)
    m0 = jnp.full_like(qs[..., :1], -jnp.inf)
    l0 = jnp.zeros_like(qs[..., :1])

    def inner(carry, blk):
        acc, m, l = carry
        k_blk, v_blk, col0 = blk
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (B, H, Tl, bk) — the only O(Tl*bk) transient
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        # Softmax denominator sums the UNMASKED probabilities (dropout
        # applies to normalized probs, not logits).
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        if rate > 0.0:
            p = p * hash_keep_mask(
                p.shape, rate, seed, offsets=(b_off, 0, q_off, col0)
            )
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (acc, m_new, l), None

    def attend(acc, m, l, k_cur, v_cur, step):
        # At rotation `step`, this device holds the K/V shard that started
        # on device (ring_pos - step) mod n.
        k_off = ((ring_pos - step) % n) * t_local
        cols = k_off + jnp.arange(nb, dtype=jnp.int32) * bk
        (acc, m, l), _ = jax.lax.scan(
            inner, (acc, m, l),
            (_split_blocks(k_cur, nb, bk), _split_blocks(v_cur, nb, bk), cols),
        )
        return acc, m, l

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
    acc, m, l = attend(acc, m, l, k_last, v_last, n - 1)
    l = jnp.maximum(l, 1e-30)
    o = (acc / l).astype(q.dtype)
    lse = m + jnp.log(l)  # (B, H, Tl, 1) fp32, for the backward
    return o, lse


# ---------------------------------------------------------------------------
# backward (second ring pass; dK/dV travel with their K/V shards)
# ---------------------------------------------------------------------------
def _ring_bwd(params, res, g):
    axis, batch_axis, scale, rate, block_k = params
    q, k, v, seed, o, lse = res
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    t_local = q.shape[2]
    bk = _pick_block(block_k, t_local)
    nb = t_local // bk
    ring_pos, b_off, q_off = _offsets(axis, batch_axis, q.shape[0], t_local)

    qs = q.astype(jnp.float32) * scale
    do = g.astype(jnp.float32)
    # Flash D identity (holds under the mask — see module docstring).
    delta = jnp.sum(do * o.astype(jnp.float32), axis=-1, keepdims=True)

    def inner(dq, blk):
        k_blk, v_blk, col0 = blk
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(s - lse)  # re-derived from the saved logsumexp
        if rate > 0.0:
            mask = hash_keep_mask(
                p.shape, rate, seed, offsets=(b_off, 0, q_off, col0)
            )
            p_acc = p * mask
        else:
            p_acc = p
        dv_blk = jnp.einsum(
            "bhqk,bhqd->bhkd", p_acc, do, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum(
            "bhqd,bhkd->bhqk", do, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * mask
        ds = p * (dp - delta)  # (B, H, Tl, bk)
        dq = dq + jnp.einsum(
            "bhqk,bhkd->bhqd", ds, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        # qs already carries the scale factor dK needs.
        dk_blk = jnp.einsum(
            "bhqk,bhqd->bhkd", ds, qs, preferred_element_type=jnp.float32
        )
        return dq, (dk_blk, dv_blk)

    def step_fn(carry, step):
        k_cur, v_cur, dk_cur, dv_cur, dq = carry
        k_off = ((ring_pos - step) % n) * t_local
        cols = k_off + jnp.arange(nb, dtype=jnp.int32) * bk
        dq, (dk_stack, dv_stack) = jax.lax.scan(
            inner, dq,
            (_split_blocks(k_cur, nb, bk), _split_blocks(v_cur, nb, bk), cols),
        )
        dk_cur = dk_cur + _merge_blocks(dk_stack)
        dv_cur = dv_cur + _merge_blocks(dv_stack)
        # dK/dV accumulators rotate WITH their shards: after n rotations the
        # shard (and its fully-accumulated gradient) is back home.
        k_cur, v_cur, dk_cur, dv_cur = (
            jax.lax.ppermute(x, axis, perm)
            for x in (k_cur, v_cur, dk_cur, dv_cur)
        )
        return (k_cur, v_cur, dk_cur, dv_cur, dq), None

    # Derive the zero carries from the inputs so they inherit the
    # varying-manual-axes type (scan under shard_map requires it).
    dq0 = jnp.zeros_like(qs)
    dkv0 = jnp.zeros_like(k, dtype=jnp.float32)
    (_, _, dk, dv, dq), _ = jax.lax.scan(
        step_fn, (k, v, dkv0, dkv0, dq0), jnp.arange(n)
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        np.zeros(seed.shape, dtype=jax.dtypes.float0),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ring_core(q, k, v, seed, params):
    o, _ = _ring_fwd(q, k, v, seed, params)
    return o


def _ring_core_fwd(q, k, v, seed, params):
    o, lse = _ring_fwd(q, k, v, seed, params)
    # Residuals are O(Tl*d) per device — no probability block is saved.
    return o, (q, k, v, seed, o, lse)


_ring_core.defvjp(_ring_core_fwd, _ring_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    batch_axis: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Exact softmax attention with the sequence sharded over ``axis``.

    ``q, k, v``: (B, H, T, d) with ``T % mesh.shape[axis] == 0``; returns
    (B, H, T, d) with the same sequence sharding. Scale is ``d**-0.5``.
    ``batch_axis`` additionally shards B over that mesh axis (compose with
    data parallelism); ``dropout_rate``/``dropout_seed`` enable in-ring
    attention-probability dropout (inverted, counter-based masks).
    ``block_k`` caps the inner key-block width (default min(512, T_local),
    rounded down to a divisor of the local length): peak transient memory
    per device is O(T_local * block_k), persistent O(T_local * d).
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
    rate = float(dropout_rate) if dropout_seed is not None else 0.0
    seed = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    )
    bk = _pick_block(
        block_k if block_k is not None else _DEFAULT_BLOCK_K, t // n
    )
    spec = P(batch_axis, None, axis, None)
    params = (axis, batch_axis, d**-0.5, rate, bk)
    fn = jax.shard_map(
        functools.partial(_ring_core, params=params),
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
    )
    with mesh:
        q, k, v = (
            jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
            for x in (q, k, v)
        )
        return fn(q, k, v, seed)
