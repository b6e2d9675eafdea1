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

Usage (T must divide by the mesh axis size)::

    mesh = make_mesh(num_devices=8)            # ('data', 'model')
    out = ring_attention(q, k, v, mesh=mesh, axis="data")
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention"]


def _ring_body(q, k, v, axis: str, scale: float):
    """Per-device computation under shard_map; q/k/v: (B, H, Tl, d)."""
    n = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qs = q.astype(jnp.float32) * scale

    # Derive the carries from q so they inherit its varying-manual-axes
    # type (scan under shard_map requires carry in/out vma to match).
    acc0 = jnp.zeros_like(qs)
    m0 = jnp.full_like(qs[..., :1], -jnp.inf)
    l0 = jnp.zeros_like(qs[..., :1])

    def attend(acc, m, l, k_cur, v_cur):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        return acc, m_new, l

    # Rematerialize per ring step: without this, autodiff stores the
    # (B, H, Tl, Tl) probability block of EVERY scan step as a residual —
    # O(T^2/N) per device, defeating the long-context purpose. Checkpointing
    # keeps only the O(Tl*d) step inputs and recomputes s/p in the backward.
    attend = jax.checkpoint(attend)

    def step(carry, _):
        acc, m, l, k_cur, v_cur = carry
        acc, m, l = attend(acc, m, l, k_cur, v_cur)
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (acc, m, l, k_nxt, v_nxt), None

    # n-1 rotate-and-attend steps, then the last shard without the final
    # rotation (which would only be discarded — 2 wasted ICI collectives).
    (acc, m, l, k_last, v_last), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), None, length=n - 1
    )
    acc, _, l = attend(acc, m, l, k_last, v_last)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Exact softmax attention with the sequence sharded over ``axis``.

    ``q, k, v``: (B, H, T, d) with ``T % mesh.shape[axis] == 0``; returns
    (B, H, T, d) with the same sequence sharding. Scale is ``d**-0.5``.
    """
    b, h, t, d = q.shape
    n = mesh.shape[axis]
    if t % n != 0:
        raise ValueError(
            f"sequence length {t} must be divisible by the '{axis}' "
            f"axis size {n}"
        )
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        partial(_ring_body, axis=axis, scale=d**-0.5),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    with mesh:
        q, k, v = (
            jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
            for x in (q, k, v)
        )
        return fn(q, k, v)
