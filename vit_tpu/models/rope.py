"""Rotary position embeddings (RoPE), rotate-half formulation.

Functional TPU-first equivalent of the reference's
``RotaryPositionEmbedding`` (`/root/reference/src/models/rope.py:10-131`).
There is no cos/sin *cache* to manage: tables are computed inline from the
static sequence length and XLA constant-folds them into the compiled
program, which is both simpler and faster than a dynamically-extended
buffer.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rope_tables", "apply_rope", "apply_rope_qk"]


def rope_tables(seq_len: int, dim: int, base: float = 10000.0, dtype=jnp.float32):
    """Return ``(cos, sin)`` tables of shape ``(seq_len, dim)``.

    ``dim`` must be even; frequencies follow the standard
    ``base**(-2i/dim)`` schedule, with each frequency repeated twice so the
    tables align with the rotate-half layout.
    """
    if dim % 2 != 0:
        raise ValueError(f"RoPE dim must be even, got {dim}")
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (T, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` by position. ``x``: ``(..., T, dim)``; tables ``(T, dim)``.

    Broadcasts over any leading batch/head dimensions (the reference's 3-D
    and 4-D support, `rope.py:60-98`).
    """
    return x * cos + _rotate_half(x) * sin


def apply_rope_qk(q: jnp.ndarray, k: jnp.ndarray, base: float = 10000.0):
    """Convenience: rotate Q and K of shape ``(..., T, dim)`` in one call."""
    seq_len, dim = q.shape[-2], q.shape[-1]
    cos, sin = rope_tables(seq_len, dim, base=base, dtype=q.dtype)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
