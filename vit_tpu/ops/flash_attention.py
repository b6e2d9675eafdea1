"""Fused flash attention for TPU (Pallas).

Replaces the reference's O(T^2)-memory HF attention
(`/root/reference/src/models/vit_with_rope.py:63-78`) for long sequences:
the stride-1 sweep setting reaches ~4k tokens where materializing
(B, H, T, T) probabilities in HBM dominates. The kernel streams K/V blocks
through VMEM with an online-softmax accumulator, so HBM traffic is O(T) and
the probability matrix never leaves the chip.

Design (single-chip; blocks sized for the ~16 MB VMEM budget):

* grid = (batch*heads, T/block_q); each program owns one query block.
* K/V arrive as full (T, d) VMEM blocks per program — at the supported
  sizes (T <= 8k, d <= 128) that is <= 4 MB each, well inside VMEM, and it
  lets Mosaic pipeline the HBM->VMEM copies across grid steps.
* scores/softmax accumulate in fp32 regardless of input dtype (bf16 in,
  fp32 accumulate is the MXU-native contract).
* lane padding: head_dim is padded to a multiple of 128, sequence length to
  a multiple of block_q; padded key columns are masked to -inf before the
  softmax so results are exact.

Backward: registered as ``jax.custom_vjp`` whose backward *recomputes*
attention with plain XLA einsums (flash-style rematerialization — O(T)
residual memory, ~2x attention FLOPs). A fused Pallas backward kernel is the
planned follow-up; numerics are already exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, block_k: int):
    """One query block vs. all key blocks, online softmax in fp32."""
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    t_pad = k_ref.shape[1]
    num_kb = t_pad // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        # Mask padded key positions (exact results despite seq padding).
        key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(key_idx < seq_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, block_q: int, block_k: int, scale: float, seq_len: int):
    """q, k, v: (BH, T, d_pad) -> (BH, T, d_pad). T and d already padded."""
    bh, t_pad, d = q.shape
    grid = (bh, t_pad // block_q)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, seq_len=seq_len, block_k=block_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(10 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=3 * bh * t_pad * d * q.dtype.itemsize + bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q, k, v)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_core(q, k, v, params):
    block_q, block_k, scale, seq_len = params
    return _flash_fwd(q, k, v, block_q, block_k, scale, seq_len)


def _core_fwd(q, k, v, params):
    return _flash_attention_core(q, k, v, params), (q, k, v)


def _core_bwd(params, res, g):
    """Rematerialized backward: recompute probs blockless in XLA fp32."""
    _, _, scale, seq_len = params
    q, k, v = res
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, g))
    s = jnp.einsum("bqd,bkd->bqk", qf, kf, preferred_element_type=jnp.float32) * scale
    key_idx = jnp.arange(s.shape[-1])
    s = jnp.where(key_idx[None, None, :] < seq_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf, preferred_element_type=jnp.float32)
    # softmax jvp: ds = p * (dp - sum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf, preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf, preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """Fused attention. ``q, k, v``: (B, H, T, d) -> (B, H, T, d).

    Exact (non-approximate) softmax attention with scale ``d**-0.5``.
    Falls back to a plain XLA path on non-TPU backends (CPU tests).
    """
    b, h, t, d = q.shape
    scale = d**-0.5
    if jax.default_backend() != "tpu":
        bhq = q.reshape(b * h, t, d)
        out = _xla_attention(bhq, k.reshape(b * h, t, d), v.reshape(b * h, t, d), scale)
        return out.reshape(b, h, t, d)

    block_q = min(block_q, _round_up(t, 128))
    block_k = min(block_k, _round_up(t, 128))
    t_pad = _round_up(t, max(block_q, block_k))
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    out = _flash_attention_core(
        prep(q), prep(k), prep(v), (block_q, block_k, scale, t)
    )
    return out[:, :t, :d].reshape(b, h, t, d)
