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
* dropout (reference semantics: dropout applied to softmax probabilities,
  `vit_with_rope.py:79-81`): a counter-based hash mask computed IN-KERNEL
  from the global (seed, batch*head, row, col) — never materialized in HBM,
  block-decomposition independent, so the forward and both backward kernels
  regenerate bit-identical masks. The math: ``O = (P (.) M / keep) V`` with
  the softmax denominator from the UNMASKED row sum;
  ``ds = P (.) (dP (.) M/keep - D)`` with ``D = rowsum(dO (.) O)`` (the
  usual flash D identity still holds — see the derivation in _flash_bwd).
  Plain uint32 jnp ops, so the same mask is reproducible in pure jnp
  (`hash_dropout_mask`) for exact CPU tests.
* dtype: MXU matmuls run in the input dtype (bf16 in, fp32 accumulate);
  softmax statistics and accumulators are always fp32.
* padding: head_dim to a multiple of 128, sequence to a multiple of the
  block sizes; padded key columns are masked to -inf so results are exact.

Measured on v5e across the full fwd+bwd coverage matrix (BASELINE.md
"Flash-kernel coverage matrix": {f32, bf16} x T in {197, 1024, 2048, 4096}
x d in {64, 128} x +-dropout): flash wins every cell from T=1024 up
(1.19-1.32x at 1024 rising to 1.57-2.36x at 4096) and is parity-to-slower at
T=197, which is why ``select_attn_impl('auto')`` crosses over at 1024
(with d >= 64).

Falls back to plain XLA attention (forward and backward, including the
identical hash-dropout mask) on non-TPU backends so the CPU test mesh
exercises identical semantics; ``interpret=True`` runs the real Pallas
kernels in interpreter mode for CI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "hash_dropout_mask", "default_blocks"]

NEG_INF = -1e30
_STAT_LANES = 128  # lane width for per-row softmax statistics in VMEM
# Padded lengths up to this take the single-block fused path (whole sequence
# in VMEM, a block of heads per program) instead of the streaming kernels.
_SHORT_T_MAX = 512

# Knuth/Murmur multiplicative constants for the counter-based dropout hash.
_H_ROW = 0x9E3779B1
_H_COL = 0x85EBCA6B
_H_BH = 0xC2B2AE35
_H_SEED = 0x27D4EB2F
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35


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


def _keep_threshold(rate: float) -> np.uint32:
    """uint32 threshold s.t. P(bits < threshold) = 1 - rate."""
    keep = 1.0 - float(rate)
    return np.uint32(min(0xFFFFFFFF, int(round(keep * 2.0**32))))


def _fmix32(x):
    """murmur3 32-bit finalizer — the single hash-quality-critical mix shared
    by every counter-based dropout in the package (in-kernel flash dropout
    here, :mod:`vit_tpu.ops.dropout` for the model-body masks)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(_M1)
    x = x ^ (x >> 13)
    x = x * np.uint32(_M2)
    x = x ^ (x >> 16)
    return x


def _hash_bits(rows, cols, bh, seed):
    """Counter-based uint32 hash of (seed, bh, row, col); murmur3 finalizer.

    ``rows``/``cols``: int32 arrays (broadcastable); ``bh``/``seed``: int32
    scalars (traced OK). Pure jnp uint32 ops — identical on TPU Pallas,
    interpret mode, and plain XLA.
    """
    u = lambda v: jax.lax.convert_element_type(v, jnp.uint32)  # noqa: E731
    x = u(rows) * np.uint32(_H_ROW) ^ u(cols) * np.uint32(_H_COL)
    x = x + u(bh) * np.uint32(_H_BH) + u(seed) * np.uint32(_H_SEED)
    return _fmix32(x)


def hash_dropout_mask(t_q: int, t_k: int, bh, seed, rate: float) -> jnp.ndarray:
    """The exact (t_q, t_k) keep-mask (0 or 1/keep) the kernels generate.

    Pure-jnp reference for tests and the non-TPU fallback; ``bh`` is the
    flattened batch*head index (scalar or (BH,) array -> adds a leading dim).
    """
    rows = jnp.arange(t_q, dtype=jnp.int32)[:, None]
    cols = jnp.arange(t_k, dtype=jnp.int32)[None, :]
    bh_arr = jnp.asarray(bh, jnp.int32)
    if bh_arr.ndim == 1:
        bits = _hash_bits(rows[None], cols[None], bh_arr[:, None, None], seed)
    else:
        bits = _hash_bits(rows, cols, bh_arr, seed)
    keep = 1.0 - float(rate)
    return jnp.where(bits < _keep_threshold(rate), 1.0 / keep, 0.0).astype(jnp.float32)


def _block_mask(qi, kj, block_q, block_k, bh, seed, rate: float):
    """In-kernel (block_q, block_k) keep-mask for block (bh, qi, kj)."""
    rows = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )
    cols = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    bits = _hash_bits(rows, cols, bh, seed)
    keep = 1.0 - float(rate)
    return jnp.where(bits < _keep_threshold(rate), 1.0 / keep, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# short-sequence fused path (single k-block, batched heads per program)
# ---------------------------------------------------------------------------
# For short sequences (T <= _SHORT_T_MAX after padding) the streaming-block
# design is the WRONG shape: a grid of B*H tiny per-head programs pays more
# per-program overhead than the matmuls it fuses (measured: ViT-B/16 T=197
# flash 100.6 ms/step vs XLA 75.7). But XLA is bandwidth-bound here — the
# (B, H, T, T) probability tensors cost O(T^2) HBM traffic against only
# d<=128 contraction FLOPs (measured 16-21 TFLOP/s at ~650 GB/s on v5e, i.e.
# at the HBM roofline). So instead: each program holds a BLOCK OF HEADS and
# computes their FULL softmax attention with batched dot_generals — the
# whole (blk, T, T) probability block lives and dies in VMEM, one program
# per blk heads instead of one per (head, q-block, k-block).


def _bh_block(bh: int, limit: int = 8) -> int:
    """Heads per program: largest divisor of ``bh`` <= limit (VMEM budget)."""
    blk = min(limit, bh)
    while bh % blk:
        blk -= 1
    return blk


def _bdot(a, b, contract_a: int, contract_b: int):
    """Batched (leading-dim) dot_general in fp32."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _block3_mask(bh0, blk: int, t: int, seed, rate: float):
    """(blk, t, t) keep-mask for heads [bh0, bh0+blk) — same stream as the
    streaming kernels' :func:`_block_mask` (mask is block-decomposition
    independent)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk, t, t), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, t, t), 2)
    bh = bh0 + jax.lax.broadcasted_iota(jnp.int32, (blk, t, t), 0)
    bits = _hash_bits(rows, cols, bh, seed)
    keep = 1.0 - float(rate)
    return jnp.where(bits < _keep_threshold(rate), 1.0 / keep, 0.0).astype(
        jnp.float32
    )


def _short_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, scale: float, seq_len: int, dropout_rate: float,
):
    blk = q_ref.shape[0]
    t = q_ref.shape[1]
    bh0 = pl.program_id(0) * blk
    q = q_ref[...] * jnp.asarray(scale, q_ref.dtype)
    s = _bdot(q, k_ref[...], 2, 2)  # (blk, T, T) fp32 — VMEM only
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(key_idx < seq_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(l)
    if dropout_rate > 0.0:
        p = p * _block3_mask(bh0, blk, t, seed_ref[0], dropout_rate)
    o = _bdot(p.astype(v_ref.dtype), v_ref[...], 2, 1)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _short_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale: float, seq_len: int, dropout_rate: float,
):
    """One program: dQ, dK, dV for a block of heads (5 batched matmuls)."""
    blk = q_ref.shape[0]
    t = q_ref.shape[1]
    bh0 = pl.program_id(0) * blk
    qs = q_ref[...] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    s = _bdot(qs, k, 2, 2)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(key_idx < seq_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[...])  # (blk, T, T)
    if dropout_rate > 0.0:
        mask = _block3_mask(bh0, blk, t, seed_ref[0], dropout_rate)
        p_m = p * mask
    else:
        p_m = p
    # dV = Ptil^T dO   (contract over query rows)
    dv_ref[...] = _bdot(p_m.astype(do.dtype), do, 1, 1).astype(dv_ref.dtype)
    dp = _bdot(do, v, 2, 2)  # (blk, Tq, Tk)
    if dropout_rate > 0.0:
        dp = dp * mask
    ds = p * (dp - delta_ref[...])
    dq_ref[...] = (
        _bdot(ds.astype(k.dtype), k, 2, 1) * scale
    ).astype(dq_ref.dtype)
    # dK = ds^T (q*scale): qs already carries the scale factor.
    dk_ref[...] = _bdot(ds.astype(qs.dtype), qs, 1, 1).astype(dk_ref.dtype)


def _short_fwd(q, k, v, seed, scale, seq_len, dropout_rate, interpret=False):
    bh, t_pad, d = q.shape
    blk = _bh_block(bh)
    kernel = functools.partial(
        _short_fwd_kernel, scale=scale, seq_len=seq_len,
        dropout_rate=dropout_rate,
    )
    blkspec = pl.BlockSpec((blk, t_pad, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((blk, t_pad, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bh // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blkspec, blkspec,
                  blkspec],
        out_specs=(blkspec, rowspec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=4 * bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(seed, q, k, v)


def _short_bwd(q, k, v, o, lse, do, seed, scale, seq_len, dropout_rate,
               interpret=False):
    bh, t_pad, d = q.shape
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    # 3-4 (blk, T, T) fp32 VMEM temporaries live at once in the backward.
    blk = _bh_block(bh, limit=8 if t_pad <= 256 else 4)
    kernel = functools.partial(
        _short_bwd_kernel, scale=scale, seq_len=seq_len,
        dropout_rate=dropout_rate,
    )
    blkspec = pl.BlockSpec((blk, t_pad, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((blk, t_pad, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bh // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blkspec, blkspec,
                  blkspec, blkspec, rowspec, rowspec],
        out_specs=(blkspec, blkspec, blkspec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t_pad * t_pad * d,
            bytes_accessed=8 * bh * t_pad * d * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
        interpret=interpret,
    )(seed, q, k, v, do, lse, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _short_attention_core(q, k, v, seed, params):
    scale, seq_len, interpret, rate = params
    o, _ = _short_fwd(q, k, v, seed, scale, seq_len, rate, interpret)
    return o


def _short_core_fwd(q, k, v, seed, params):
    scale, seq_len, interpret, rate = params
    o, lse = _short_fwd(q, k, v, seed, scale, seq_len, rate, interpret)
    return o, (q, k, v, seed, o, lse)


def _short_core_bwd(params, res, g):
    scale, seq_len, interpret, rate = params
    q, k, v, seed, o, lse = res
    dq, dk, dv = _short_bwd(
        q, k, v, o, lse, g, seed, scale, seq_len, rate, interpret
    )
    return dq, dk, dv, np.zeros(seed.shape, dtype=jax.dtypes.float0)


_short_attention_core.defvjp(_short_core_fwd, _short_core_bwd)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _flash_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, seq_len: int, dropout_rate: float,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
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
    # Softmax denominator accumulates the UNMASKED sum (dropout applies to
    # the normalized probabilities, not the logits).
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        p = p * _block_mask(qi, kb, block_q, block_k, bh, seed_ref[0], dropout_rate)
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


def _flash_fwd(q, k, v, seed, block_q: int, block_k: int, scale: float,
               seq_len: int, dropout_rate: float, interpret: bool = False):
    """(BH, T, d) x3 -> (o (BH, T, d), lse (BH, T, 1)); T/d pre-padded."""
    bh, t_pad, d = q.shape
    grid = (bh, t_pad // block_q, t_pad // block_k)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, seq_len=seq_len, dropout_rate=dropout_rate
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(seed, q, k, v)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
# Dropout backward derivation (why the flash D identity survives the mask):
# O_i = sum_j Ptil_ij v_j with Ptil = P (.) M/keep and the UNMASKED row sum
# as denominator. dV = Ptil^T dO. dPtil = dO V^T, so dP = dPtil (.) M/keep.
# Softmax bwd: ds_i = P_i (.) (dP_i - sum_j dP_ij P_ij); the inner sum is
# sum_j (dO_i . v_j) (M_ij/keep) P_ij = dO_i . sum_j Ptil_ij v_j = dO_i . O_i
# = D_i — exactly the maskless flash identity, because the mask is already
# folded into O.


def _flash_bwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale: float, seq_len: int, dropout_rate: float,
):
    """Grid (bh, q_block, k_block): accumulate dQ over key blocks."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_q = q_ref.shape[1]
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
    if dropout_rate > 0.0:
        dp = dp * _block_mask(qi, kb, block_q, block_k, bh, seed_ref[0], dropout_rate)
    ds = p * (dp - delta_ref[0])  # delta block is (bq, 1)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float, seq_len: int, dropout_rate: float,
):
    """Grid (bh, k_block, q_block): accumulate dK/dV over query blocks."""
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    num_qb = pl.num_programs(2)
    block_q = q_ref.shape[1]
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
    if dropout_rate > 0.0:
        mask = _block_mask(qb, kb, block_q, block_k, bh, seed_ref[0], dropout_rate)
        p_masked = p * mask
    else:
        p_masked = p
    dv_acc[:] = dv_acc[:] + jnp.dot(
        p_masked.astype(do.dtype).T, do, preferred_element_type=jnp.float32
    )
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = dp * mask
    ds = p * (dp - delta_ref[0])
    dk_acc[:] = dk_acc[:] + jnp.dot(
        ds.astype(q.dtype).T, q_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(qb == num_qb - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, seed, block_q, block_k, scale, seq_len,
               dropout_rate, interpret=False):
    bh, t_pad, d = q.shape
    # D_i = sum_d dO_i * O_i  — cheap elementwise reduce in XLA, fp32.
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (bh, t_pad, 1)

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec_q = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, seq_len=seq_len,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, t_pad // block_q, t_pad // block_k),
        in_specs=[seed_spec, q_spec, k_spec, k_spec, q_spec, row_spec_q, row_spec_q],
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
    )(seed, q, k, v, do, lse, delta)

    # dK/dV: iterate query blocks innermost; q/do/lse/delta indexed by j.
    qj_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    rowj_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, seq_len=seq_len,
            dropout_rate=dropout_rate,
        ),
        grid=(bh, t_pad // block_k, t_pad // block_q),
        in_specs=[seed_spec, qj_spec, ki_spec, ki_spec, qj_spec, rowj_spec, rowj_spec],
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
    )(seed, q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# XLA reference path (non-TPU backends and numerics tests)
# ---------------------------------------------------------------------------
def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(q.dtype), v)


def _xla_dropout_attention(q, k, v, seed, scale, rate):
    """Plain differentiable jnp attention with the SAME hash-dropout mask the
    Pallas kernels generate — the non-TPU fallback for dropout training and
    the exact reference for kernel tests. O(T^2) memory (fallback only)."""
    bh, t, _ = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    mask = hash_dropout_mask(t, t, jnp.arange(bh, dtype=jnp.int32), seed[0], rate)
    p = p * mask
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
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_core(q, k, v, seed, params):
    block_q, block_k, scale, seq_len, interpret, rate = params
    o, _ = _flash_fwd(q, k, v, seed, block_q, block_k, scale, seq_len, rate,
                      interpret)
    return o


def _core_fwd(q, k, v, seed, params):
    block_q, block_k, scale, seq_len, interpret, rate = params
    o, lse = _flash_fwd(q, k, v, seed, block_q, block_k, scale, seq_len, rate,
                        interpret)
    return o, (q, k, v, seed, o, lse)


def _core_bwd(params, res, g):
    block_q, block_k, scale, seq_len, interpret, rate = params
    q, k, v, seed, o, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse, g, seed, block_q, block_k, scale, seq_len, rate,
        interpret,
    )
    return dq, dk, dv, np.zeros(seed.shape, dtype=jax.dtypes.float0)


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


def default_blocks(t_pad: int, dtype) -> tuple:
    """Measured-best (block_q, block_k) subject to the scoped-VMEM cap.

    v5e block sweep, fwd+bwd, d=64 (BASELINE.md round-4 "flash block-size
    sweep"): vs the old fixed (256, 512), (512, 1024) runs 1.48x faster at
    T=4096 (both dtypes), 1.35x at T=2048, and 1.16x at T=1024.

    Larger blocks measured marginally faster standalone — bf16 (512, 2048)
    / (1024, 1024) reach 1.56x at T=4096 — but the dk/dv backward kernel
    holds three f32 (block_q, block_k) tiles (scores, probs, dscores) on
    the VMEM stack, so block_q*block_k = 1M elements needs ~16 MB of
    scoped VMEM and real training programs (remat'd ViT encoder, stride-1
    config) fail to compile against the 12 MB scoped limit. 512*1024
    elements ≈ 8 MB incl. operand blocks: safe, and within 6% of the
    unconstrained best. Callers may still pass bigger blocks explicitly.
    """
    del t_pad, dtype  # one measured-safe choice covers every swept cell
    return (512, 1024)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = None,
    block_k: int = None,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Fused attention. ``q, k, v``: (B, H, T, d) -> (B, H, T, d).

    Exact (non-approximate) softmax attention with scale ``d**-0.5``;
    differentiable (fused Pallas forward AND backward on TPU; XLA fallback
    elsewhere). ``interpret=True`` forces the Pallas kernels in interpreter
    mode so CI (CPU) exercises the real kernel logic, not the fallback.
    ``block_q``/``block_k`` default to the measured-best sizes for the
    (padded length, dtype) — see :func:`default_blocks`.

    ``dropout_rate > 0`` applies dropout to the softmax probabilities
    (reference training semantics) via an in-kernel counter-based mask —
    O(T) memory is preserved. ``dropout_seed`` (int32 scalar, typically
    drawn from the step's dropout RNG) selects the mask; the same
    (seed, rate) always produces the same mask.
    """
    b, h, t, d = q.shape
    scale = d**-0.5
    rate = float(dropout_rate)
    if rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed_arr = jnp.reshape(
        jnp.asarray(dropout_seed if dropout_seed is not None else 0, jnp.int32),
        (1,),
    )
    if jax.default_backend() != "tpu" and not interpret:
        bhq, bhk, bhv = (x.reshape(b * h, t, d) for x in (q, k, v))
        if rate > 0.0:
            out = _xla_dropout_attention(bhq, bhk, bhv, seed_arr, scale, rate)
        else:
            out = _xla_attention_core(bhq, bhk, bhv, (0, 0, scale, t))
        return out.reshape(b, h, t, d)

    # Both blocks must divide the padded length or the grid would skip the
    # tail rows (silently-uninitialized outputs for e.g. t in 257..384).
    t_pad = _round_up(t, 128)
    dbq, dbk = default_blocks(t_pad, q.dtype)
    block_q = _fit_block(block_q if block_q is not None else dbq, t_pad)
    block_k = _fit_block(block_k if block_k is not None else dbk, t_pad)
    d_pad = _round_up(d, 128)

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, d_pad - d)))

    if t_pad <= _SHORT_T_MAX:
        # Short sequences: one program per head-block computes the full
        # softmax in VMEM — no (B, H, T, T) HBM traffic, no per-(head,
        # block, block) program overhead (see "short-sequence fused path").
        out = _short_attention_core(
            prep(q), prep(k), prep(v), seed_arr,
            (scale, t, interpret, rate),
        )
    else:
        out = _flash_attention_core(
            prep(q), prep(k), prep(v), seed_arr,
            (block_q, block_k, scale, t, interpret, rate),
        )
    return out[:, :t, :d].reshape(b, h, t, d)
