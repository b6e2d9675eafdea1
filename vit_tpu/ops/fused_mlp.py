"""Fused transformer-MLP kernel (Pallas): dense -> GELU -> dense in VMEM.

Why: the baseline ViT is op-latency/HBM-round-trip bound, not FLOP bound
(BASELINE.md probe 7: the MLP stack costs ~35 ms of a ~90 ms epoch while
its arithmetic is microseconds). XLA materializes the (tokens, 4*hidden)
intermediate to HBM twice (forward) and several more times in the backward;
this kernel keeps the whole block in VMEM — each token block makes ONE HBM
round trip in the forward and one in the backward, with both weight
matrices resident in VMEM across the grid.

Math (exact GELU, matching ``nn.gelu(approximate=False)``):

    y = gelu(x @ W1 + b1) @ W2 + b2

* forward: grid over row blocks of the flattened (B*T, D) tokens; weights
  are broadcast (index 0) so Mosaic keeps them in VMEM.
* backward: one kernel computes dx per block and accumulates dW1/dW2/db1/db2
  in fp32 VMEM scratch across the sequential TPU grid, re-deriving the
  pre-activation (cheap) instead of storing it.
* dtype: matmuls in the input dtype with fp32 accumulation; GELU and its
  derivative in fp32.

Differentiable via custom_vjp. Off-TPU (and under ``interpret=False``) a
plain-jnp fallback runs the identical math; ``interpret=True`` runs the real
kernels in interpreter mode for CI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_tpu.ops.flash_attention import _fit_block, _round_up

__all__ = ["fused_mlp"]

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — below
    f32 resolution). Pallas TPU has no erf lowering; this uses only
    supported primitives (exp + polynomials)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * _SQRT_HALF))


def _dgelu_f32(x):
    cdf = 0.5 * (1.0 + _erf_f32(x * _SQRT_HALF))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return cdf + x * pdf


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...]
    pre = (
        jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...]
    )
    h = _gelu_f32(pre).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(
    x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw1_acc, db1_acc, dw2_acc, db2_acc,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)

    x = x_ref[...]
    dy = dy_ref[...]
    pre = (
        jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...]
    )
    g = _gelu_f32(pre).astype(x.dtype)
    dg = jnp.dot(dy, w2_ref[...].T, preferred_element_type=jnp.float32)
    dh = (dg * _dgelu_f32(pre)).astype(x.dtype)

    dw2_acc[...] += jnp.dot(g.T, dy, preferred_element_type=jnp.float32)
    db2_acc[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dw1_acc[...] += jnp.dot(x.T, dh, preferred_element_type=jnp.float32)
    db1_acc[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jnp.dot(
        dh, w1_ref[...].T, preferred_element_type=jnp.float32
    ).astype(dx_ref.dtype)

    @pl.when(i == n - 1)
    def _finalize():
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)
        dw2_ref[...] = dw2_acc[...].astype(dw2_ref.dtype)
        db2_ref[...] = db2_acc[...].astype(db2_ref.dtype)


def _pallas_fwd(x, w1, b1, w2, b2, block_r, interpret):
    r, d = x.shape
    f = w1.shape[1]
    grid = (r // block_r,)
    row = lambda i: (i, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _pallas_bwd(x, dy, w1, b1, w2, block_r, interpret):
    r, d = x.shape
    f = w1.shape[1]
    grid = (r // block_r,)
    row = lambda i: (i, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, dy, w1, b1, w2)


# ---------------------------------------------------------------------------
# reference math (fallback + tests)
# ---------------------------------------------------------------------------
def _jnp_mlp(x, w1, b1, w2, b2):
    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.reshape(-1)
    h = _gelu_f32(pre).astype(x.dtype)
    return (
        jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.reshape(-1)
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_core(x, w1, b1, w2, b2, params):
    block_r, interpret = params
    return _pallas_fwd(x, w1, b1, w2, b2, block_r, interpret)


def _core_fwd(x, w1, b1, w2, b2, params):
    block_r, interpret = params
    y = _pallas_fwd(x, w1, b1, w2, b2, block_r, interpret)
    return y, (x, w1, b1, w2)


def _core_bwd(params, res, dy):
    block_r, interpret = params
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _pallas_bwd(x, dy, w1, b1, w2, block_r, interpret)
    return dx, dw1, db1, dw2, db2


_fused_core.defvjp(_core_fwd, _core_bwd)


def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    block_r: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """``gelu(x @ w1 + b1) @ w2 + b2`` with one HBM round trip per pass.

    ``x``: (..., D); ``w1``: (D, F); ``w2``: (F, D); biases (F,) / (D,).
    Leading dims are flattened into rows and padded to the row-block size
    (padded rows compute garbage that is sliced away; their ``dy`` is zero
    in the backward, so weight grads are exact).
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    f = w1.shape[1]
    rows = int(np.prod(orig_shape[:-1]))
    x2 = x.reshape(rows, d)

    if jax.default_backend() != "tpu" and not interpret:
        return _jnp_mlp(x2, w1, b1, w2, b2).reshape(orig_shape)

    # VMEM envelope: the backward keeps dW1/dW2 fp32 accumulators plus both
    # weight blocks resident regardless of block_r, so the dominant cost is
    # ~(16 + 2*itemsize) * d * f bytes. Past Mosaic's ~16 MB scoped budget
    # (ViT-B's 768x3072 needs ~19 MB for the accumulators alone) the kernel
    # cannot compile — fall back to the identical-math jnp path, which XLA
    # fuses well at such MXU-bound widths anyway.
    resident = (16 + 2 * x.dtype.itemsize) * d * f
    if resident > 12 * 1024**2 and not interpret:
        if not getattr(fused_mlp, "_warned", False):
            print(
                f"[fused_mlp] d={d}, f={f} exceeds the kernel's VMEM envelope "
                f"(~{resident / 1e6:.0f} MB resident); using the XLA path"
            )
            fused_mlp._warned = True
        return _jnp_mlp(x2, w1, b1, w2, b2).reshape(orig_shape)

    # Pad to the 128-sublane granule only, then shrink the block so it
    # divides that — padding to a full 1024-row block would waste up to
    # ~8x MXU work on garbage rows for small row counts.
    r_pad = _round_up(rows, 128)
    block = _fit_block(block_r, r_pad)
    if r_pad != rows:
        x2 = jnp.pad(x2, ((0, r_pad - rows), (0, 0)))
    y = _fused_core(
        x2, w1, b1.reshape(1, f), w2, b2.reshape(1, d), (block, interpret)
    )
    return y[:rows].reshape(orig_shape)
