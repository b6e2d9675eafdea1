"""Post-training int8 quantization for serving (W8A8, dynamic activations).

TPU-native inference acceleration with no reference analogue (the reference
serves fp32 through Lightning's ``test`` path): v5e's MXU executes int8
matmuls at ~2x its bf16 rate (394 TOPS vs 197 TFLOP/s peak), and int8
weights are 4x smaller in HBM than fp32 — both matter for the batch
inference deployment target (:mod:`vit_tpu.serve`).

Scheme (standard LLM.int8-style symmetric quantization):

* **Weights**: per-output-channel symmetric int8. For a Dense kernel
  ``W (K, N)``: ``scale_n = max_k |W[:, n]| / 127``; ``Wq = round(W/scale)``.
  Quantized once at load time.
* **Activations**: dynamic per-row symmetric int8. For ``x (..., K)``:
  ``scale_row = max_k |x[..., k]| / 127`` computed on the fly — no
  calibration data needed, and the row max adapts to LayerNorm'd vs raw
  activations automatically.
* **Matmul**: ``int8 x int8 -> int32`` via ``lax.dot_general`` with
  ``preferred_element_type=int32`` (lowered onto the MXU's int8 path on
  TPU; plain integer math on CPU, so tests are backend-exact), then a
  rank-1 rescale ``y = y_int32 * scale_row * scale_n + bias``.

What gets quantized: every ``nn.Dense`` with a 2-D kernel whose fan-in is
at least ``min_fan_in``, EXCEPT the task head (``classifier``/``regressor``
— cheap, and its output feeds metrics directly), the covariance-derived
``preprocessor`` (whitening is precision-sensitive by construction,
`/root/reference/src/models/preprocessor.py:32-73` semantics), and the MoE
``router`` (its logits feed a discontinuous top_k — see DEFAULT_EXCLUDE). LayerNorms,
biases, convs, and attention's softmax stay in the serving compute dtype.

Integration uses Flax's ``nn.intercept_methods`` so the EXACT training
model definition runs — no duplicated forward to drift out of sync. The
interceptor hijacks ``nn.Dense.__call__`` for quantized paths and computes
the int8 matmul from a side table keyed by module path; everything else
(attention kernels, RoPE, tokenizers, heads) executes unmodified.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "quantize_dense_params",
    "int8_dense",
    "strip_quantized",
    "quantized_apply",
    "quantized_size_bytes",
    "calibrate_activation_scales",
    "W8A8_WO_BATCH_THRESHOLD",
]

# Auto-routing crossover for UNCALIBRATED ``Predictor(quantize="int8")``
# (batch size, in samples): below this the forward is weight-streaming /
# issue-latency bound and dynamic W8A8's int8 MXU matmuls win (measured
# 1.14x at batch 8 on ViT-B/16 224px); at/above it the forward is
# MXU-bound in bf16 and the dynamic per-row activation quant/dequant
# cancels the matmul gain (0.98x at batch 128), so weight-only — same 4x
# HBM cut, no elementwise overhead on the activation path — is the better
# int8 variant. With a calibration batch the threshold is moot: static-
# scale W8A8 wins at every measured batch size (1.15x at 128, 1.20x at 8)
# and "int8" always routes W8A8. Measured on v5e (BASELINE.md "Serving");
# override per-deployment with the explicit "int8-w8a8" / "int8-wo" modes.
W8A8_WO_BATCH_THRESHOLD = 64

# Module-path components whose Dense layers are never quantized.
# ``router``: the MoE router's logits feed a discontinuous top_k — near-tie
# tokens would flip expert assignment under ~1e-2 quant error, an accuracy
# cliff the smooth per-layer error bound does not cover (the expert wi/wo
# einsum params are not nn.Dense and are never candidates anyway).
DEFAULT_EXCLUDE: Tuple[str, ...] = (
    "classifier", "regressor", "preprocessor", "router",
)


def _is_mapping(node: Any) -> bool:
    return isinstance(node, Mapping) or hasattr(node, "items")


def quantize_dense_params(
    params: Mapping,
    min_fan_in: int = 64,
    exclude: Tuple[str, ...] = DEFAULT_EXCLUDE,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Walk a Flax params tree and build the int8 side table.

    Returns ``{"path/to/dense": {"wq": int8 (K, N), "scale": f32 (N,),
    "bias": f32 (N,) | None}}`` for every 2-D ``kernel`` leaf with
    ``K >= min_fan_in`` whose path contains no excluded component. Paths
    use ``"/"`` separators and match ``nn.Module.path`` at apply time.
    """
    table: Dict[str, Dict[str, jnp.ndarray]] = {}

    def walk(node, path):
        kernel = node.get("kernel") if _is_mapping(node) else None
        if (
            kernel is not None
            and getattr(kernel, "ndim", 0) == 2
            and kernel.shape[0] >= min_fan_in
            and not (set(path) & set(exclude))
        ):
            k = jnp.asarray(kernel, jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-12) / 127.0
            wq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
            bias = node.get("bias")
            table["/".join(path)] = {
                "wq": wq,
                "scale": scale,
                "bias": None if bias is None else jnp.asarray(bias, jnp.float32),
            }
        if _is_mapping(node):
            for key, child in node.items():
                if _is_mapping(child):
                    walk(child, path + (key,))

    walk(params, ())
    return table


def int8_dense(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    sx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """W8A8 Dense: int8 MXU matmul with dynamic or static activation quant.

    ``sx=None`` (default): dynamic per-row symmetric scale from the row max
    — no calibration needed, but the row-max reduction is an extra
    non-fusable op per quantized matmul. ``sx`` a static scalar (from
    :func:`calibrate_activation_scales`): the quant becomes a pure
    elementwise chain (div/round/clip/cast) that XLA fuses into the
    preceding LN/GELU, and the dequant ``sx * scale`` constant-folds to one
    vector — cheaper at MXU-bound batch sizes, at the cost of saturating
    activations beyond the calibrated range (clip at +-127 absorbs them).
    """
    xf = x.astype(jnp.float32)
    if sx is None:
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int8_dense_weight_only(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Weight-only int8 Dense: dequantize-into-matmul, activations untouched.

    The per-channel dequant ``wq * scale`` fuses into the dot's weight read
    (XLA keeps it elementwise-on-operand), so HBM sees int8 weights — the
    4x traffic saving — while the matmul runs in ``compute_dtype`` (the
    serving module's dtype: f32 serving keeps exact f32 accumulation with
    weight-rounding error only; bf16 serving adds bf16 rounding, which
    replaces W8A8's exact int32 accumulation — both measured ~3e-4
    physical-units drift on the verify regression model).
    """
    w = (wq.astype(compute_dtype) * scale.astype(compute_dtype))
    y = jnp.matmul(x.astype(compute_dtype), w)
    if bias is not None:
        y = y + bias.astype(compute_dtype)
    return y.astype(x.dtype)


def _make_interceptor(
    qtable: Mapping[str, Mapping[str, jnp.ndarray]], weight_only: bool = False
):
    def interceptor(next_fun, args, kwargs, context):
        if context.method_name == "__call__" and isinstance(
            context.module, nn.Dense
        ):
            q = qtable.get("/".join(context.module.path))
            if q is not None:
                if weight_only:
                    # Match the module's configured compute dtype (fp32
                    # serving must NOT silently downcast activations to
                    # bf16 — weight-only's whole point is weight-rounding
                    # error only).
                    compute = context.module.dtype or args[0].dtype
                    return int8_dense_weight_only(
                        args[0], q["wq"], q["scale"], q["bias"],
                        compute_dtype=compute,
                    )
                return int8_dense(args[0], q["wq"], q["scale"], q["bias"],
                                  sx=q.get("sx"))
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_activation_scales(
    module: nn.Module,
    variables,
    qtable: Mapping[str, Mapping[str, jnp.ndarray]],
    *args,
    margin: float = 1.0,
    **kwargs,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """One calibration forward -> static per-tensor activation scales.

    Runs ``module.apply`` on the calibration batch with the W8A8
    interceptor active (so each layer sees its true *serving-time* input
    distribution, downstream of earlier quantized layers), recording
    ``max|x|`` per quantized Dense. Returns a new qtable whose entries
    carry ``sx = margin * max|x| / 127`` as a static f32 scalar;
    :func:`int8_dense` then skips the dynamic row-max. Activations beyond
    the calibrated range at predict time saturate at +-127 (bounded by the
    symmetric clip) — use ``margin > 1`` for headroom on narrow
    calibration batches. Runs eagerly (one un-jitted forward).
    """
    maxima: Dict[str, jnp.ndarray] = {}
    base = _make_interceptor(qtable, weight_only=False)

    def interceptor(next_fun, iargs, ikwargs, context):
        if context.method_name == "__call__" and isinstance(
            context.module, nn.Dense
        ):
            path = "/".join(context.module.path)
            if path in qtable:
                m = jnp.max(jnp.abs(iargs[0].astype(jnp.float32)))
                prev = maxima.get(path)
                maxima[path] = m if prev is None else jnp.maximum(prev, m)
        return base(next_fun, iargs, ikwargs, context)

    with nn.intercept_methods(interceptor):
        module.apply(variables, *args, **kwargs)

    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, entry in qtable.items():
        e = dict(entry)
        if path in maxima:
            e["sx"] = (
                jnp.maximum(maxima[path], 1e-12) * (float(margin) / 127.0)
            ).astype(jnp.float32)
        out[path] = e
    return out


def quantized_apply(
    module: nn.Module, variables, qtable, *args, weight_only: bool = False,
    **kwargs,
):
    """``module.apply`` with quantized Dense layers swapped in by path.

    jit-compatible: close over nothing — ``variables`` and ``qtable`` are
    ordinary pytree arguments, so a ``jax.jit(lambda v, q, x: ...)`` wrapper
    re-traces only on shape changes. ``weight_only=True`` uses
    :func:`int8_dense_weight_only` instead of W8A8.
    """
    with nn.intercept_methods(_make_interceptor(qtable, weight_only)):
        return module.apply(variables, *args, **kwargs)


def strip_quantized(params: Mapping, qtable: Mapping[str, Any]):
    """Replace quantized kernels with (1, 1) placeholders to reclaim HBM.

    The interceptor bypasses ``nn.Dense.__call__`` entirely for quantized
    paths, so their fp32 kernels are never read at apply time; Flax only
    materializes variables a module actually requests, making an
    unread placeholder safe. Saves ~4x the quantized weights' bytes
    (fp32 -> int8 + one f32 scale vector).
    """
    quantized_paths = {tuple(p.split("/")) for p in qtable}

    def rebuild(node, path):
        if not _is_mapping(node):
            return node
        out = {}
        for key, child in node.items():
            if key == "kernel" and path in quantized_paths:
                out[key] = jnp.zeros((1, 1), jnp.float32)
            elif _is_mapping(child):
                out[key] = rebuild(child, path + (key,))
            else:
                out[key] = child
        return out

    return rebuild(params, ())


def quantized_size_bytes(qtable: Mapping[str, Mapping[str, jnp.ndarray]]) -> int:
    """Total serving bytes of the int8 table (weights + scales + biases)."""
    total = 0
    for entry in qtable.values():
        for arr in entry.values():
            if arr is not None:
                total += int(np.prod(arr.shape)) * arr.dtype.itemsize
    return total
