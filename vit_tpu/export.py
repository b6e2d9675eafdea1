"""AOT serving artifacts: compile once, deploy without model code.

:func:`export_predictor` serializes a :class:`vit_tpu.serve.Predictor`'s
jit-compiled forward — parameters, (optional) int8 tables and the label
denormalization arithmetic all baked into one StableHLO program via
``jax.export`` — into a single self-contained file. A deployment host
reloads it with :func:`load_exported` and serves with **no vit_tpu model
code, no checkpoint directory and no config YAML**: just jax + this module.

This is the TPU-native answer to the reference stack's torchscript-style
deployment gap (the reference serves by re-instantiating the Lightning
module from YAML + ``.ckpt``, `/root/reference/scripts/test.py`): a
StableHLO artifact is ahead-of-time compiled, hermetic and
platform-checked (``jax.export`` records the lowering platforms and
refuses to run elsewhere), so serving hosts cannot drift from training
numerics.

File format (``MAGIC`` + 4-byte little-endian header length + JSON header
+ serialized ``jax.export`` blob)::

    VITXPT1\\n <u32 len> {"format":1, "task_type":..., ...} <blob>

The exported function maps one **static-shape batch** ``(batch_size, *in)``
of raw inputs to physical-unit predictions (regression; the checkpoint's
label normalization stats are constant-folded into the graph) or raw
logits (classification). :class:`ExportedPredictor` wraps it with the same
pad-the-last-chunk batching as the live ``Predictor``.
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["export_predictor", "load_exported", "ExportedPredictor", "MAGIC"]

MAGIC = b"VITXPT1\n"
_FORMAT = 1


def _denorm_fn(label_norm: str, stats: dict):
    """jnp mirror of viz_utils.denormalize (f32, constants baked in), or
    None when the kind/stats don't support denormalization."""
    import jax.numpy as jnp

    kind = (label_norm or "none").lower()
    eps = 1e-8
    if kind in ("standard", "zscore"):
        mean, std = stats.get("label_mean"), stats.get("label_std")
        if mean is None or std is None:
            return None
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        std = jnp.where(jnp.abs(std) < eps, 1.0, std)
        return lambda y: y * std + mean
    if kind == "minmax":
        lo, hi = stats.get("label_min"), stats.get("label_max")
        if lo is None or hi is None:
            return None
        lo = jnp.asarray(lo, jnp.float32)
        denom = jnp.asarray(hi, jnp.float32) - lo
        denom = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        return lambda y: y * denom + lo
    return None


def export_predictor(
    predictor,
    path: str,
    input_shape: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``predictor``'s forward to ``path``; returns the header.

    ``input_shape``: per-sample shape (no batch dim); defaults to the shape
    recorded by ``Predictor.from_checkpoint``. ``platforms``: lowering
    platforms (e.g. ``("tpu",)`` or ``("cpu", "tpu")``); defaults to the
    current backend. The artifact's batch size is the predictor's.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    if predictor.mesh is not None:
        raise ValueError(
            "export_predictor targets single-device serving; build the "
            "Predictor without num_devices (the artifact can still be "
            "served one-per-chip)"
        )
    shape = tuple(input_shape or getattr(predictor, "input_shape", None) or ())
    if not shape:
        raise ValueError(
            "input_shape is required for directly-constructed Predictors "
            "(from_checkpoint records it automatically)"
        )
    vc = predictor.vit_config
    task_type = getattr(vc, "task_type", "reg")
    denorm = None
    if task_type != "cls":
        denorm = _denorm_fn(predictor.label_norm, predictor.label_norm_stats)

    def fn(x):
        y = predictor._forward(predictor.params, x)
        return denorm(y) if denorm is not None else y

    spec = jax.ShapeDtypeStruct((predictor.batch_size,) + shape, jnp.float32)
    # When the caller doesn't pin platforms, let jax.export pick (it
    # canonicalizes the default backend — e.g. the axon TPU tunnel registers
    # as 'axon' but lowers/canonicalizes to 'tpu'). Passing the raw backend
    # name through would bake an uncanonicalized platform into the artifact
    # and every call-time platform check would fail, even on the exporting
    # host. Record what the export actually contains, not what we asked for.
    plats = tuple(platforms) if platforms else None
    exported = jax_export.export(jax.jit(fn), platforms=plats)(spec)
    blob = exported.serialize()

    header = {
        "format": _FORMAT,
        "task_type": task_type,
        "batch_size": int(predictor.batch_size),
        "input_shape": list(shape),
        "num_labels": int(getattr(vc, "num_labels", 1)),
        "label_norm": predictor.label_norm,
        "denormalized": denorm is not None,
        "quantize": predictor.quantize,
        "platforms": list(exported.platforms),
    }
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(hjson)))
        f.write(hjson)
        f.write(blob)
    return header


class ExportedPredictor:
    """Serve a :func:`export_predictor` artifact (no model code needed)."""

    def __init__(self, header: dict, exported) -> None:
        self.header = header
        self._exported = exported
        self.batch_size = int(header["batch_size"])
        self.task_type = header["task_type"]
        self.input_shape: Tuple[int, ...] = tuple(header["input_shape"])

    def _batched(self, x: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        x = np.asarray(x, np.float32)
        if x.shape[1:] != self.input_shape:
            raise ValueError(
                f"input shape {x.shape[1:]} != exported {self.input_shape}"
            )
        n, bs = len(x), self.batch_size
        if n == 0:
            return np.zeros((0, int(self.header["num_labels"])), np.float32)
        outs = []
        for i in range(0, n, bs):
            chunk = x[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            out = np.asarray(self._exported.call(jnp.asarray(chunk)))
            outs.append(out[: bs - pad] if pad else out)
        return np.concatenate(outs)

    def predict(self, x: np.ndarray) -> np.ndarray:
        """reg: physical-unit predictions (denormalization is compiled into
        the artifact); cls: class ids."""
        out = self._batched(x)
        if self.task_type == "cls":
            return out.argmax(axis=-1)
        return out

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        if self.task_type != "cls":
            raise ValueError("predict_proba is only defined for classification")
        logits = self._batched(x)
        z = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)


# Sanity bound on the JSON header length: a real header is <1 KB, so any
# length beyond this means the 4 length bytes are garbage (truncated or
# corrupt file) — fail loudly instead of attempting a multi-GB read.
_MAX_HEADER = 1 << 20


def load_exported(path: str) -> ExportedPredictor:
    """Load an artifact written by :func:`export_predictor`.

    Raises ``ValueError`` (with ``path`` in the message) for anything that
    is not a well-formed artifact — bad magic, truncation, corrupt header —
    matching the bad-magic path's loud-failure contract.
    """
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a vit_tpu export (bad magic {magic!r})")
        lenbytes = f.read(4)
        if len(lenbytes) != 4:
            raise ValueError(f"{path}: truncated vit_tpu export (no header length)")
        (hlen,) = struct.unpack("<I", lenbytes)
        if hlen == 0 or hlen > _MAX_HEADER:
            raise ValueError(
                f"{path}: corrupt vit_tpu export (header length {hlen})"
            )
        hraw = f.read(hlen)
        if len(hraw) != hlen:
            raise ValueError(f"{path}: truncated vit_tpu export (short header)")
        try:
            header = json.loads(hraw.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: corrupt vit_tpu export header ({e})") from e
        if header.get("format") != _FORMAT:
            raise ValueError(f"{path}: unsupported format {header.get('format')}")
        blob = f.read()
    exported = jax_export.deserialize(blob)
    if (
        header.get("task_type") == "reg"
        and (header.get("label_norm") or "none").lower() != "none"
        and not header.get("denormalized", False)
    ):
        # Mirror the live Predictor's loud degradation notice: the artifact
        # was exported without denorm stats, so it serves NORMALIZED units.
        print(
            f"[vit_tpu.export] WARNING: {path} was exported without label "
            f"denormalization stats (label_norm={header.get('label_norm')!r}); "
            "predictions are in NORMALIZED units, not physical units."
        )
    return ExportedPredictor(header, exported)
