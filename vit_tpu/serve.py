"""Batch inference / serving.

Production counterpart to training (the rebuild's deployment target): load a
trained checkpoint — orbax (``best``/``last``/path) or a reference torch
state dict — and run jit-compiled batched prediction with static shapes
(last batch padded), returning *denormalized* stellar parameters for
regression or class probabilities for classification.

Label denormalization uses the normalization statistics persisted in the
checkpoint's ``meta.yaml`` at train time (no training data needed at
serving time).

Serving-time performance knobs (training numerics are untouched; measured
numbers in BASELINE.md "Serving"):

* ``precision="bf16"`` — run the forward in bf16 (fp32-trained checkpoints
  serve fine; 1.16x over fp32 on ViT-B/16 batch 128).
* ``perf_preset=True`` — bf16 + tanh GELU + bf16 softmax accumulation:
  1.53x over fp32 serving (3,154 img/s on ViT-B/16 batch 128, v5e).
* ``quantize="int8"`` — int8 encoder weights (:mod:`vit_tpu.ops.quant`):
  4x smaller resident weights (serving density). With ``calibration=``
  (a batch of representative inputs) W8A8 uses static activation scales
  and beats bf16 at every measured batch size (**1.15x at batch 128,
  1.20x at batch 8** on ViT-B/16 v5e); without one, auto-routed between
  dynamic W8A8 (small batch, 1.14x at 8) and weight-only (large batch)
  at the measured crossover. ``"int8-w8a8"`` / ``"int8-wo"`` pin the
  variant.
* ``perf_preset=True`` + ``quantize="int8", calibration=...`` **compose**
  (the preset's wins are the non-matmul ops; int8's win is the MXU):
  measured **4,052 img/s = 1.68x over bf16** on ViT-B/16 batch 128, v5e
  — the recommended deployment configuration (accuracy deltas are
  independent and both CI-bounded).

Example::

    from vit_tpu.serve import Predictor
    p = Predictor.from_checkpoint("configs/exp/att_clp/baseline.yaml", ckpt="best")
    params = p.predict(spectra)          # (N, num_labels), physical units
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Predictor"]


def _check_quantize_mode(quantize: Optional[str]) -> None:
    if quantize not in (None, "int8", "int8-w8a8", "int8-wo"):
        raise ValueError(
            f"Unsupported quantize mode '{quantize}' "
            "(expected None, 'int8', 'int8-w8a8', or 'int8-wo')"
        )


class Predictor:
    def __init__(
        self,
        module,
        params,
        vit_config,
        label_norm: str = "none",
        label_norm_stats: Optional[dict] = None,
        batch_size: int = 256,
        quantize: Optional[str] = None,
        calibration=None,
        num_devices: Optional[int] = None,
        input_shape: Optional[tuple] = None,
    ) -> None:
        self.module = module
        self.params = params
        self.vit_config = vit_config
        self.quantize = quantize
        # Per-sample input shape (no batch dim); recorded by from_checkpoint,
        # needed by vit_tpu.export.export_predictor's static-shape lowering.
        self.input_shape = tuple(input_shape) if input_shape else None
        self.label_norm = label_norm or "none"
        self.label_norm_stats = {
            k: (None if v is None else np.asarray(v, np.float64))
            for k, v in (label_norm_stats or {}).items()
        }
        self.batch_size = int(batch_size)
        if (
            self.label_norm != "none"
            and getattr(vit_config, "task_type", "reg") != "cls"
            and not any(v is not None for v in self.label_norm_stats.values())
        ):
            # e.g. a torch checkpoint with no local meta.yaml: denormalize
            # becomes the identity, silently breaking the "physical units"
            # contract — make the degradation loud.
            print(
                f"[serve] label_norm='{self.label_norm}' but no normalization "
                "stats were found in checkpoint meta — predictions will be "
                "returned in NORMALIZED units"
            )
        _check_quantize_mode(quantize)
        # Data-parallel serving: shard each inference batch over the mesh
        # `data` axis (params replicated) — throughput scales with chips for
        # the MXU-bound image shapes. None = single-device jit (default).
        jit_kwargs = {}
        self.mesh = None
        if num_devices is not None and num_devices > 1:
            from vit_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicated_sharding,
            )

            n_avail = len(jax.devices())
            if num_devices > n_avail:
                raise ValueError(
                    f"num_devices={num_devices} requested but only "
                    f"{n_avail} devices are available"
                )
            self.mesh = make_mesh(num_devices=num_devices)
            n_shards = self.mesh.shape["data"]
            if self.batch_size % n_shards:
                raise ValueError(
                    f"serving batch_size {self.batch_size} must divide by "
                    f"the data-parallel degree {n_shards}"
                )
            repl = replicated_sharding(self.mesh)
            bshard = batch_sharding(self.mesh)
            n_weight_args = 2 if quantize is not None else 1
            jit_kwargs = dict(
                in_shardings=(repl,) * n_weight_args + (bshard,),
                out_shardings=bshard,
            )
        self.quant_variant = None
        if quantize is None:
            if self.mesh is not None:
                self.params = jax.device_put(self.params, repl)
            self._forward = jax.jit(
                lambda p, x: module.apply({"params": p}, x, deterministic=True),
                **jit_kwargs,
            )
        else:
            # int8 encoder weights (vit_tpu.ops.quant): fp32 kernels are
            # stripped from the resident tree (4x smaller weights in HBM —
            # the serving-density win; BASELINE.md "Serving" table).
            # 'int8' = W8A8 dynamic (int8 MXU matmuls; best measured
            # mid-batch); 'int8-wo' = weight-only (dequantize-into-matmul,
            # no activation quant; exact accumulation under f32 serving).
            if getattr(vit_config, "fused_mlp", False) or getattr(
                vit_config, "fused_qkv", False
            ):
                # The fused-MLP Pallas path and the fused-QKV path read
                # their kernels directly (not through nn.Dense.__call__),
                # so the int8 interceptor never fires for them while
                # strip_quantized would hand them (1,1) placeholders.
                # from_checkpoint rebuilds with both off; a
                # directly-constructed module must do the same.
                raise ValueError(
                    "quantize requires the unfused Dense paths: rebuild the "
                    "module with model.fused_mlp=False and "
                    "model.fused_qkv=False (identical math)"
                )
            from vit_tpu.ops.quant import (
                W8A8_WO_BATCH_THRESHOLD,
                calibrate_activation_scales,
                quantize_dense_params,
                quantized_apply,
                strip_quantized,
            )

            self._qtable = quantize_dense_params(self.params)
            if not self._qtable:
                # e.g. the hidden-32 baseline family: nothing clears
                # min_fan_in, so serving would silently run full fp32
                # against the user's explicit density request.
                print(
                    f"[serve] quantize='{quantize}' matched no layers "
                    "(no Dense kernel with fan-in >= 64) — serving "
                    "UNQUANTIZED at full resident size"
                )
            self.params = strip_quantized(self.params, self._qtable)
            # "int8" auto-routes (measured, BASELINE.md "Serving"):
            # with a calibration batch, static-scale W8A8 wins at EVERY
            # measured batch size (1.15x at 128, 1.20x at 8 vs bf16 —
            # the quant fuses into the preceding ops, so the int8 MXU
            # rate shows through) and always routes W8A8. Without one,
            # the route is by batch size: small batches are
            # weight-streaming bound and dynamic W8A8 wins (1.14x at 8);
            # at/above W8A8_WO_BATCH_THRESHOLD the forward is MXU-bound
            # in bf16 and the per-row quant/dequant cancels the gain
            # (0.98x at 128), so weight-only keeps the 4x HBM cut
            # without the activation-path overhead. "int8-w8a8" /
            # "int8-wo" pin the variant explicitly.
            weight_only = quantize == "int8-wo" or (
                quantize == "int8"
                and calibration is None
                and self.batch_size >= W8A8_WO_BATCH_THRESHOLD
            )
            self.quant_variant = "int8-wo" if weight_only else "int8-w8a8"
            if calibration is not None and not weight_only and self._qtable:
                # Static per-tensor activation scales: the quant becomes a
                # fusable elementwise chain (no per-row max reduction).
                calib = jnp.asarray(
                    np.asarray(calibration, np.float32)[: self.batch_size]
                )
                self._qtable = calibrate_activation_scales(
                    module, {"params": self.params}, self._qtable, calib,
                    deterministic=True,
                )
            if self.mesh is not None:
                self.params = jax.device_put(self.params, repl)
                self._qtable = jax.device_put(self._qtable, repl)
            self._forward = jax.jit(
                lambda p, q, x: quantized_apply(
                    module, {"params": p}, q, x, deterministic=True,
                    weight_only=weight_only,
                ),
                **jit_kwargs,
            )
            self._forward = (
                lambda p, x, _f=self._forward: _f(p, self._qtable, x)
            )

    # -- construction -------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        config: Union[str, dict],
        ckpt: str = "best",
        batch_size: int = 256,
        precision: Optional[str] = None,
        quantize: Optional[str] = None,
        calibration=None,
        perf_preset: bool = False,
        num_devices: Optional[int] = None,
    ) -> "Predictor":
        """Build from a YAML config (path or dict) + checkpoint spec.

        ``ckpt``: ``best`` | ``last`` | orbax dir | torch ``.pt``/``.ckpt``.
        ``precision``: serving compute dtype override (e.g. ``"bf16"``) —
        params stay fp32, matmuls run in the given dtype (fp32-trained
        checkpoints serve fine in bf16). ``quantize``: ``"int8"``
        (auto-routes: calibrated W8A8 whenever ``calibration`` is given —
        it wins at every measured batch size — else dynamic W8A8 below /
        weight-only at-or-above the measured batch crossover),
        ``"int8-w8a8"`` (pin W8A8), or ``"int8-wo"`` (pin weight-only)
        for the encoder Dense layers (:mod:`vit_tpu.ops.quant`).
        ``calibration``: optional array of representative inputs — W8A8
        then uses static per-tensor activation scales (the quant fuses
        into the preceding ops instead of paying a per-row max
        reduction; 1.15x over bf16 at batch 128 on ViT-B/16 v5e).
        ``perf_preset=True`` applies the
        measured serving fast path — bf16 compute (unless ``precision`` is
        given) + tanh GELU + bf16 softmax accumulation: 1.53x over fp32
        serving on ViT-B/16 batch 128 (BASELINE.md "Serving" table), at the
        same opt-in numerics tradeoffs as the training perf preset.
        ``num_devices > 1`` serves data-parallel over a mesh (batches
        sharded on the ``data`` axis, params replicated).
        """
        from vit_tpu.config import load_config
        from vit_tpu.hardware import enable_compilation_cache
        from vit_tpu.models.builder import get_model
        from vit_tpu.train.checkpoint import CheckpointManager, default_ckpt_dir

        # Fail fast on a bad mode — BEFORE model build + checkpoint restore
        # (seconds to minutes over a TPU tunnel).
        _check_quantize_mode(quantize)
        cfg = load_config(config) if isinstance(config, str) else dict(config)
        # Serving restarts recompile the same forward — cache it.
        enable_compilation_cache(cfg)
        if perf_preset:
            if precision is None:
                precision = "bf16"
            cfg = dict(cfg, model=dict(cfg.get("model", {}) or {},
                                       gelu_approximate=True,
                                       softmax_dtype="bfloat16"))
        if precision is not None:
            cfg = dict(cfg, train=dict(cfg.get("train", {}) or {}, precision=precision))
        if (cfg.get("model", {}) or {}).get("attn_impl") == "ring":
            # Sequence parallelism is a training-mesh concern; serving runs
            # the numerically-identical single-host xla kernel.
            cfg = dict(cfg, model=dict(cfg["model"], attn_impl="xla"))
        mcfg = cfg.get("model", {}) or {}
        if quantize is not None and (
            mcfg.get("fused_mlp") or mcfg.get("fused_qkv")
        ):
            # The fused-MLP Pallas path and the fused-QKV path read their
            # kernels directly, bypassing the nn.Dense interception that
            # int8 serving hooks — serve the identical-math unfused Dense
            # layers instead.
            cfg = dict(cfg, model=dict(cfg["model"], fused_mlp=False,
                                       fused_qkv=False))
        bundle = get_model(cfg)
        # enabled=False: read-only — no checkpoint-dir creation side effects
        # at serving time (read_meta does not need an enabled manager).
        mgr = CheckpointManager(
            default_ckpt_dir(), bundle.model_name, enabled=False
        )
        meta = mgr.read_meta()

        # Template params (raw input dim: eigvec rows for preprocessor models;
        # image models always take raw NHWC regardless of patch-PCA).
        vc = bundle.vit_config
        if vc.input_kind == "image":
            dummy = jnp.zeros((1, vc.image_size, vc.image_size, vc.num_channels))
        else:
            in_dim = cfg["model"]["image_size"]
            if bundle.has_preprocessor:
                from vit_tpu.utils import load_cov_stats

                in_dim = int(load_cov_stats(cfg["warmup"]["cov_path"])["eigvecs"].shape[0])
            dummy = jnp.zeros((1, in_dim))
        template = bundle.module.init(jax.random.PRNGKey(0), dummy)["params"]

        if str(ckpt).endswith((".pt", ".pth", ".ckpt")):
            from vit_tpu.train.torch_bridge import load_torch_checkpoint

            params = load_torch_checkpoint(str(ckpt), template, vc)
            params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            from vit_tpu.train.loop import TrainState
            from vit_tpu.train.optim import OptSpec, build_optimizer

            # The restore template's opt_state pytree must match what
            # training used — build the optimizer from the SAME config
            # (an adamw template cannot restore e.g. an sgd checkpoint).
            spec = OptSpec.from_config(cfg, steps_per_epoch=1)
            tx = build_optimizer(spec)
            state_t = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=template,
                opt_state=tx.init(template),
                rng=jax.random.PRNGKey(0),
                plateau_scale=jnp.ones(()),
                frozen=jnp.zeros(()),
            )
            restored = CheckpointManager.restore(mgr.resolve(str(ckpt)), state_t)
            params = jax.tree_util.tree_map(jnp.asarray, restored.params)

        return cls(
            bundle.module,
            params,
            vc,
            label_norm=meta.get("label_norm", (cfg.get("data", {}) or {}).get("label_norm", "none")),
            label_norm_stats=meta.get("label_norm_stats"),
            batch_size=batch_size,
            quantize=quantize,
            calibration=calibration,
            num_devices=num_devices,
            input_shape=tuple(dummy.shape[1:]),
        )

    def export(self, path: str, platforms=None, input_shape=None) -> dict:
        """Write a self-contained AOT serving artifact (``jax.export``
        StableHLO: params + denormalization compiled in) that
        :func:`vit_tpu.export.load_exported` serves without model code."""
        from vit_tpu.export import export_predictor

        return export_predictor(
            self, path, input_shape=input_shape, platforms=platforms
        )

    # -- inference -----------------------------------------------------------
    def _batched_logits(self, x: np.ndarray) -> np.ndarray:
        n = len(x)
        if n == 0:
            return np.zeros((0, int(self.vit_config.num_labels)), np.float32)
        bs = self.batch_size
        outs = []
        for i in range(0, n, bs):
            chunk = x[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
            logits = np.asarray(self._forward(self.params, jnp.asarray(chunk)))
            outs.append(logits[: bs - pad] if pad else logits)
        return np.concatenate(outs)

    def _denormalize(self, y: np.ndarray) -> np.ndarray:
        from vit_tpu.viz.viz_utils import denormalize

        s = self.label_norm_stats
        return denormalize(
            y,
            self.label_norm,
            label_mean=s.get("label_mean"),
            label_std=s.get("label_std"),
            label_min=s.get("label_min"),
            label_max=s.get("label_max"),
        )

    def predict(self, x: np.ndarray) -> np.ndarray:
        """reg: denormalized parameters (N, num_labels); cls: class ids (N,)."""
        logits = self._batched_logits(np.asarray(x, np.float32))
        if self.vit_config.task_type == "cls":
            return logits.argmax(axis=-1)
        return self._denormalize(logits)

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        """Classification: softmax probabilities (N, num_classes)."""
        if self.vit_config.task_type != "cls":
            raise ValueError("predict_proba is only defined for classification")
        logits = self._batched_logits(np.asarray(x, np.float32))
        z = logits - logits.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)
