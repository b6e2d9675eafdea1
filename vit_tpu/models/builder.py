"""Model construction: config dataclass, builder, naming.

Parity targets:
* ``get_vit_config`` — `/root/reference/src/models/builder.py:200-258`
  (num_labels derived from ``data.param`` for regression, overriding config;
  ``intermediate_size = 4*hidden``; dropout 0.1/0.1; defaults for RoPE).
* ``get_model``     — `/root/reference/src/models/builder.py:136-197`
  (no preprocessor -> vanilla ViT; else cov stats -> ZCA/PCA/attention
  preprocessor, eigvec-dim validation, auto-adjust of ``model.image_size``
  to the preprocessor output dim, encoded model names like
  ``PCA64_fz5_ViT``).
* ``build_model_name`` — `/root/reference/src/models/model_utils.py:9-41`.

TPU-first extensions (no reference analogue):
* ``dtype``/``param_dtype`` compute-precision policy (bf16 on the MXU),
* ``attn_impl`` kernel selection (xla | flash | auto | ring),
* ``input_kind: image`` + ``IMAGE_VIT_PRESETS`` (ViT-S/16, B/16, L/16) for
  the standard image-ViT family named in the rebuild's benchmark configs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.config import normalize_task
from vit_tpu.models.preprocessor import (
    LinearPreprocessor,
    PrefilledAttention,
    compute_pca_matrix,
    compute_zca_matrix,
)
from vit_tpu.models.tokenization import (
    conv1d_num_patches,
    sliding_window_num_patches,
)
from vit_tpu.utils import load_cov_stats

__all__ = [
    "VitConfig",
    "ModelBundle",
    "get_vit_config",
    "get_model",
    "build_model_name",
    "IMAGE_VIT_PRESETS",
]

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "bf16-mixed": jnp.bfloat16,
}

# Standard image-ViT presets (patch 16): hidden/layers/heads.
IMAGE_VIT_PRESETS: Dict[str, Dict[str, int]] = {
    "vit-s16": dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6, patch_size=16),
    "vit-b16": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12, patch_size=16),
    "vit-l16": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, patch_size=16),
}


@dataclasses.dataclass(frozen=True)
class VitConfig:
    """Static model configuration (all shapes resolved before jit)."""

    task_type: str = "reg"
    image_size: int = 4096
    patch_size: int = 32
    num_channels: int = 1
    hidden_size: int = 32
    num_hidden_layers: int = 3
    num_attention_heads: int = 2
    intermediate_size: int = 128
    stride_ratio: float = 1.0
    stride_size: Optional[int] = None
    proj_fn: str = "SW"
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    qkv_bias: bool = True
    num_labels: int = 1
    pos_encoding_type: Optional[str] = None
    max_position_embeddings: int = 512
    rope_base: float = 10000.0
    input_kind: str = "spectra"  # 'spectra' (1-D) | 'image' (2-D)
    attn_impl: str = "auto"  # 'xla' | 'flash' | 'auto' | 'ring' (seq-parallel)
    # Inner key-block width for attn_impl: ring (None = min(512, T_local)):
    # peak per-device transient memory is O(T_local * ring_block_k).
    ring_block_k: Optional[int] = None
    precision: str = "float32"  # compute dtype name
    # Rematerialization: False = save all residuals, True = remat whole
    # encoder layers, "mlp" = remat only the MLP sublayer (attention
    # residuals stay saved so the backward never re-runs the flash
    # forward kernel — the cheap middle ground for long-context shapes).
    remat: Union[bool, str] = False
    # tanh-approximate GELU instead of exact erf. Off by default (HF/torch
    # ViT parity is exact erf); measured on v5e B/16 as a VPU-side saving —
    # see BASELINE.md round-4 rows before enabling for training runs.
    gelu_approximate: bool = False
    # Accumulation/softmax dtype for the XLA attention path's (B,H,T,T)
    # score tensor. None = float32 (reference semantics: fp32 softmax
    # accumulation). 'bfloat16' halves the HBM traffic of the attention
    # score/probability tensors — the measured B/16 sink (BASELINE.md
    # round-4 trace) — at ~1e-2 relative probs error; opt-in perf knob,
    # same contract as gelu_approximate.
    softmax_dtype: Optional[str] = None
    # Counter-based dropout masks (vit_tpu.ops.dropout): ~10% faster epochs
    # on the dispatch-bound baseline; different RNG stream than nn.Dropout
    # (semantic parity). Set model.fast_dropout: false for threefry/rbg.
    fast_dropout: bool = True
    # One (D, 3D) QKV projection instead of three (D, D) matmuls — same
    # math, same checkpoint layout (kernels concatenated inside the step).
    fused_qkv: bool = False
    # Mixture-of-Experts MLP (vit_tpu.models.moe): 0/1 = dense (reference
    # semantics), E > 1 replaces each layer's MLP with E experts + top-k
    # router. Expert-stacked params shard over the mesh `model` axis
    # (expert parallelism, train.model_parallel).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    # Weight of the Switch load-balance auxiliary loss in the training
    # objective (eval losses exclude it).
    moe_aux_weight: float = 0.01
    # Router z-loss weight (ST-MoE): mean(logsumexp(router logits)^2),
    # keeping logits bounded; 0 disables (and nothing extra is sown).
    moe_z_weight: float = 0.0
    # Switch-style router input jitter: multiplicative uniform noise in
    # [1-j, 1+j] on the router input, training mode only; 0 disables.
    moe_router_jitter: float = 0.0
    # Fused Pallas MLP kernel (vit_tpu.ops.fused_mlp): dense->GELU->dense in
    # one HBM round trip. Measured SLOWER on the baseline (105.7 vs 97.5
    # ms/epoch: per-call overhead matches the ops it replaces at this tiny
    # scale) — off by default, available for experimentation.
    fused_mlp: bool = False

    @property
    def dtype(self):
        key = str(self.precision).lower()
        if key not in _DTYPES:
            raise ValueError(f"Unsupported precision '{self.precision}'")
        return _DTYPES[key]

    @property
    def stride(self) -> int:
        if self.stride_size and self.stride_size > 0:
            return int(self.stride_size)
        return int(self.stride_ratio * self.patch_size)

    @property
    def num_patches(self) -> int:
        if self.input_kind == "image":
            return (self.image_size // self.patch_size) ** 2
        if self.proj_fn == "SW":
            return sliding_window_num_patches(self.image_size, self.patch_size, self.stride)
        if self.proj_fn in ("C1D", "CNN"):
            return conv1d_num_patches(self.image_size, self.patch_size, self.stride)
        if self.proj_fn in ("LIN", "linear"):
            return self.image_size // self.patch_size
        raise ValueError(f"Unsupported proj_fn '{self.proj_fn}'")

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def step_matmul_flops(
    vc: VitConfig, batch_size: int, train: bool = True
) -> float:
    """Analytic matmul FLOPs of one step (multiply-add = 2 FLOPs).

    Counts the ViT's matmul work — patch embed, per-layer QKV/out
    projections, the two T x T attention matmuls, the MLP pair, and the
    head — for one batch; ``train=True`` applies the standard fwd+bwd
    factor 3 (backward re-runs each matmul twice: dL/dx and dL/dW).
    Elementwise work (LN, GELU, softmax, dropout, residuals) and the
    optional covariance preprocessor are excluded, so this is a lower
    bound within a few percent at MXU-relevant shapes — the denominator
    for achieved-TFLOP/s / MFU observability (``train.log_mfu``) and the
    basis of BASELINE.md's MFU accounting.
    """
    T, H, L = vc.seq_len, vc.hidden_size, vc.num_hidden_layers
    inter = vc.intermediate_size
    if vc.input_kind == "image":
        patch_in = vc.patch_size**2 * vc.num_channels
    else:
        patch_in = vc.patch_size
    embed = 2.0 * vc.num_patches * patch_in * H
    if getattr(vc, "moe_experts", 0) > 1:
        # MoE MLP: experts process E*C slot-tokens per row (C = per-row
        # capacity) instead of T, plus the (T, H)@(H, E) router.
        from vit_tpu.models.moe import moe_capacity

        slots = vc.moe_experts * moe_capacity(
            T, vc.moe_experts, vc.moe_top_k, vc.moe_capacity_factor
        )
        mlp = 4.0 * slots * H * inter + 2.0 * T * H * vc.moe_experts
    else:
        mlp = 4.0 * T * H * inter
    per_layer = 8.0 * T * H * H + 4.0 * T * T * H + mlp
    head = 2.0 * H * vc.num_labels
    fwd = batch_size * (L * per_layer + embed + head)
    return 3.0 * fwd if train else fwd


@dataclasses.dataclass
class ModelBundle:
    """Everything the training runtime needs to know about the built model."""

    module: nn.Module
    vit_config: VitConfig
    model_name: str
    loss_name: str
    freeze_epochs: int = 0
    has_preprocessor: bool = False
    preprocessor_desc: str = ""


def build_model_name(cfg: VitConfig, model_prefix: str = "ViT", full_config: Optional[dict] = None) -> str:
    """``{prefix}_p{patch}_h{hidden}_l{layers}_a{heads}_s{stride}_p{proj}``
    plus ``_nz{level}`` when noise_level > 0 (reference `model_utils.py:9-41`)."""
    stride_tag = (
        int(cfg.stride_size)
        if (cfg.stride_size is not None and cfg.stride_size)
        else cfg.stride_ratio
    )
    name = (
        f"{model_prefix}_p{cfg.patch_size}_h{cfg.hidden_size}_l{cfg.num_hidden_layers}_"
        f"a{cfg.num_attention_heads}_s{stride_tag}_p{cfg.proj_fn}"
    )
    if getattr(cfg, "moe_experts", 0) > 1:
        # rebuild-only family tag: MoE checkpoints must not collide with
        # the dense model of the same geometry
        name += f"_moe{cfg.moe_experts}"
    if full_config is not None:
        noise_level = (full_config.get("noise", {}) or {}).get("noise_level", 0)
        if noise_level and noise_level > 0:
            name += f"_nz{str(noise_level).replace('.', '')}"
    return name


def _derive_num_labels(m: dict, d: dict, task: str) -> int:
    if task in ("reg", "regression"):
        p = d.get("param")
        num_labels = 1
        if isinstance(p, str) and p.strip():
            num_labels = max(1, len([x for x in p.split(",") if x.strip()]))
        elif isinstance(p, (list, tuple)) and len(p) > 0:
            num_labels = len(p)
        cfg_labels = m.get("num_labels")
        if cfg_labels is not None and int(cfg_labels) != num_labels:
            print(
                f"Warning: model.num_labels={cfg_labels} conflicts with data.param "
                f"(implies {num_labels}); using {num_labels}"
            )
        m["num_labels"] = num_labels
        return num_labels
    return int(m.get("num_labels", 1) or 1)


def get_vit_config(config: dict) -> VitConfig:
    """YAML ``model`` (+``data``/``train``) sections -> :class:`VitConfig`."""
    m = dict(config["model"])
    preset = IMAGE_VIT_PRESETS.get(str(m.get("name", "")).lower())
    if preset:
        for k, v in preset.items():
            m.setdefault(k, v)
        m.setdefault("input_kind", "image")
    d = config.get("data", {}) or {}
    t = config.get("train", {}) or {}
    task = normalize_task(config)
    num_labels = _derive_num_labels(m, d, task)
    config["model"]["num_labels"] = m.get("num_labels", num_labels)

    hidden = int(m["hidden_size"])
    return VitConfig(
        task_type=task,
        image_size=int(m["image_size"]),
        patch_size=int(m["patch_size"]),
        num_channels=int(m.get("num_channels", 3 if m.get("input_kind") == "image" else 1)),
        hidden_size=hidden,
        num_hidden_layers=int(m["num_hidden_layers"]),
        num_attention_heads=int(m["num_attention_heads"]),
        intermediate_size=int(m.get("intermediate_size", 4 * hidden)),
        stride_ratio=m.get("stride_ratio", 1),
        stride_size=m.get("stride_size"),
        proj_fn=m.get("proj_fn", "SW"),
        hidden_dropout=float(m.get("hidden_dropout_prob", 0.1)),
        attention_dropout=float(m.get("attention_probs_dropout_prob", 0.1)),
        qkv_bias=bool(m.get("qkv_bias", True)),
        num_labels=num_labels,
        pos_encoding_type=m.get("pos_encoding_type"),
        max_position_embeddings=int(m.get("max_position_embeddings", 512)),
        rope_base=float(m.get("rope_base", 10000.0)),
        input_kind=m.get("input_kind", "spectra"),
        attn_impl=m.get("attn_impl", "auto"),
        ring_block_k=(
            int(m["ring_block_k"]) if m.get("ring_block_k") else None
        ),
        precision=str(t.get("precision", "float32")),
        remat=_parse_remat(m.get("remat", False)),
        fast_dropout=bool(m.get("fast_dropout", True)),
        gelu_approximate=bool(m.get("gelu_approximate", False)),
        softmax_dtype=m.get("softmax_dtype") or None,
        fused_mlp=bool(m.get("fused_mlp", False)),
        fused_qkv=bool(m.get("fused_qkv", False)),
        moe_experts=int(m.get("moe_experts", 0) or 0),
        moe_top_k=int(m.get("moe_top_k", 1) or 1),
        moe_capacity_factor=float(m.get("moe_capacity_factor", 1.25) or 1.25),
        moe_aux_weight=float(m.get("moe_aux_weight", 0.01) or 0.0),
        moe_z_weight=float(m.get("moe_z_weight", 0.0) or 0.0),
        moe_router_jitter=float(m.get("moe_router_jitter", 0.0) or 0.0),
    )


def _parse_remat(value) -> Union[bool, str]:
    """``model.remat``: false | true (whole layers) | "mlp" (MLP sublayer)."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v == "mlp":
            return "mlp"
        if v in ("true", "1", "yes"):
            return True
        if v in ("false", "0", "no", ""):
            return False
        raise ValueError(
            f"model.remat must be true/false or 'mlp', got {value!r}"
        )
    return bool(value)


def _get_freeze_suffix(freeze_epochs: int) -> str:
    return "perm" if freeze_epochs == -1 else str(freeze_epochs)


def _build_preprocessor(
    preproc_type: str, warmup_cfg: dict, stats: dict, input_dim: int
):
    """Build (module, output_dim, name_prefix, desc) from covariance stats."""
    eigvecs = stats["eigvecs"]
    mean = stats.get("mean")
    r = warmup_cfg.get("r")
    fz = _get_freeze_suffix(int(warmup_cfg.get("freeze_epochs", 0) or 0))

    if preproc_type == "zca":
        eps = warmup_cfg.get("eps", 1e-5)
        shrinkage = warmup_cfg.get("shrinkage", 0.0)
        use_bias = warmup_cfg.get("bias", True)
        P = compute_zca_matrix(eigvecs, stats["eigvals"], eps=eps, r=r, shrinkage=shrinkage)
        bias = (-(mean @ P.T)).astype("float32") if (use_bias and mean is not None) else None
        module = LinearPreprocessor(matrix=P, bias=bias, name="preprocessor")
        rank_str = f"ZCA{r}" if r is not None else "ZCA"
        shrink_str = f"_s{int(shrinkage * 10)}" if shrinkage > 0 else ""
        bias_str = "" if use_bias else "_nobias"
        return (
            module,
            P.shape[0],
            f"{rank_str}_fz{fz}{shrink_str}{bias_str}",
            f"{'low-rank' if r else 'full-rank'} ZCA, eps={eps}, shrinkage={shrinkage}, bias={use_bias}",
        )
    if preproc_type == "pca":
        use_bias = warmup_cfg.get("bias", True)
        P = compute_pca_matrix(eigvecs, r=r)
        bias = (-(mean @ P.T)).astype("float32") if (use_bias and mean is not None) else None
        module = LinearPreprocessor(matrix=P, bias=bias, name="preprocessor")
        rank_str = f"PCA{r}" if r is not None else "PCA"
        bias_str = "" if use_bias else "_nobias"
        return (
            module,
            P.shape[0],
            f"{rank_str}_fz{fz}{bias_str}",
            f"PCA with r={r}, bias={use_bias}" if r else f"full-rank PCA, bias={use_bias}",
        )
    if preproc_type == "attention":
        eps = warmup_cfg.get("eps", 1e-5)
        scale_by_eigvals = warmup_cfg.get("scale_by_eigvals", True)
        module = PrefilledAttention(
            input_dim=input_dim,
            eigvecs=eigvecs,
            eigvals=stats.get("eigvals"),
            r=r,
            scale_by_eigvals=scale_by_eigvals,
            eps=eps,
            name="preprocessor",
        )
        # PrefilledAttention's 2-D output dim is the number of eigvec
        # COLUMNS when no explicit r is given (stats may store truncated
        # top-k eigvecs); reporting input_dim for a (D, k) basis skipped
        # the image_size auto-adjust and crashed deep in the tokenizer.
        n_comp = int(eigvecs.shape[1])
        if r is not None and int(r) > n_comp:
            raise ValueError(
                f"warmup.r={r} exceeds the {n_comp} eigenvector columns in "
                f"the covariance stats"
            )
        out_dim = int(r) if r is not None else n_comp
        rank_str = r if r else "Full"
        scale_suffix = "_scaled" if (scale_by_eigvals and stats.get("eigvals") is not None) else ""
        return (
            module,
            out_dim,
            f"Attn{rank_str}{scale_suffix}_fz{fz}",
            f"Attention preprocessor with r={r}, scale_by_eigvals={scale_by_eigvals}",
        )
    raise ValueError(f"Unknown preprocessor type: '{preproc_type}'")


def _get_image_pca_model(
    config: dict, warmup_cfg: dict, loss_name: str, preproc_type
) -> ModelBundle:
    """Image ViT with patch-level PCA projection in front of the embed.

    Config surface: ``warmup.preprocessor: pca`` + ``warmup.cov_path``
    pointing at a patch-PCA artifact (``prepca.compute_pca`` /
    ``compute_patch_pca_images`` schema), optional ``warmup.r`` rank cap and
    the usual ``freeze_epochs``.
    """
    from vit_tpu.models.preprocessor import PatchPCAProjector
    from vit_tpu.models.vit import SpecViT
    from vit_tpu.utils import load_patch_pca_stats

    kind = str(preproc_type).lower()
    if kind not in ("pca", "patch_pca"):
        raise ValueError(
            f"Image models support preprocessor 'pca' (patch-level); got '{preproc_type}'"
        )
    path = warmup_cfg.get("pca_path") or warmup_cfg.get("cov_path")
    if path is None:
        raise ValueError("image patch-PCA requires 'cov_path' (or 'pca_path') in warmup config")
    stats = load_patch_pca_stats(path)
    vit_config = get_vit_config(config)

    patch_dim = vit_config.patch_size**2 * vit_config.num_channels
    basis = stats["components"]
    if basis.shape[0] != patch_dim:
        raise ValueError(
            f"Mismatch: PCA basis dimension {basis.shape[0]} != patch dim "
            f"{patch_dim} ({vit_config.patch_size}x{vit_config.patch_size}"
            f"x{vit_config.num_channels})"
        )
    r = warmup_cfg.get("r")
    r = int(r) if r is not None else int(basis.shape[1])
    if r > basis.shape[1]:
        # basis[:, :r] would silently clamp while the model NAME claims r —
        # corrupting sweep/checkpoint bookkeeping keyed on the name.
        raise ValueError(
            f"warmup.r={r} exceeds the {basis.shape[1]} components in the "
            f"patch-PCA artifact"
        )
    freeze_epochs = int(warmup_cfg.get("freeze_epochs", 0) or 0)
    fz = _get_freeze_suffix(freeze_epochs)

    preprocessor = PatchPCAProjector(
        patch_size=vit_config.patch_size,
        num_channels=vit_config.num_channels,
        basis=basis[:, :r],
        mean=stats.get("mean"),
        name="preprocessor",
    )
    module = SpecViT(cfg=vit_config, preprocessor=preprocessor)
    name = build_model_name(vit_config, f"PCAp{r}_fz{fz}_ViT", full_config=config)
    desc = f"patch-level PCA, r={r}/{basis.shape[1]}, patch_dim={patch_dim}"
    print(f"[builder] Created {desc} preprocessor -> {name}")
    return ModelBundle(
        module,
        vit_config,
        name,
        loss_name,
        freeze_epochs=freeze_epochs,
        has_preprocessor=True,
        preprocessor_desc=desc,
    )


def get_model(config: dict) -> ModelBundle:
    """Build the model (and optional preprocessor) from the full config dict.

    Mutates ``config['model']['image_size']`` when a preprocessor changes the
    input dimension (reference `builder.py:176-179` contract: downstream
    consumers see the adjusted size).
    """
    from vit_tpu.models.vit import SpecViT  # local import avoids a cycle

    warmup_cfg = config.get("warmup", {}) or {}
    loss_name = (config.get("loss", {}) or {}).get("name") or ""
    task = normalize_task(config)
    if task == "cls":
        loss_name = "ce"
    elif not loss_name:
        loss_name = "l2"
    preproc_type = warmup_cfg.get("preprocessor")

    if preproc_type is None or str(preproc_type).lower() in ("none", "null"):
        vit_config = get_vit_config(config)
        module = SpecViT(cfg=vit_config)
        name = build_model_name(vit_config, "ViT", full_config=config)
        return ModelBundle(module, vit_config, name, loss_name)

    # Image family: patch-level PCA projection (BASELINE config 2 — the
    # reference computed patch PCA, `prepca/pipeline.py:116-159`, but never
    # wired it into a 2-D model; here it prefills PatchPCAProjector).
    input_kind = str((config.get("model", {}) or {}).get("input_kind", "")).lower()
    preset = IMAGE_VIT_PRESETS.get(
        str((config.get("model", {}) or {}).get("name", "")).lower()
    )
    if input_kind == "image" or preset is not None:
        return _get_image_pca_model(config, warmup_cfg, loss_name, preproc_type)

    cov_path = warmup_cfg.get("cov_path")
    if cov_path is None:
        raise ValueError(f"preprocessor='{preproc_type}' requires 'cov_path' in warmup config")
    stats = load_cov_stats(cov_path)
    input_dim = int(stats["eigvecs"].shape[0])
    original_image_size = int(config["model"]["image_size"])
    if input_dim != original_image_size:
        raise ValueError(
            f"Mismatch: eigvecs dimension {input_dim} != image_size {original_image_size}"
        )

    freeze_epochs = int(warmup_cfg.get("freeze_epochs", 0) or 0)
    preprocessor, output_dim, name_prefix, desc = _build_preprocessor(
        str(preproc_type).lower(), warmup_cfg, stats, input_dim
    )
    if output_dim != original_image_size:
        print(f"[builder] Auto-adjusting image_size: {original_image_size} -> {output_dim}")
        config["model"]["image_size"] = int(output_dim)

    vit_config = get_vit_config(config)
    module = SpecViT(cfg=vit_config, preprocessor=preprocessor)
    name = build_model_name(vit_config, f"{name_prefix}_ViT", full_config=config)
    print(f"[builder] Created {desc} preprocessor -> {name}")
    return ModelBundle(
        module,
        vit_config,
        name,
        loss_name,
        freeze_epochs=freeze_epochs,
        has_preprocessor=True,
        preprocessor_desc=desc,
    )
