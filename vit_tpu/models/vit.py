"""The ViT model family: spectra (1-D) and image (2-D) transformers.

Capability parity with the reference's ``MyViT`` + ``SpectraEmbeddings``
(`/root/reference/src/models/specvit.py:17-115`,
`/root/reference/src/models/embedding.py:15-105`), re-designed as pure Flax:

* ``SpectraEmbeddings`` — SW/C1D tokenizer + learned CLS token + position
  encoding mode ``none`` (default) / ``learned`` / ``rope`` (applied inside
  attention, not here) + dropout.
* ``ImageEmbeddings``  — standard ViT 2-D patchify (this rebuild's image
  family: ViT-S/16, B/16, L/16 presets in the builder).
* ``ViTLayer``         — pre-LN transformer block matching HF ViT ordering
  (layernorm_before -> attention -> residual; layernorm_after -> 4x MLP ->
  residual), GELU (exact), dropout 0.1, LN eps 1e-12.
* ``SpecViT``          — optional linear preprocessor -> embeddings ->
  encoder -> final LayerNorm -> CLS token -> task head.

Loss semantics (`specvit.py:46-55`): cls -> cross-entropy; reg -> L1 iff the
loss name contains ``"l1"``, else MSE. NOTE the reference quirk is kept
deliberately: ``loss.name: 'mae'`` does NOT contain ``"l1"`` and therefore
trains with MSE (MAE is still the *monitored metric*). Use ``'l1'`` to train
with an L1 objective.

Diagnostics (replaces torch forward hooks, which have no jit analogue):
``capture=True`` sows per-layer attention probabilities, per-layer CLS
hidden states, and MLP activations into the ``intermediates`` collection.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax import linen as nn

from vit_tpu.models.attention import MultiHeadSelfAttention
from vit_tpu.models.tokenization import (
    KERNEL_INIT,
    Conv1DPatchTokenizer,
    LinearPatchTokenizer,
    Patch2DTokenizer,
    SlidingWindowTokenizer,
)

__all__ = [
    "SpectraEmbeddings",
    "ImageEmbeddings",
    "ViTLayer",
    "ViTEncoder",
    "SpecViT",
    "compute_loss",
    "make_dropout",
]

LN_EPS = 1e-12  # HF ViTConfig layer_norm_eps


class _DenseParams(nn.Module):
    """Declares a Dense layer's params (same names/shapes/init as
    ``nn.Dense``) without running the matmul — the fused-MLP path consumes
    them directly, keeping the checkpoint layout identical to the unfused
    path (and to the torch bridge's expectations)."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", KERNEL_INIT, (self.features_in, self.features_out)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


def make_dropout(cfg: Any, rate: float, name: str) -> nn.Module:
    """Dropout module per the config: counter-based hash masks (fast, the
    default) or ``nn.Dropout`` (``model.fast_dropout: false``). Both are
    parameter-free and draw from the ``dropout`` RNG collection."""
    # fallback True = VitConfig's default (and ViTLayer's attention
    # fallback) so a duck-typed cfg can't silently mix implementations
    if getattr(cfg, "fast_dropout", True):
        from vit_tpu.ops.dropout import HashDropout

        return HashDropout(rate=rate, name=name)
    return nn.Dropout(rate=rate, name=name)


class SpectraEmbeddings(nn.Module):
    """Patch + CLS + positional embeddings for 1-D spectra."""

    cfg: Any  # VitConfig

    def tokenizer(self) -> nn.Module:
        cfg = self.cfg
        common = dict(
            input_length=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_size=cfg.hidden_size,
            stride=cfg.stride,
            dtype=cfg.dtype,
        )
        if cfg.proj_fn == "SW":
            return SlidingWindowTokenizer(**common, name="patch_embeddings")
        if cfg.proj_fn in ("C1D", "CNN"):
            return Conv1DPatchTokenizer(**common, name="patch_embeddings")
        if cfg.proj_fn in ("LIN", "linear"):
            common.pop("stride")
            common["embed_dim"] = common.pop("hidden_size")
            return LinearPatchTokenizer(**common, name="patch_embeddings")
        raise ValueError(f"Unsupported proj_fn '{cfg.proj_fn}'")

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        tokens = self.tokenizer()(x)  # (B, T, H)
        batch = tokens.shape[0]
        # Reference uses torch.randn (std 1.0) for CLS and learned pos tables.
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, cfg.hidden_size)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (batch, 1, cfg.hidden_size)).astype(tokens.dtype), tokens],
            axis=1,
        )
        if cfg.pos_encoding_type == "learned":
            pos = self.param(
                "position_embeddings",
                nn.initializers.normal(stddev=1.0),
                (1, tokens.shape[1], cfg.hidden_size),
            )
            tokens = tokens + pos.astype(tokens.dtype)
        # 'rope' is applied inside attention; 'none'/None adds nothing.
        return make_dropout(cfg, cfg.hidden_dropout, "dropout")(
            tokens, deterministic=deterministic
        )


class ImageEmbeddings(nn.Module):
    """Standard ViT 2-D patch + CLS + learned positional embeddings."""

    cfg: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        if x.ndim == 3:
            # Pre-tokenized patch features (B, N, F) — e.g. the patch-PCA
            # preprocessor's output; embed each patch's coefficients linearly.
            tokens = nn.Dense(
                cfg.hidden_size,
                dtype=cfg.dtype,
                kernel_init=KERNEL_INIT,
                name="patch_embeddings",
            )(x.astype(cfg.dtype))
        else:
            tokens = Patch2DTokenizer(
                image_size=cfg.image_size,
                patch_size=cfg.patch_size,
                hidden_size=cfg.hidden_size,
                num_channels=cfg.num_channels,
                dtype=cfg.dtype,
                name="patch_embeddings",
            )(x)
        batch = tokens.shape[0]
        # Standard-ViT init (HF _init_weights: initializer_range 0.02) —
        # the spectra family's std-1.0 cls is a reference quirk that does
        # NOT apply here (a N(0,1) token next to 0.02-scale embeddings
        # starts ~50x out of scale).
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, cfg.hidden_size)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (batch, 1, cfg.hidden_size)).astype(tokens.dtype), tokens],
            axis=1,
        )
        if cfg.pos_encoding_type != "rope":
            # Image ViTs default to learned absolute positions (standard ViT).
            pos = self.param(
                "position_embeddings",
                nn.initializers.normal(stddev=0.02),
                (1, tokens.shape[1], cfg.hidden_size),
            )
            tokens = tokens + pos.astype(tokens.dtype)
        return make_dropout(cfg, cfg.hidden_dropout, "dropout")(
            tokens, deterministic=deterministic
        )


class ViTLayer(nn.Module):
    """Pre-LN transformer encoder block (HF ViT ordering).

    ``cfg.remat == "mlp"`` remats ONLY the MLP sublayer: the attention
    residuals stay saved, so the backward pass does not re-run the flash
    forward kernel, while the big (B, T, 4*hidden) MLP intermediates stay
    unsaved. With O(T)-memory flash attention the saved residuals are only
    O(B*T*hidden) tensors. Measured on the stride-1 flagship shape
    (T=4066, bf16): 49.1 ms/step vs 58.4 with ``remat: true`` and 47.1
    with no remat — BASELINE.md "Remat granularity".
    """

    cfg: Any

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        capture: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype, name="layernorm_before")(x)
        attn = MultiHeadSelfAttention(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_attention_heads,
            dropout_rate=cfg.attention_dropout,
            # HF ViTSelfOutput drops the projected output at the HIDDEN rate
            out_dropout_rate=cfg.hidden_dropout,
            use_rope=cfg.pos_encoding_type == "rope",
            rope_base=cfg.rope_base,
            impl=cfg.attn_impl,
            dtype=cfg.dtype,
            qkv_bias=cfg.qkv_bias,
            fast_dropout=getattr(cfg, "fast_dropout", True),
            ring_block_k=getattr(cfg, "ring_block_k", None),
            softmax_dtype=getattr(cfg, "softmax_dtype", None),
            fused_qkv=getattr(cfg, "fused_qkv", False),
            name="attention",
        )
        x = x + attn(h, deterministic=deterministic, capture_probs=capture)

        mlp = type(self)._mlp
        if cfg.remat == "mlp":
            mlp = nn.remat(mlp, static_argnums=(2, 3))
        return mlp(self, x, deterministic, capture)

    def _mlp(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        capture: bool = False,
    ) -> jnp.ndarray:
        """LN → MLP (dense | fused | MoE) → dropout → residual. Split out
        so ``remat: mlp`` can checkpoint just this sublayer; submodule
        names are unchanged (same param tree as the inline version)."""
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype, name="layernorm_after")(x)
        if getattr(cfg, "moe_experts", 0) > 1:
            # Mixture-of-Experts MLP (rebuild-only family): E expert MLPs +
            # top-k router; the load-balance aux loss is sown into the
            # `losses` collection (collected by the training loss only).
            # No mlp_activation capture — the per-expert (E, B, C, F)
            # activations have no dense-path analogue.
            from vit_tpu.models.moe import MoEMLP

            h = MoEMLP(cfg, name="moe")(h, deterministic=deterministic)
        elif getattr(cfg, "fused_mlp", False) and not capture:
            # Fused dense->GELU->dense Pallas kernel: one HBM round trip
            # (BASELINE.md probe 7 — the unfused MLP is HBM-round-trip
            # bound). Params declared with nn.Dense-identical layout; the
            # capture path below reads the same params through nn.Dense.
            from vit_tpu.ops.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(
                cfg.hidden_size, cfg.intermediate_size, name="intermediate"
            )()
            w2, b2 = _DenseParams(
                cfg.intermediate_size, cfg.hidden_size, name="output"
            )()
            dt = cfg.dtype
            h = fused_mlp(
                h.astype(dt), w1.astype(dt), b1.astype(dt),
                w2.astype(dt), b2.astype(dt),
            )
        else:
            h = nn.Dense(
                cfg.intermediate_size, dtype=cfg.dtype, kernel_init=KERNEL_INIT, name="intermediate"
            )(h)
            h = nn.gelu(
                h, approximate=getattr(cfg, "gelu_approximate", False)
            )
            if capture:
                self.sow("intermediates", "mlp_activation", h)
            h = nn.Dense(
                cfg.hidden_size, dtype=cfg.dtype, kernel_init=KERNEL_INIT, name="output"
            )(h)
        h = make_dropout(cfg, cfg.hidden_dropout, "dropout")(
            h, deterministic=deterministic
        )
        return x + h


class ViTEncoder(nn.Module):
    """Stack of encoder layers; optional remat to trade FLOPs for HBM."""

    cfg: Any

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        capture: bool = False,
    ) -> jnp.ndarray:
        layer_cls = ViTLayer
        if self.cfg.remat is True:  # "mlp" remats inside the layer instead
            layer_cls = nn.remat(ViTLayer, static_argnums=(2, 3))
        for i in range(self.cfg.num_hidden_layers):
            x = layer_cls(self.cfg, name=f"layer_{i}")(x, deterministic, capture)
            if capture:
                self.sow("intermediates", f"cls_hidden_{i}", x[:, 0, :])
        return x


class SpecViT(nn.Module):
    """Flagship model: [preprocessor] -> embeddings -> encoder -> LN -> head.

    ``preprocessor`` is an optional Flax module built by the builder from
    covariance statistics (PCA/ZCA/attention); its parameters live under the
    ``preprocessor`` scope so the freeze schedule can partition them.
    """

    cfg: Any
    preprocessor: Optional[nn.Module] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        capture: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        if self.preprocessor is not None:
            x = self.preprocessor(x)
        emb_cls = ImageEmbeddings if cfg.input_kind == "image" else SpectraEmbeddings
        tokens = emb_cls(cfg, name="embeddings")(x, deterministic=deterministic)
        h = ViTEncoder(cfg, name="encoder")(
            tokens, deterministic=deterministic, capture=capture
        )
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=cfg.dtype, name="layernorm")(h)
        cls_token = h[:, 0, :]
        if capture:
            self.sow("intermediates", "cls_embedding", cls_token)
        head_name = "classifier" if cfg.task_type == "cls" else "regressor"
        logits = nn.Dense(
            cfg.num_labels, dtype=jnp.float32, kernel_init=KERNEL_INIT, name=head_name
        )(cls_token.astype(jnp.float32))
        return logits


def compute_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    task_type: str,
    loss_name: str = "",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Task loss with reference semantics (`specvit.py:46-55,78-87`).

    cls: cross-entropy over ``num_labels`` classes. reg: flattened L1 iff
    ``'l1' in loss_name`` else MSE. ``weights`` (per-example 0/1) supports
    masked eval batches.
    """
    if task_type == "cls":
        per_ex = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels.astype(jnp.int32)
        )
    else:
        diff = logits.astype(jnp.float32) - labels.astype(jnp.float32).reshape(logits.shape)
        per_elem = jnp.abs(diff) if "l1" in (loss_name or "l2").lower() else diff**2
        per_ex = per_elem.mean(axis=-1)
    if weights is None:
        return per_ex.mean()
    w = weights.astype(jnp.float32)
    return (per_ex * w).sum() / jnp.maximum(w.sum(), 1.0)
