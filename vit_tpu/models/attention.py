"""Multi-head self-attention with optional RoPE and pluggable TPU kernels.

Covers the reference's HF ``ViTSelfAttention`` + ``ViTSelfAttentionWithRoPE``
(`/root/reference/src/models/vit_with_rope.py:16-84`) as a single Flax
module. Where the reference monkey-patches attention to always return
probabilities for visualization (`viz_callback.py:114-136`), here attention
probabilities are a first-class optional output: pass
``capture_probs=True`` and read them from the ``intermediates`` collection
(``nn.sow``) — no hooks, jit-safe.

Kernel dispatch (``impl``):

* ``"xla"``   — einsum attention; XLA fuses softmax into the matmuls. Best
  for short sequences (the 129-token baseline).
* ``"flash"`` — fused Pallas flash-attention kernel
  (:mod:`vit_tpu.ops.flash_attention`), O(T) memory; for long sequences
  (stride-1 sweeps reach ~4k tokens).
* ``"auto"``  — flash when the shape is worth it, else xla (backend-
  independent; off-TPU the flash op falls back to identical XLA math).
  Attention-probability dropout (reference `vit_with_rope.py:79-81`) is
  applied IN-KERNEL on the flash path via a counter-based hash mask — O(T)
  memory even when training long sequences with dropout. The mask stream
  differs from the xla path's ``nn.Dropout`` (semantic parity, as with all
  RNG streams in this rebuild).
* ``"ring"``  — sequence-parallel exact attention
  (:mod:`vit_tpu.ops.ring_attention`): the sequence is sharded over the
  mesh ``model`` axis (``train.sequence_parallel``) and K/V shards rotate
  around the ring via ``ppermute``. Requires the active mesh (set by
  ``Experiment``) and ``seq_len % sp == 0``; dropout is applied in-ring
  with globally-consistent hash masks; ``capture_probs`` epochs fall back
  to the xla math.

Softmax always accumulates in fp32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.models.rope import apply_rope, rope_tables
from vit_tpu.models.tokenization import KERNEL_INIT

__all__ = ["MultiHeadSelfAttention", "select_attn_impl"]


def select_attn_impl(impl: str, seq_len: int, head_dim: int) -> str:
    """Resolve ``auto`` to a concrete kernel for this shape.

    The resolution is backend-independent so a config traces the same graph
    on the CPU test mesh and on TPU (``flash_attention`` itself falls back
    to identical XLA math off-TPU). Attention-probability dropout never
    changes the kernel choice: it is applied IN-KERNEL on the flash path
    (counter-based mask, O(T) memory — reference semantics
    `/root/reference/src/models/vit_with_rope.py:79-81`).
    """
    if impl == "auto":
        # Crossover from the measured fwd+bwd coverage matrix (BASELINE.md
        # "Flash-kernel coverage matrix", v5e round 4): flash wins every
        # {f32, bf16} x {d=64, d=128} x {+-dropout} cell from T=1024 up
        # (1.19-1.32x at 1024, 1.37-1.78x at 2048, 1.57-2.36x at 4096 —
        # and 1.59-2.70x once the measured-best default blocks landed, see
        # BASELINE.md "flash block-size sweep") and
        # is parity-to-slower at T=197 (0.81-1.06x; the B/16 image shape
        # stays on XLA's fused attention). d < 64 is never profitable: the
        # 128-lane contraction pad alone wastes >=half the MXU, so tiny
        # baseline shapes (d=16) always take the XLA path.
        impl = "flash" if (seq_len >= 1024 and head_dim >= 64) else "xla"
    return impl


class _DenseDecl(nn.Module):
    """Declares an ``nn.Dense``-identical parameter set (names, shapes,
    init, RNG fold — the scope path is what seeds the init stream) without
    running the matmul; the fused-QKV path consumes the three sets through
    ONE concatenated projection while the checkpoint layout stays the
    plain-Dense one."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", KERNEL_INIT, (self.features_in, self.features_out)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features_out,))
            if self.use_bias
            else None
        )
        return kernel, bias


class MultiHeadSelfAttention(nn.Module):
    """Self-attention block = QKV projection + kernel + output projection.

    Submodule names (``query``/``key``/``value``/``out``) are chosen for a
    mechanical rename to the HF ViT checkpoint layout
    (``attention.attention.{query,key,value}``, ``attention.output.dense``).
    """

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1  # attention-probs dropout (attn branch)
    out_dropout_rate: Optional[float] = None  # post-projection; HF ViTSelfOutput
    # uses hidden_dropout_prob here, NOT the probs rate; None = dropout_rate
    use_rope: bool = False
    rope_base: float = 10000.0
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    qkv_bias: bool = True
    fast_dropout: bool = True  # counter-based masks (vit_tpu.ops.dropout)
    ring_block_k: Optional[int] = None  # inner key-block width (ring impl)
    # Score-accumulation/softmax dtype for the xla path; None = float32
    # (reference semantics). bfloat16 halves the HBM bytes of the (B,H,T,T)
    # score tensor — the measured B/16 attention sink (BASELINE.md) — with
    # ~1e-2 relative probs error (softmax still subtracts the row max, so
    # it stays numerically stable). Ignored by flash/ring, which never
    # materialize the score tensor and always accumulate fp32.
    softmax_dtype: Optional[str] = None
    # One (D, 3D) projection instead of three (D, D) matmuls: same math and
    # the SAME parameter/checkpoint layout (q/k/v kernels stay separate
    # leaves, concatenated inside the step). Measured neutral at hidden 32
    # (BASELINE.md probe 2/3); re-probed at B/16 scale round 4.
    fused_qkv: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        capture_probs: bool = False,
    ) -> jnp.ndarray:
        batch, seq_len, _ = x.shape
        if self.hidden_size % self.num_heads != 0:
            raise ValueError(
                f"hidden_size {self.hidden_size} not divisible by "
                f"num_heads {self.num_heads}"
            )
        head_dim = self.hidden_size // self.num_heads

        dense = lambda name: nn.Dense(  # noqa: E731
            self.hidden_size,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name=name,
        )
        # (B, T, D) -> (B, H, T, d)
        def split_heads(t):
            return t.reshape(batch, seq_len, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        if self.fused_qkv:
            decls = [
                _DenseDecl(x.shape[-1], self.hidden_size, self.qkv_bias, name=n)()
                for n in ("query", "key", "value")
            ]
            w = jnp.concatenate([d[0] for d in decls], axis=1).astype(self.dtype)
            qkv = x.astype(self.dtype) @ w
            if self.qkv_bias:
                qkv = qkv + jnp.concatenate(
                    [d[1] for d in decls]
                ).astype(self.dtype)
            q, k, v = (split_heads(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = split_heads(dense("query")(x))
            k = split_heads(dense("key")(x))
            v = split_heads(dense("value")(x))

        if self.use_rope:
            cos, sin = rope_tables(seq_len, head_dim, base=self.rope_base, dtype=q.dtype)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        dropout_active = self.dropout_rate > 0 and not deterministic
        impl = select_attn_impl(self.impl, seq_len, head_dim)
        if impl == "ring" and capture_probs:
            # Probability capture needs the materialized (global) probs —
            # fall back to the xla math for diagnostics epochs, exactly as
            # the flash path does below.
            impl = "xla"
        if impl == "ring":
            from vit_tpu.ops.ring_attention import ring_attention
            from vit_tpu.parallel.mesh import active_mesh

            mesh = active_mesh()
            if mesh is None:
                raise RuntimeError(
                    "attn_impl='ring' needs the training mesh: Experiment "
                    "sets it automatically; library users call "
                    "vit_tpu.parallel.mesh.set_active_mesh(mesh) first"
                )
            sp = mesh.shape.get("model", 1)
            if seq_len % max(sp, 1) != 0:
                raise ValueError(
                    f"attn_impl='ring': sequence length {seq_len} (incl. "
                    f"CLS) must divide by the 'model' mesh axis ({sp}); "
                    "choose image/patch/stride so num_patches+1 is a "
                    "multiple of train.sequence_parallel"
                )
            seed = None
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            # DP-shard the batch only when it divides the data axis — a
            # module.init trace (batch 1) or an odd eval tail replicates
            # instead (shapes identical, only the layout differs).
            n_data = mesh.shape.get("data", 1)
            context = ring_attention(
                q, k, v, mesh=mesh, axis="model",
                batch_axis="data" if n_data > 1 and batch % n_data == 0 else None,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_seed=seed,
                block_k=self.ring_block_k,
            )
        elif impl == "flash" and not capture_probs:
            from vit_tpu.ops.flash_attention import flash_attention

            if dropout_active:
                # Probs dropout applied IN-KERNEL (counter-based mask, O(T)
                # memory): long-sequence training keeps reference dropout
                # semantics without materializing (B, H, T, T) probabilities.
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
                context = flash_attention(
                    q, k, v, dropout_rate=self.dropout_rate, dropout_seed=seed
                )
            else:
                context = flash_attention(q, k, v)
        elif impl in ("xla", "flash"):
            scale = head_dim**-0.5
            acc_dtype = (
                jnp.float32 if self.softmax_dtype is None
                else jnp.dtype(self.softmax_dtype)
            )
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_dtype
            )
            probs = jax.nn.softmax(scores * jnp.asarray(scale, acc_dtype), axis=-1)
            if capture_probs:
                # Batch-mean on device (H, T, T): the reference's attention
                # hooks also store batch-mean weights (`viz_callback.py:220`),
                # and transferring full (B, H, T, T) tensors to host breaks
                # memory discipline at stride-1 (~4k tokens).
                # Sown captures stay fp32 even under the opt-in bf16
                # softmax knob (viz consumers expect float arrays).
                self.sow(
                    "intermediates",
                    "attention_probs",
                    probs.mean(axis=0).astype(jnp.float32),
                )
            probs = probs.astype(self.dtype)
            probs = self._dropout("attn_dropout")(
                probs, deterministic=deterministic
            )
            context = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        else:
            raise ValueError(f"Unknown attention impl '{impl}'")

        context = context.transpose(0, 2, 1, 3).reshape(batch, seq_len, self.hidden_size)
        out = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=KERNEL_INIT, name="out"
        )(context)
        out_rate = (
            self.out_dropout_rate
            if self.out_dropout_rate is not None
            else self.dropout_rate
        )
        out = self._dropout("out_dropout", rate=out_rate)(
            out, deterministic=deterministic
        )
        return out

    def _dropout(self, name: str, rate: Optional[float] = None) -> nn.Module:
        rate = self.dropout_rate if rate is None else rate
        if self.fast_dropout:
            from vit_tpu.ops.dropout import HashDropout

            return HashDropout(rate=rate, name=name)
        return nn.Dropout(rate=rate, name=name)
