"""KPCA-warm multi-head self-attention (research module).

Parity with `/root/reference/src/prepca/attention.py:9-83`
(``KPCAWarmSelfAttention``): Q/K come from *frozen* Nyström-KPCA features
of the input (``Z = KPCA.transform(x)``) via small trainable adapters
initialized near identity; V and output projections are standard. Exported
as library code (the reference exports it but never wires it into MyViT —
same status here; freezing the adapters maps to optax masking instead of
``requires_grad``).

TPU note: the KPCA transform is a kernel evaluation against the stored
landmarks plus a matmul — all expressed in jnp so the whole module jits;
the landmark bank is folded into the params as non-trainable constants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_tpu.prepca.pipeline import KernelPCAState

__all__ = ["KPCAWarmSelfAttention"]


def _kpca_transform_jnp(state: KernelPCAState, x: jnp.ndarray) -> jnp.ndarray:
    """jnp re-expression of ``KernelPCAState.transform`` (rbf/linear/poly)."""
    landmarks = jnp.asarray(state.landmarks)
    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    if state.kernel_name == "linear":
        k = xf @ landmarks.T
    elif state.kernel_name == "poly":
        gamma = state.gamma if state.gamma is not None else 1.0 / xf.shape[1]
        k = (gamma * (xf @ landmarks.T) + state.coef0) ** state.degree
    else:  # rbf
        # Reference .pt states can carry gamma=None; resolve the median
        # heuristic from the landmarks ONCE (host-side, deterministic)
        # instead of silently using gamma=1.0 — which computed features
        # unrelated to the fitted KPCA. `or` would also clobber an
        # explicit 0.0.
        gamma = state.resolve_gamma()
        x2 = (xf * xf).sum(axis=1, keepdims=True)
        l2 = (landmarks * landmarks).sum(axis=1)[None, :]
        d2 = jnp.clip(x2 + l2 - 2.0 * (xf @ landmarks.T), 0.0, None)
        k = jnp.exp(-(1.0 if gamma is None else gamma) * d2)
    mean_b = k.mean(axis=1, keepdims=True)
    kc = k - mean_b - jnp.asarray(state.row_means)[None, :] + state.K_mean
    z = kc @ jnp.asarray(state.A)
    return z.reshape(*shape[:-1], state.A.shape[1])


def _near_identity_init(num_heads: int, d_k: int, in_dim: int) -> np.ndarray:
    """Strided near-identity adapter init (reference `attention.py:36-46`);
    returned in flax kernel layout (in_dim, num_heads * d_k)."""
    W = np.zeros((num_heads, d_k, in_dim), dtype=np.float32)
    step = max(1, in_dim // d_k)
    for h in range(num_heads):
        for i in range(d_k):
            W[h, i, min(i * step, in_dim - 1)] = 1.0
    return W.reshape(num_heads * d_k, in_dim).T.copy()


class KPCAWarmSelfAttention(nn.Module):
    """MHSA with Q/K from frozen KPCA features through trainable adapters."""

    dim: int
    num_heads: int
    kpca_state: KernelPCAState
    qk_dim: Optional[int] = None
    use_bias: bool = False

    @property
    def d_k(self) -> int:
        if self.qk_dim is not None:
            return self.qk_dim
        r = self.kpca_state.r
        return max(1, (r + self.num_heads - 1) // self.num_heads)

    @nn.compact
    def __call__(self, x: jnp.ndarray, need_weights: bool = False):
        batch, length, _ = x.shape
        H, d_k = self.num_heads, self.d_k
        r = self.kpca_state.r

        z = _kpca_transform_jnp(self.kpca_state, x)  # (B, L, r), frozen features

        ident = _near_identity_init(H, d_k, r)
        q_adapter = nn.Dense(
            H * d_k, use_bias=self.use_bias,
            kernel_init=lambda *a: jnp.asarray(ident), name="q_adapter",
        )
        k_adapter = nn.Dense(
            H * d_k, use_bias=self.use_bias,
            kernel_init=lambda *a: jnp.asarray(ident), name="k_adapter",
        )
        v_proj = nn.Dense(H * d_k, use_bias=self.use_bias, name="v_proj")
        out_proj = nn.Dense(self.dim, use_bias=self.use_bias, name="out_proj")

        def split(t):
            return t.reshape(batch, length, H, d_k).transpose(0, 2, 1, 3)

        q, k, v = split(q_adapter(z)), split(k_adapter(z)), split(v_proj(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / (d_k**0.5), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out_proj(ctx.transpose(0, 2, 1, 3).reshape(batch, length, H * d_k))
        if need_weights:
            return out, probs
        return out
