"""Patch tokenizers: 1-D signals -> token sequences (plus 2-D image patches).

Semantic parity with `/root/reference/src/models/tokenization.py`:

* ``SlidingWindowTokenizer`` — unfold + Linear; ``num_patches =
  ceil((L-P)/S)+1`` with the short tail zero-padded (`tokenization.py:40-50`).
* ``Conv1DPatchTokenizer`` — Conv1D(kernel=P, stride=S, VALID);
  ``num_patches = (L-P)//S + 1`` (`tokenization.py:63-69`).
* ``LinearPatchTokenizer`` — non-overlapping reshape, requires ``L % P == 0``
  (`tokenization.py:72-95`).
* ``Patch2DTokenizer`` — standard ViT P×P Conv2D patchify for image inputs
  (this rebuild's image-ViT family; no 1-D reference analogue).

TPU notes: the sliding-window unfold lowers to
``lax.conv_general_dilated_patches`` (static shapes, XLA fuses the
projection matmul onto the MXU); all projections run in the module's
compute ``dtype`` (bf16 by default on TPU) with fp32 params.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

__all__ = [
    "sliding_window_num_patches",
    "conv1d_num_patches",
    "SlidingWindowTokenizer",
    "Conv1DPatchTokenizer",
    "LinearPatchTokenizer",
    "Patch2DTokenizer",
]

KERNEL_INIT = nn.initializers.normal(stddev=0.02)  # HF initializer_range=0.02


def sliding_window_num_patches(length: int, patch: int, stride: int) -> int:
    return math.ceil((length - patch) / stride) + 1


def conv1d_num_patches(length: int, patch: int, stride: int) -> int:
    return (length - patch) // stride + 1


def unfold_1d(x: jnp.ndarray, patch: int, stride: int, num_patches: int) -> jnp.ndarray:
    """``(B, L) -> (B, num_patches, patch)`` sliding windows, zero-padded tail.

    Implemented with ``conv_general_dilated_patches`` so XLA sees one fused
    gather instead of a Python loop of dynamic slices.
    """
    batch, length = x.shape
    padded_len = (num_patches - 1) * stride + patch
    pad_right = max(0, padded_len - length)
    patches = lax.conv_general_dilated_patches(
        x[:, None, :],  # (B, C=1, L)
        filter_shape=(patch,),
        window_strides=(stride,),
        padding=[(0, pad_right)],
    )  # (B, patch, num_patches)
    return jnp.transpose(patches, (0, 2, 1))


class SlidingWindowTokenizer(nn.Module):
    """Unfold + Linear projection of overlapping 1-D windows."""

    input_length: int
    patch_size: int
    hidden_size: int
    stride: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def stride_size(self) -> int:
        return self.stride if (self.stride and self.stride > 0) else int(self.patch_size)

    @property
    def num_patches(self) -> int:
        return sliding_window_num_patches(self.input_length, self.patch_size, self.stride_size)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 2 or x.shape[1] != self.input_length:
            raise ValueError(
                f"SlidingWindowTokenizer expects (batch, {self.input_length}), got {x.shape}"
            )
        patches = unfold_1d(x, self.patch_size, self.stride_size, self.num_patches)
        proj = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name="projection",
        )
        return proj(patches.astype(self.dtype))


class Conv1DPatchTokenizer(nn.Module):
    """Learnable Conv1D patch extraction (kernel=P, stride=S, VALID)."""

    input_length: int
    patch_size: int
    hidden_size: int
    stride: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def stride_size(self) -> int:
        return self.stride if (self.stride and self.stride > 0) else int(self.patch_size)

    @property
    def num_patches(self) -> int:
        return conv1d_num_patches(self.input_length, self.patch_size, self.stride_size)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 2 or x.shape[1] != self.input_length:
            raise ValueError(
                f"Conv1DPatchTokenizer expects (batch, {self.input_length}), got {x.shape}"
            )
        conv = nn.Conv(
            features=self.hidden_size,
            kernel_size=(self.patch_size,),
            strides=(self.stride_size,),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name="projection",
        )
        return conv(x[..., None].astype(self.dtype))  # (B, L, 1) -> (B, T, H)


class LinearPatchTokenizer(nn.Module):
    """Non-overlapping reshape tokenizer; requires ``L % P == 0``."""

    input_length: int
    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return self.input_length // self.patch_size

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.input_length % self.patch_size != 0:
            raise ValueError(
                f"input_length={self.input_length} must be divisible by "
                f"patch_size={self.patch_size}"
            )
        if x.ndim != 2 or x.shape[1] != self.input_length:
            raise ValueError(
                f"LinearPatchTokenizer expects (batch, {self.input_length}), got {x.shape}"
            )
        patches = x.reshape(x.shape[0], self.num_patches, self.patch_size)
        proj = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=KERNEL_INIT, name="projection"
        )
        return proj(patches.astype(self.dtype))


class Patch2DTokenizer(nn.Module):
    """Standard ViT image patchify: Conv2D(P, P) stride P -> tokens."""

    image_size: int
    patch_size: int
    hidden_size: int
    num_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Accepts NHWC (B, H, W, C); NCHW inputs are transposed for torch parity.
        if x.ndim != 4:
            raise ValueError(f"Patch2DTokenizer expects 4-D input, got {x.shape}")
        if x.shape[1] == self.num_channels and x.shape[-1] != self.num_channels:
            x = jnp.transpose(x, (0, 2, 3, 1))
        conv = nn.Conv(
            features=self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name="projection",
        )
        h = conv(x.astype(self.dtype))  # (B, H/P, W/P, hidden)
        return h.reshape(h.shape[0], -1, h.shape[-1])
