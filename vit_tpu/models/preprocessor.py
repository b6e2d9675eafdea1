"""Linear input preprocessors built from covariance statistics.

Math parity with `/root/reference/src/models/preprocessor.py` and
`/root/reference/src/models/attention.py`:

* ``compute_zca_matrix`` — full-rank ``V diag(1/sqrt(lam_hat+eps)) V^T`` with
  eigenvalue shrinkage toward the mean; low-rank variant
  ``(Vr * invsqrt_r) Vr^T + s_perp (I - Vr Vr^T)`` with tail-median scaling
  and a relative floor of 1e-3 (`preprocessor.py:32-73`).
* ``compute_pca_matrix`` — ``V[:, :r]^T`` (`preprocessor.py:77-90`).
* ``LinearPreprocessor`` — ``y = x @ P^T + b`` with ``b = -mean @ P^T`` for
  centering; one on-device matmul that XLA fuses into the first layer.
* ``PrefilledAttention`` — Q/K prefilled with top-r eigenvectors (optionally
  ``1/sqrt(lam+eps)``-scaled); 2-D input applies just the Q projection
  (dimensionality reduction), 3-D input runs full softmax attention
  (`attention.py:41-96`).

Freeze semantics: the reference swaps weights between torch Parameters and
buffers (`layers.py:17-60`). Under JAX, parameters are immutable pytree
leaves — freezing is an *optimizer* concern, handled by optax partitioning
(:func:`vit_tpu.train.optim.freeze_mask`), so these modules only mark their
scope name (``preprocessor``).

Matrices are computed in numpy at model-build time (they are data-dependent
constants, `builder.py:176-179`); the matmul itself runs on device.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "compute_zca_matrix",
    "compute_pca_matrix",
    "LinearPreprocessor",
    "PatchPCAProjector",
    "PrefilledAttention",
]


def _shrink(eigvals: np.ndarray, shrinkage: float) -> np.ndarray:
    if shrinkage > 0.0:
        return (1.0 - shrinkage) * eigvals + shrinkage * eigvals.mean()
    return eigvals


def compute_zca_matrix(
    eigvecs: np.ndarray,
    eigvals: np.ndarray,
    eps: float = 1e-5,
    r: Optional[int] = None,
    shrinkage: float = 0.1,
) -> np.ndarray:
    """ZCA whitening matrix ``P`` (D, D); eigvecs/eigvals sorted descending."""
    eigvecs = np.asarray(eigvecs, dtype=np.float64)
    eigvals = np.asarray(eigvals, dtype=np.float64)
    lam = _shrink(eigvals, shrinkage)
    if r is None:
        inv_sqrt = 1.0 / np.sqrt(lam + eps)
        P = (eigvecs * inv_sqrt[None, :]) @ eigvecs.T
    else:
        Vr = eigvecs[:, :r]
        inv_sqrt_r = 1.0 / np.sqrt(lam[:r] + eps)
        tail = lam[r:]
        lam0 = np.median(tail) if tail.size > 0 else lam[r - 1]
        lam0 = max(lam0, 1e-3 * lam[:r].mean())  # relative floor
        s_perp = 1.0 / np.sqrt(lam0 + eps)
        proj = Vr @ Vr.T
        P = (Vr * inv_sqrt_r[None, :]) @ Vr.T + s_perp * (np.eye(eigvecs.shape[0]) - proj)
    return P.astype(np.float32)


def compute_pca_matrix(eigvecs: np.ndarray, r: Optional[int] = None) -> np.ndarray:
    """PCA projection ``P = V[:, :r]^T``; (r, D), or (D, D) when full-rank."""
    eigvecs = np.asarray(eigvecs, dtype=np.float32)
    if r is None:
        return eigvecs.T.copy()
    return eigvecs[:, :r].T.copy()


def _constant_init(value: np.ndarray):
    arr = np.asarray(value, dtype=np.float32)

    def init(key, shape, dtype=jnp.float32):
        if tuple(shape) != arr.shape:
            raise ValueError(f"Prefilled init shape {arr.shape} != requested {shape}")
        return jnp.asarray(arr, dtype=dtype)

    return init


class LinearPreprocessor(nn.Module):
    """``y = x @ P^T + b`` with the kernel prefilled from ``matrix`` (out, in).

    Output dimension = ``matrix.shape[0]`` (the builder auto-adjusts the
    model's ``image_size`` to it). Runs in fp32: whitening matrices are
    ill-conditioned and the single matmul is cheap.
    """

    matrix: np.ndarray  # (out_dim, in_dim), torch Linear weight layout
    bias: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_dim, in_dim = self.matrix.shape
        kernel = self.param("kernel", _constant_init(np.asarray(self.matrix).T), (in_dim, out_dim))
        y = jnp.dot(x.astype(jnp.float32), kernel, preferred_element_type=jnp.float32)
        if self.bias is not None:
            b = self.param("bias", _constant_init(self.bias), (out_dim,))
            y = y + b
        return y


class PatchPCAProjector(nn.Module):
    """Patch-level PCA projection for image inputs (the rebuild's wiring of
    the reference's patch PCA, `/root/reference/src/prepca/pipeline.py:116-159`,
    which existed there but was never connected to a 2-D model).

    ``(B, H, W, C) -> (B, N, r)``: extract non-overlapping ``P x P x C``
    patches, center with the precomputed patch mean, and project onto the
    top-``r`` PCA basis via a prefilled kernel (bias = ``-mean @ V_r``).
    The downstream embedding layer linearly maps the r PCA coefficients to
    ``hidden_size``. Parameters live under the ``preprocessor`` scope so the
    ``warmup.freeze_epochs`` schedule applies unchanged.
    """

    patch_size: int
    num_channels: int
    basis: np.ndarray  # (patch_dim, r) PCA components, columns = directions
    mean: Optional[np.ndarray] = None  # (patch_dim,)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(f"PatchPCAProjector expects (B, H, W, C), got {x.shape}")
        if x.shape[1] == self.num_channels and x.shape[-1] != self.num_channels:
            x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC (torch parity)
        b, hgt, wid, c = x.shape
        p = self.patch_size
        if hgt % p or wid % p or c != self.num_channels:
            raise ValueError(
                f"image {x.shape[1:]} not tileable by patch {p} x {p} x {self.num_channels}"
            )
        basis = np.asarray(self.basis, np.float32)  # (patch_dim, r)
        patch_dim = p * p * c
        if basis.shape[0] != patch_dim:
            raise ValueError(
                f"PCA basis rows {basis.shape[0]} != patch dim {patch_dim} "
                f"({p}x{p}x{c})"
            )
        # (B, H/P, P, W/P, P, C) -> (B, N, P*P*C); flat layout row-major over
        # (P, P, C) — matches compute_patch_pca_images' patch flattening.
        patches = x.reshape(b, hgt // p, p, wid // p, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, patch_dim)
        kernel = self.param("kernel", _constant_init(basis), basis.shape)
        y = jnp.dot(
            patches.astype(jnp.float32), kernel, preferred_element_type=jnp.float32
        )
        if self.mean is not None:
            bias = -(np.asarray(self.mean, np.float32) @ basis)
            y = y + self.param("bias", _constant_init(bias), bias.shape)
        return y


class PrefilledAttention(nn.Module):
    """Q/K prefilled with (scaled) eigenvectors; V Kaiming-initialized.

    2-D input ``(B, D)`` -> ``q_lin(x)`` (a learnable eigenbasis projection);
    3-D input ``(B, T, D)`` -> full softmax attention.
    """

    input_dim: int
    eigvecs: np.ndarray
    eigvals: Optional[np.ndarray] = None
    r: Optional[int] = None
    low_rank: Optional[bool] = None
    scale_by_eigvals: bool = True
    eps: float = 1e-5

    def _qk_basis(self) -> np.ndarray:
        r = self.rank
        V = np.asarray(self.eigvecs, dtype=np.float32)[:, :r].T  # (r, D)
        if self.scale_by_eigvals and self.eigvals is not None:
            scale = 1.0 / np.sqrt(np.asarray(self.eigvals, dtype=np.float32)[:r] + self.eps)
            V = V * scale[:, None]
        return V

    @property
    def rank(self) -> int:
        return self.r if self.r is not None else int(np.asarray(self.eigvecs).shape[1])

    @property
    def is_low_rank(self) -> bool:
        return self.low_rank if self.low_rank is not None else (self.rank < self.input_dim)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = self.rank
        V = self._qk_basis()  # (r, D)
        if self.is_low_rank:
            qk_out, qk_weight = r, V
        else:
            qk_weight = np.zeros((self.input_dim, self.input_dim), dtype=np.float32)
            qk_weight[:r, :] = V  # prefill first r rows, rest zero
            qk_out = self.input_dim

        q_lin = nn.Dense(
            qk_out, use_bias=False, kernel_init=_constant_init(qk_weight.T), name="q_lin"
        )
        if x.ndim == 2:
            return q_lin(x.astype(jnp.float32))

        k_lin = nn.Dense(
            qk_out, use_bias=False, kernel_init=_constant_init(qk_weight.T), name="k_lin"
        )
        # torch kaiming_uniform_(a=sqrt(5)) on (out, in): U(-1/sqrt(in), 1/sqrt(in))
        bound = 1.0 / math.sqrt(self.input_dim)

        def _sym_uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

        v_lin = nn.Dense(
            self.input_dim, use_bias=False, kernel_init=_sym_uniform, name="v_lin"
        )
        x32 = x.astype(jnp.float32)
        q, k, v = q_lin(x32), k_lin(x32), v_lin(x32)
        scale = float(qk_out) ** 0.5
        scores = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) / scale
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", probs, v)
