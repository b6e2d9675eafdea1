"""Offline preprocessing numerics: PCA, Nyström KPCA, ZCA, PCP, CKA.

Math parity with `/root/reference/src/prepca/pipeline.py` (cited per
function). These are one-shot offline tools: the matmul-heavy pieces (Gram
matrices, covariances, transforms) run through jnp so they use the TPU when
present; eigendecompositions run in float64 numpy on the host for accuracy
(whitening is conditioning-sensitive). Artifacts save as ``.npz`` natively
and ``.pt`` for interop with the reference's torch artifacts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from vit_tpu.data.hdf5 import load_spectra

__all__ = [
    "load_spectra",
    "compute_pca",
    "compute_patch_pca_images",
    "KernelPCAState",
    "compute_kernel_pca",
    "ZCAWhitening",
    "ZCAState",
    "compute_pcp",
    "compute_cka",
    "PreprocessingPipeline",
]


def _as_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _unfold_patches(spectra: np.ndarray, patch: int, step: int) -> np.ndarray:
    """(N, L) -> (N * num_windows, patch) sliding windows (torch unfold)."""
    n, length = spectra.shape
    num = (length - patch) // step + 1
    windows = np.lib.stride_tricks.sliding_window_view(spectra, patch, axis=1)[:, ::step]
    return windows[:, :num].reshape(-1, patch)


# ---------------------------------------------------------------------------
# PCA (patch-level) — reference `pipeline.py:116-159`
# ---------------------------------------------------------------------------
def compute_pca(
    spectra: np.ndarray,
    *,
    patch_size: int,
    step: Optional[int] = None,
    limit: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """PCA basis over flattened spectral patches.

    Returns ``{components V, scores U, singular_values S, mean,
    explained_variance_ratio, patch_size, step, num_patches}`` matching the
    reference's ``torch.pca_lowrank(q=patch_size, center=True)`` contract.
    """
    spectra = _as_np(spectra).astype(np.float32)
    if spectra.ndim != 2:
        raise ValueError(f"Expected [N, L] array, got {spectra.shape}")
    if limit is not None and 0 < limit < spectra.shape[0]:
        spectra = spectra[:limit]
    step = int(step) if (step is not None and int(step) > 0) else int(patch_size)
    patches = _unfold_patches(spectra, patch_size, step)

    mean = patches.mean(axis=0)
    # Covariance-eigh formulation: the right singular vectors of the
    # (M, P) centered patch matrix are the eigenvectors of its (P, P)
    # Gram — a full float64 SVD materialized a second copy of the whole
    # patch matrix (~100 GB at 100k x 4096 spectra, stride 1) for the
    # same answer. The Gram is accumulated in f64 over row chunks, so
    # peak extra memory is one chunk.
    p = patches.shape[1]
    gram = np.zeros((p, p), np.float64)
    chunk = 1 << 16
    for i in range(0, patches.shape[0], chunk):
        c = (patches[i : i + chunk] - mean).astype(np.float64)
        gram += c.T @ c
    eigvals, eigvecs = np.linalg.eigh(gram)
    order = np.argsort(eigvals)[::-1]
    eigvals = np.clip(eigvals[order], 0.0, None)
    V = eigvecs[:, order].astype(np.float32)
    S = np.sqrt(eigvals).astype(np.float32)
    # Left singular vectors (torch.pca_lowrank's U): centered @ V / S.
    centered32 = patches - mean
    U = (centered32 @ V) / np.where(S > 0, S, 1.0)
    evr = eigvals
    total = float(evr.sum())
    evr = (evr / total if total > 0 else evr).astype(np.float32)
    return {
        "components": V,  # (patch, patch) right singular vectors
        "scores": U,
        "singular_values": S,
        "mean": mean.astype(np.float32),
        "explained_variance_ratio": evr,
        "patch_size": np.asarray(patch_size),
        "step": np.asarray(step),
        "num_patches": np.asarray(patches.shape[0]),
    }


def compute_patch_pca_images(
    images: np.ndarray,
    *,
    patch_size: int,
    limit: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Patch-level PCA over non-overlapping ``P x P x C`` image patches.

    2-D counterpart of :func:`compute_pca` (the reference computed patch PCA
    for 1-D spectra only, `pipeline.py:116-159`); produces the same artifact
    schema with ``components`` of shape ``(P*P*C, P*P*C)`` so the model
    builder's image-PCA path (``warmup.preprocessor: pca`` with
    ``input_kind: image``) can prefill :class:`PatchPCAProjector`.

    ``images``: (N, H, W, C) float or uint8 (uint8 scaled to [0, 1]); patch
    flattening is row-major over (P, P, C) — the projector matches.
    """
    images = _as_np(images)
    if images.ndim != 4:
        raise ValueError(f"Expected (N, H, W, C) images, got {images.shape}")
    if limit is not None and 0 < limit < images.shape[0]:
        images = images[:limit]
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    images = images.astype(np.float32)
    n, hgt, wid, c = images.shape
    p = int(patch_size)
    if hgt % p or wid % p:
        raise ValueError(f"image {hgt}x{wid} not tileable by patch {p}")
    patches = images.reshape(n, hgt // p, p, wid // p, p, c)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(-1, p * p * c)

    mean = patches.mean(axis=0)
    centered = (patches - mean).astype(np.float64)
    # Eigendecomposition of the patch covariance (cheaper than SVD of the
    # (N*patches, patch_dim) matrix when N is large; patch_dim <= ~768).
    cov = centered.T @ centered / max(1, centered.shape[0] - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = np.clip(eigvals[order], 0.0, None)
    V = eigvecs[:, order].astype(np.float32)
    total = float(eigvals.sum())
    evr = (eigvals / total if total > 0 else eigvals).astype(np.float32)
    return {
        "components": V,  # (patch_dim, patch_dim), columns = directions
        "singular_values": np.sqrt(
            eigvals * max(1, centered.shape[0] - 1)
        ).astype(np.float32),
        "mean": mean.astype(np.float32),
        "explained_variance_ratio": evr,
        "patch_size": np.asarray(p),
        "num_channels": np.asarray(c),
        "num_patches": np.asarray(patches.shape[0]),
    }


# ---------------------------------------------------------------------------
# Kernels + Nyström KPCA — reference `pipeline.py:165-317`
# ---------------------------------------------------------------------------
def _pairwise_sq_dists(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x2 = (x * x).sum(axis=1, keepdims=True)
    y2 = (y * y).sum(axis=1, keepdims=True).T
    return np.clip(x2 + y2 - 2.0 * (x @ y.T), 0.0, None)


def _kernel(
    x: np.ndarray,
    y: np.ndarray,
    *,
    name: str = "rbf",
    gamma: Optional[float] = None,
    degree: int = 3,
    coef0: float = 1.0,
) -> np.ndarray:
    if name == "linear":
        return x @ y.T
    if name == "poly":
        if gamma is None:
            gamma = 1.0 / x.shape[1]
        return (gamma * (x @ y.T) + coef0) ** degree
    if name == "rbf":
        if gamma is None:
            # median heuristic on a subsample (reference `pipeline.py:188-193`)
            xs = x[:: max(1, x.shape[0] // 4096)]
            ys = y[:: max(1, y.shape[0] // 4096)]
            med = np.median(_pairwise_sq_dists(xs, ys).flatten())
            gamma = 1.0 / (med + 1e-8)
        return np.exp(-gamma * _pairwise_sq_dists(x, y))
    raise ValueError(f"Unknown kernel: {name}")


def _center_gram_train(K: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    m = K.shape[0]
    row_means = K.mean(axis=0)
    k_mean = float(row_means.mean())
    ones = np.full((m, m), 1.0 / m, dtype=K.dtype)
    Kc = K - ones @ K - K @ ones + ones @ K @ ones
    return 0.5 * (Kc + Kc.T), row_means, k_mean


def _center_kvec_test(k_xy: np.ndarray, row_means: np.ndarray, k_mean: float) -> np.ndarray:
    mean_b = k_xy.mean(axis=1, keepdims=True)
    return k_xy - mean_b - row_means[None, :] + k_mean


@dataclasses.dataclass
class KernelPCAState:
    """Nyström KPCA state: landmarks + projection ``A = U_r Lam_r^{-1/2}``."""

    landmarks: np.ndarray
    A: np.ndarray
    row_means: np.ndarray
    K_mean: float
    kernel_name: str = "rbf"
    gamma: Optional[float] = None
    degree: int = 3
    coef0: float = 1.0
    r: int = 32

    def resolve_gamma(self) -> Optional[float]:
        """Pin the rbf gamma for a state that carries ``gamma=None``.

        Reference artifacts leave gamma unresolved and re-derive the median
        heuristic per transform CALL — which makes chunked transforms
        map the same row to different features depending on its chunk. We
        derive it ONCE, deterministically, from the landmarks (themselves a
        subset of the fit data) and store it.
        """
        if self.gamma is None and self.kernel_name == "rbf":
            d2 = _pairwise_sq_dists(self.landmarks, self.landmarks)
            pos = d2[d2 > 0]
            med = float(np.median(pos)) if pos.size else 1.0
            self.gamma = float(1.0 / (med + 1e-8))
            print(
                f"[kpca] gamma=None in state; resolved median-heuristic "
                f"gamma={self.gamma:.4e} from the landmarks"
            )
        return self.gamma

    def transform(self, X: np.ndarray, chunk: int = 0) -> np.ndarray:
        self.resolve_gamma()
        X = _as_np(X)
        shape = X.shape
        Xf = X.reshape(-1, shape[-1]).astype(np.float32)
        if chunk and Xf.shape[0] > chunk:
            outs = [
                self.transform(Xf[i : i + chunk], chunk=0)
                for i in range(0, Xf.shape[0], chunk)
            ]
            return np.concatenate(outs, axis=0).reshape(*shape[:-1], -1)
        Kxy = _kernel(
            Xf, self.landmarks, name=self.kernel_name, gamma=self.gamma,
            degree=self.degree, coef0=self.coef0,
        )
        Z = _center_kvec_test(Kxy, self.row_means, self.K_mean) @ self.A
        return Z.reshape(*shape[:-1], self.A.shape[1])

    def save(self, path: str) -> None:
        payload = {
            "landmarks": self.landmarks,
            "A": self.A,
            "row_means": self.row_means,
            "K_mean": np.asarray(self.K_mean),
            "kernel_name": np.asarray(self.kernel_name),
            "gamma": np.asarray(self.gamma if self.gamma is not None else np.nan),
            "degree": np.asarray(self.degree),
            "coef0": np.asarray(self.coef0),
            "r": np.asarray(self.r),
        }
        if path.endswith((".pt", ".pth")):
            import torch

            torch.save(
                {
                    "landmarks": torch.from_numpy(self.landmarks),
                    "A": torch.from_numpy(self.A),
                    "row_means": torch.from_numpy(self.row_means),
                    "K_mean": self.K_mean,
                    "kernel_name": self.kernel_name,
                    "gamma": self.gamma,
                    "degree": self.degree,
                    "coef0": self.coef0,
                    "r": self.r,
                },
                path,
            )
        else:
            np.savez(path if path.endswith(".npz") else path + ".npz", **payload)

    @staticmethod
    def load(path: str) -> "KernelPCAState":
        if path.endswith((".pt", ".pth")):
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            return KernelPCAState(
                landmarks=_as_np(obj["landmarks"]),
                A=_as_np(obj["A"]),
                row_means=_as_np(obj["row_means"]),
                K_mean=float(obj["K_mean"]),
                kernel_name=obj["kernel_name"],
                gamma=obj.get("gamma"),
                degree=obj.get("degree", 3),
                coef0=obj.get("coef0", 1.0),
                r=obj.get("r", _as_np(obj["A"]).shape[1]),
            )
        with np.load(path, allow_pickle=False) as z:
            gamma = float(z["gamma"])
            return KernelPCAState(
                landmarks=z["landmarks"],
                A=z["A"],
                row_means=z["row_means"],
                K_mean=float(z["K_mean"]),
                kernel_name=str(z["kernel_name"]),
                gamma=None if np.isnan(gamma) else gamma,
                degree=int(z["degree"]),
                coef0=float(z["coef0"]),
                r=int(z["r"]),
            )


def compute_kernel_pca(
    spectra: np.ndarray,
    *,
    r: int,
    landmarks: Optional[int] = None,
    kernel_name: str = "rbf",
    gamma: Optional[float] = None,
    degree: int = 3,
    coef0: float = 1.0,
    seed: int = 0,
) -> KernelPCAState:
    """Nyström KPCA on a random landmark subset (reference `:281-317`)."""
    spectra = _as_np(spectra).astype(np.float32)
    n = spectra.shape[0]
    m = min(landmarks or n, n)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)[:m]
    L = spectra[idx]
    if gamma is None and kernel_name == "rbf":
        # Resolve the median-heuristic gamma ONCE and store it, so later
        # (possibly chunked) transforms are consistent with the fit. (The
        # reference leaves gamma=None in the state and re-derives it per
        # transform call, which makes chunked transforms gamma-inconsistent.)
        xs = L[:: max(1, L.shape[0] // 4096)]
        med = np.median(_pairwise_sq_dists(xs, xs).flatten())
        gamma = float(1.0 / (med + 1e-8))
    K = _kernel(L, L, name=kernel_name, gamma=gamma, degree=degree, coef0=coef0)
    Kc, row_means, k_mean = _center_gram_train(K)
    eigvals, eigvecs = np.linalg.eigh(Kc.astype(np.float64))
    eigvals = np.clip(eigvals, 1e-9, None)
    top = min(r, eigvals.size)
    lam_top = eigvals[-top:]
    vec_top = eigvecs[:, -top:]
    A = (vec_top / np.sqrt(lam_top)[None, :]).astype(np.float32)
    return KernelPCAState(
        landmarks=L,
        A=A,
        row_means=row_means.astype(np.float32),
        K_mean=k_mean,
        kernel_name=kernel_name,
        gamma=gamma,
        degree=degree,
        coef0=coef0,
        r=top,
    )


# ---------------------------------------------------------------------------
# ZCA whitening — reference `pipeline.py:323-477`
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ZCAState:
    mean: np.ndarray
    whitening: np.ndarray
    covariance: np.ndarray
    eigenvectors: np.ndarray
    eigenvalues: np.ndarray
    projector: Optional[np.ndarray]
    metadata: Dict[str, object]


class ZCAWhitening:
    """Fit/transform ZCA whitening with diagonal shrinkage and low-rank mode.

    ``gamma``: diagonal shrinkage in [0,1]; ``eps``: jitter; ``rank``:
    low-rank whitening + ``alpha``-scaled orthogonal complement.
    """

    def __init__(
        self,
        *,
        gamma: float = 0.0,
        eps: float = 1e-5,
        rank: Optional[int] = None,
        alpha: float = 0.0,
        dtype=np.float32,
    ) -> None:
        if not 0.0 <= gamma <= 1.0:
            raise ValueError("gamma must be in [0, 1]")
        self.gamma = float(gamma)
        self.eps = float(eps)
        self.rank = rank
        self.alpha = float(alpha)
        self.dtype = dtype
        self._state: Optional[ZCAState] = None

    def fit(self, data: np.ndarray) -> "ZCAWhitening":
        x = _as_np(data).astype(np.float64)
        if x.ndim != 2:
            raise ValueError("Expected 2D array for ZCA fit")
        if x.shape[0] < 2:
            raise ValueError("Need at least two samples to compute covariance")
        mean = x.mean(axis=0)
        centered = x - mean
        cov = centered.T @ centered / (x.shape[0] - 1)
        if self.gamma > 0:
            cov = (1.0 - self.gamma) * cov + self.gamma * np.diag(np.diag(cov))
        d = cov.shape[0]
        cov = cov + self.eps * np.eye(d)
        eigvals, eigvecs = np.linalg.eigh(cov)
        eigvals = np.clip(eigvals, self.eps, None)
        order = np.argsort(eigvals)[::-1]
        eigvals, eigvecs = eigvals[order], eigvecs[:, order]
        whitening = (eigvecs / np.sqrt(eigvals)[None, :]) @ eigvecs.T
        projector = None
        if self.rank is not None:
            r = max(1, min(int(self.rank), d))
            Vr, lam_r = eigvecs[:, :r], eigvals[:r]
            low_rank = (Vr / np.sqrt(lam_r)[None, :]) @ Vr.T
            projector = Vr.T.copy()
            whitening = low_rank + self.alpha * (np.eye(d) - Vr @ Vr.T)
        f = lambda a: a.astype(self.dtype)  # noqa: E731
        self._state = ZCAState(
            mean=f(mean),
            whitening=f(whitening),
            covariance=f(cov),
            eigenvectors=f(eigvecs),
            eigenvalues=f(eigvals),
            projector=None if projector is None else f(projector),
            metadata={
                "gamma": self.gamma,
                "eps": self.eps,
                "rank": self.rank,
                "alpha": self.alpha,
                "dtype": np.dtype(self.dtype).name,
            },
        )
        return self

    def fit_transform(self, data: np.ndarray) -> np.ndarray:
        return self.fit(data).transform(data)

    def _require_state(self) -> ZCAState:
        if self._state is None:
            raise RuntimeError("ZCAWhitening has not been fitted yet")
        return self._state

    def transform(self, data: np.ndarray) -> np.ndarray:
        s = self._require_state()
        x = _as_np(data).astype(s.mean.dtype)
        return (x - s.mean) @ s.whitening.T

    def inverse_transform(self, data: np.ndarray) -> np.ndarray:
        s = self._require_state()
        dewhiten = (s.eigenvectors * np.sqrt(s.eigenvalues)[None, :]) @ s.eigenvectors.T
        return _as_np(data).astype(s.mean.dtype) @ dewhiten.T + s.mean

    def project(self, data: np.ndarray) -> np.ndarray:
        s = self._require_state()
        if s.projector is None:
            raise RuntimeError("No projector available; fit with rank != None to enable")
        x = _as_np(data).astype(s.mean.dtype)
        return (x - s.mean) @ s.projector.T

    @property
    def whitening_matrix(self) -> np.ndarray:
        return self._require_state().whitening

    def save(self, path: str) -> None:
        s = self._require_state()
        arrays = {
            "mean": s.mean,
            "whitening": s.whitening,
            "covariance": s.covariance,
            "eigenvectors": s.eigenvectors,
            "eigenvalues": s.eigenvalues,
            "gamma": np.asarray(self.gamma),
            "eps": np.asarray(self.eps),
            "rank": np.asarray(-1 if self.rank is None else self.rank),
            "alpha": np.asarray(self.alpha),
        }
        if s.projector is not None:
            arrays["projector"] = s.projector
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)

    @classmethod
    def load(cls, path: str) -> "ZCAWhitening":
        with np.load(path, allow_pickle=False) as z:
            rank = int(z["rank"])
            obj = cls(
                gamma=float(z["gamma"]),
                eps=float(z["eps"]),
                rank=None if rank < 0 else rank,
                alpha=float(z["alpha"]),
            )
            obj._state = ZCAState(
                mean=z["mean"],
                whitening=z["whitening"],
                covariance=z["covariance"],
                eigenvectors=z["eigenvectors"],
                eigenvalues=z["eigenvalues"],
                projector=z["projector"] if "projector" in z.files else None,
                metadata={},
            )
        return obj


# ---------------------------------------------------------------------------
# PCP (robust PCA, inexact ALM) — reference `pipeline.py:483-540`
# ---------------------------------------------------------------------------
def _soft_threshold(X: np.ndarray, tau: float) -> np.ndarray:
    return np.sign(X) * np.maximum(np.abs(X) - tau, 0.0)


def _svt(M: np.ndarray, tau: float):
    U, s, Vt = np.linalg.svd(M, full_matrices=False)
    return U, np.maximum(s - tau, 0.0), Vt


def compute_pcp(
    spectra: np.ndarray,
    *,
    lambda_: Optional[float] = None,
    mu: Optional[float] = None,
    tol: float = 1e-7,
    max_iter: int = 1000,
    verbose: bool = False,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Dict[str, Iterable[float]]]:
    """Principal component pursuit: D = L (low-rank) + S (sparse)."""
    D = _as_np(spectra).astype(np.float32, copy=True)
    n, m = D.shape
    normD = np.linalg.norm(D)
    if lambda_ is None:
        lambda_ = 1.0 / np.sqrt(max(n, m))
    L = np.zeros_like(D)
    S = np.zeros_like(D)
    Y = np.zeros_like(D)
    if mu is None:
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(m).astype(D.dtype)
        for _ in range(5):  # power iteration for the spectral norm
            x = D.T @ (D @ x)
            x /= np.linalg.norm(x) + 1e-12
        spectral = np.sqrt(np.linalg.norm(D @ x))
        mu = 1.25 / (spectral + 1e-12)
    mu_bar = mu * 1e7
    rho = 1.5
    history: Dict[str, list] = {"primal_resid": [], "rank": [], "nnz": [], "iters": 0}
    for k in range(1, max_iter + 1):
        U, s, Vt = _svt(D - S + Y / mu, 1.0 / mu)
        L = (U * s) @ Vt
        S = _soft_threshold(D - L + Y / mu, lambda_ / mu)
        R = D - L - S
        Y = Y + mu * R
        resid = float(np.linalg.norm(R) / (normD + 1e-12))
        history["primal_resid"].append(resid)
        history["rank"].append(int((s > 0).sum()))
        history["nnz"].append(int((np.abs(S) > 0).sum()))
        history["iters"] = k
        if verbose and (k % 10 == 0 or resid < tol):
            print(f"[PCP] iter={k:4d} resid={resid:.3e} rank={history['rank'][-1]} "
                  f"nnz={history['nnz'][-1]} mu={mu:.3e}")
        if resid < tol:
            break
        mu = min(mu * rho, mu_bar)
    return L, S, history


# ---------------------------------------------------------------------------
# CKA — reference `pipeline.py:546-579`
# ---------------------------------------------------------------------------
def _center_gram(G: np.ndarray) -> np.ndarray:
    n = G.shape[0]
    H = np.eye(n) - np.full((n, n), 1.0 / n)
    return H @ G @ H


def compute_cka(
    A: np.ndarray, B: np.ndarray, *, kernel: str = "linear", debiased: bool = True
) -> float:
    """HSIC-normalized (linear or rbf) CKA with the reference's debias factor."""
    A, B = _as_np(A).astype(np.float64), _as_np(B).astype(np.float64)
    if A.shape[0] != B.shape[0]:
        raise ValueError("CKA requires both inputs to have the same number of samples")
    if kernel == "linear":
        GA, GB = _center_gram(A @ A.T), _center_gram(B @ B.T)
    elif kernel == "rbf":
        GA = _center_gram(np.exp(-_pairwise_sq_dists(A, A)))
        GB = _center_gram(np.exp(-_pairwise_sq_dists(B, B)))
    else:
        raise ValueError("kernel must be 'linear' or 'rbf'")
    hsic = float((GA * GB).sum())
    cka = hsic / (np.linalg.norm(GA) * np.linalg.norm(GB) + 1e-12)
    if not debiased:
        return float(cka)
    n = A.shape[0]
    return float(cka * (1.0 - 2.0 / (n - 1)))


# ---------------------------------------------------------------------------
# Facade — reference `pipeline.py:585-631`
# ---------------------------------------------------------------------------
class PreprocessingPipeline:
    """Load spectra once, then ``run('pca'|'kpca'|'zca'|'pcp'|'cka', **kw)``."""

    def __init__(self, file_path: str, *, num_samples: Optional[int] = None) -> None:
        data = load_spectra(file_path, num_samples)
        self.flux = data["flux"]
        self.wave = data["wave"]
        self.error = data.get("error")

    def run(self, method: str, **kwargs):
        method = method.lower()
        if method == "pca":
            result = compute_pca(self.flux, **kwargs)
            result["wave"] = self.wave
            return result
        if method == "kpca":
            return {"wave": self.wave, "state": compute_kernel_pca(self.flux, **kwargs)}
        if method == "zca":
            return {"wave": self.wave, "zca": ZCAWhitening(**kwargs).fit(self.flux)}
        if method == "pcp":
            L, S, history = compute_pcp(self.flux, **kwargs)
            return {"wave": self.wave, "low_rank": L, "sparse": S, "history": history}
        if method == "cka":
            other = kwargs.pop("other", None)
            if other is None:
                raise ValueError("'cka' requires 'other' array via kwargs")
            return {"cka": compute_cka(self.flux, other, **kwargs)}
        raise ValueError(f"Unknown preprocessing method '{method}'")
