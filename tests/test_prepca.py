"""prepca numerics tests: covariance factory, PCA, KPCA, ZCA, PCP, CKA."""

import numpy as np
import pytest

from vit_tpu.prepca.pipeline import (
    KernelPCAState,
    ZCAWhitening,
    compute_cka,
    compute_kernel_pca,
    compute_pca,
    compute_pcp,
)
from vit_tpu.prepca.stats import (
    compute_covariance_stats,
    load_or_compute_covariance,
    zca_self_check,
)


@pytest.fixture(scope="module")
def gauss_data():
    rng = np.random.default_rng(0)
    # correlated features so whitening is non-trivial
    A = rng.standard_normal((32, 32))
    return (rng.standard_normal((500, 32)) @ A).astype(np.float32)


def test_covariance_stats_roundtrip(gauss_data, tmp_path):
    path = str(tmp_path / "cov.npz")
    stats = compute_covariance_stats(gauss_data, save_path=path)
    assert stats.eigvals.shape == (32,)
    assert np.all(np.diff(stats.eigvals) <= 1e-4)  # descending
    assert np.all(stats.eigvals >= 0)
    # eigvecs diagonalize cov
    recon = stats.eigvecs @ np.diag(stats.eigvals) @ stats.eigvecs.T
    np.testing.assert_allclose(recon, stats.cov, atol=1e-2 * np.abs(stats.cov).max())
    loaded = load_or_compute_covariance(path)
    np.testing.assert_allclose(loaded.mean, stats.mean, rtol=1e-6)
    assert loaded.num_samples == 500
    # diagnostic plots written next to the artifact
    assert (tmp_path / "cov_heatmap.png").exists()
    assert (tmp_path / "cov_eigenvalues.png").exists()


def test_covariance_torch_pt_interop(gauss_data, tmp_path):
    path = str(tmp_path / "cov.pt")
    compute_covariance_stats(gauss_data, save_path=path)
    from vit_tpu.utils import load_cov_stats

    stats = load_cov_stats(path, use_cache=False)
    assert set(stats) >= {"mean", "cov", "eigvals", "eigvecs"}


def test_pca_matches_torch_lowrank(gauss_data):
    """Cross-validate against torch.pca_lowrank (the reference's backend)."""
    import torch

    spectra = gauss_data[:64]
    res = compute_pca(spectra, patch_size=8, step=8)
    patches = torch.from_numpy(spectra).unfold(1, 8, 8).contiguous().view(-1, 8)
    U, S, V = torch.pca_lowrank(patches, q=8, center=True)
    np.testing.assert_allclose(res["singular_values"], S.numpy(), rtol=1e-3)
    # components match up to per-column sign
    dots = np.abs(np.sum(res["components"] * V.numpy(), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
    assert res["explained_variance_ratio"].sum() == pytest.approx(1.0, rel=1e-5)


def test_zca_whitening_whitens(gauss_data):
    zca = ZCAWhitening(eps=1e-6)
    out = zca.fit_transform(gauss_data)
    cov = np.cov(out.T)
    np.testing.assert_allclose(cov, np.eye(32), atol=0.15)
    # inverse_transform roundtrip
    back = zca.inverse_transform(zca.transform(gauss_data[:10]))
    np.testing.assert_allclose(back, gauss_data[:10], rtol=1e-2, atol=1e-2)


def test_zca_lowrank_projector(gauss_data, tmp_path):
    zca = ZCAWhitening(eps=1e-6, rank=8, alpha=0.5)
    zca.fit(gauss_data)
    proj = zca.project(gauss_data[:5])
    assert proj.shape == (5, 8)
    path = str(tmp_path / "zca.npz")
    zca.save(path)
    loaded = ZCAWhitening.load(path)
    np.testing.assert_allclose(loaded.whitening_matrix, zca.whitening_matrix, rtol=1e-6)


def test_zca_self_check_pass_and_fail(gauss_data):
    stats = compute_covariance_stats(gauss_data)
    from vit_tpu.models.preprocessor import compute_zca_matrix

    P = compute_zca_matrix(stats.eigvecs, stats.eigvals, eps=1e-6, shrinkage=0.0)
    rel, cond_before, cond_after = zca_self_check(P, stats.cov, eps=1e-6)
    assert rel < 0.1
    assert cond_after < cond_before
    with pytest.raises(AssertionError):
        zca_self_check(np.eye(32) * 3.0, stats.cov)


def test_kpca_transform_and_save(gauss_data, tmp_path):
    state = compute_kernel_pca(gauss_data, r=8, landmarks=128, seed=0)
    z = state.transform(gauss_data[:20])
    assert z.shape == (20, 8)
    # chunked transform identical
    z2 = state.transform(gauss_data[:20], chunk=7)
    np.testing.assert_allclose(z, z2, rtol=1e-5, atol=1e-5)
    # Nystrom property: landmark embeddings are centered with ORTHOGONAL
    # components (Z = U_r Lam_r^{1/2}, so Z^T Z = diag(lam_r))
    zl = state.transform(state.landmarks)
    np.testing.assert_allclose(zl.mean(axis=0), 0.0, atol=1e-3)
    gram = zl.T @ zl
    off_diag = gram - np.diag(np.diag(gram))
    assert np.abs(off_diag).max() < 1e-4 * np.abs(np.diag(gram)).max()
    assert np.all(np.diag(gram) > 0)
    path = str(tmp_path / "kpca.npz")
    state.save(path)
    loaded = KernelPCAState.load(path)
    np.testing.assert_allclose(loaded.transform(gauss_data[:5]), state.transform(gauss_data[:5]), rtol=1e-5)


def test_pcp_decomposes_and_converges():
    rng = np.random.default_rng(1)
    n, m, r = 200, 100, 3
    L_true = rng.standard_normal((n, r)) @ rng.standard_normal((r, m)) / np.sqrt(r)
    S_true = np.zeros((n, m))
    idx = rng.random((n, m)) < 0.05
    S_true[idx] = rng.standard_normal(int(idx.sum())) * 5
    D = L_true + S_true
    L, S, hist = compute_pcp(D, max_iter=500, tol=1e-6)
    # converged to a feasible split D = L + S
    assert hist["iters"] < 500
    np.testing.assert_allclose(L + S, D, atol=1e-3)
    # S is sparse and concentrates on the true spike support
    assert hist["nnz"][-1] < 0.5 * n * m
    spike_mass = np.abs(S[idx]).sum()
    total_mass = np.abs(S).sum() + 1e-12
    assert spike_mass / total_mass > 0.5
    # history records monotone-ish residual decay
    assert hist["primal_resid"][-1] < hist["primal_resid"][0]


def test_cka_identity_and_invariance(gauss_data):
    a = gauss_data[:100]
    assert compute_cka(a, a, debiased=False) == pytest.approx(1.0, rel=1e-6)
    # invariant to orthogonal transform + scale
    Q, _ = np.linalg.qr(np.random.default_rng(2).standard_normal((32, 32)))
    assert compute_cka(a, 3.0 * a @ Q, debiased=False) == pytest.approx(1.0, rel=1e-4)
    # unrelated data has low CKA
    b = np.random.default_rng(3).standard_normal((100, 32))
    assert compute_cka(a, b, debiased=False) < 0.3
