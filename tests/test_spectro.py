"""Spectro utility tests: EW, Voigt, SVD denoiser, SNR, air/vacuum, masks."""

import numpy as np
import pytest

from vit_tpu.data.datasets import (
    SingleSpectrumNoiseDataset,
    create_lvrg_mask,
    create_quantile_mask,
    fill_masked,
)
from vit_tpu.spectro import (
    SVDDenoiser,
    add_new_line,
    air_to_vac,
    air_to_vac_deriv,
    calculate_rms,
    calculate_snr,
    calculate_snr_masked,
    create_new_voigt_line,
    get_equivalent_width,
    get_equivalent_width_i,
    vac_to_air,
)


def test_equivalent_width_flat_continuum():
    wave = np.linspace(8400, 8700, 3000)
    flux = np.ones_like(wave)
    # inject a rectangular absorption of depth 0.5 over 10 A -> EW = 5 A
    feat = (wave >= 8500) & (wave <= 8510)
    flux[feat] = 0.5
    ew = get_equivalent_width_i(wave, flux, 8490, 8520, 8450, 8480, 8530, 8560)
    assert ew == pytest.approx(5.0, rel=0.02)


def test_equivalent_width_dataframe():
    wave = np.linspace(7400, 8800, 8000)
    flux = np.ones((3, 8000))
    df = get_equivalent_width(wave, flux, np.zeros(3))
    assert list(df.columns)[0] == "SpecID"
    assert {"TiO_4", "Ca1_LB13"} <= set(df.columns)
    # flat spectra -> EW ~ 0
    assert np.abs(df["TiO_4"].values).max() < 1e-8


def test_voigt_line_injection():
    wave = np.linspace(8600, 8800, 2000)
    flux = np.ones_like(wave)
    new_wave, line = create_new_voigt_line(wave, u=8700, hw=10, sigma=1.0, gamma=1.0)
    assert len(new_wave) > 0
    assert line.argmax() == np.abs(new_wave - 8700).argmin()
    line_flux, new_flux = add_new_line(wave, flux, new_wave, line, sign=-1)
    assert new_flux.min() < 1.0  # absorption injected
    untouched = ~np.isin(wave, new_wave)
    np.testing.assert_array_equal(new_flux[untouched], flux[untouched])


def test_svd_denoiser_recovers_lowrank():
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((4, 256))
    clean = rng.standard_normal((200, 4)) @ basis
    noisy = clean + rng.standard_normal(clean.shape) * 0.05
    den = SVDDenoiser(n_components=4).fit(clean)
    out = den.denoise(noisy)
    assert np.abs(out - clean).std() < 0.05  # noise reduced
    assert den.explained_variance_ratio_.sum() > 0.99


def test_snr_estimators():
    rng = np.random.default_rng(1)
    flux = 10.0 + rng.standard_normal((5, 2048)) * 0.1
    snr = calculate_snr(flux)
    assert snr.shape == (5,)
    assert np.all(snr > 50) and np.all(snr < 200)  # ~10/0.1
    rms = calculate_rms(noisy=flux + 0.1, flux=flux)
    assert np.all(np.isfinite(rms))
    m = np.ones(2048, bool)
    s = calculate_snr_masked(flux[0], m)
    assert 50 < s < 200


def test_air_vac_roundtrip():
    wave = np.linspace(4000, 9000, 100)
    vac = air_to_vac(wave)
    assert np.all(vac > wave)  # vacuum wavelengths are longer
    # the forward/backward formulas are independent approximations (Greisen
    # 2006 vs the IAU standard) — they agree to ~1e-5 relative, not exactly
    back = vac_to_air(vac)
    np.testing.assert_allclose(back, wave, rtol=2e-5)
    deriv = air_to_vac_deriv(wave)
    assert np.all(deriv > 1.0)
    # below 2000 A vac_to_air is identity
    np.testing.assert_array_equal(vac_to_air(np.array([1500.0])), [1500.0])


def test_mask_utilities():
    rng = np.random.default_rng(2)
    arr = rng.random((10, 100))
    mask = create_quantile_mask(arr, ratio=0.5)
    assert mask.sum() == pytest.approx(50, abs=2)
    sel = fill_masked(arr, mask)
    assert sel.shape == (10, mask.sum())
    filled = fill_masked(arr, mask, filler=0.0)
    assert filled.shape == arr.shape
    assert (filled[:, ~mask] == 0).all()

    wave = np.linspace(4000, 9000, 1000)
    lmask = create_lvrg_mask(wave, [5000.0, 7000.0])
    assert lmask.sum() == 100  # two 50-pixel windows
    assert lmask[np.abs(wave - 5000).argmin()]


def test_single_spectrum_noise_dataset():
    flux = np.linspace(0, 1, 64).astype(np.float32)
    err = np.full(64, 0.1, np.float32)
    ds = SingleSpectrumNoiseDataset(flux, err, noise_level=1.0, repeat=32, seed=42)
    assert len(ds) == 32
    noisy, f0, e0 = ds[0]
    assert noisy.shape == (64,)
    np.testing.assert_array_equal(f0, flux)
    # seeded: reproducible
    ds2 = SingleSpectrumNoiseDataset(flux, err, noise_level=1.0, repeat=32, seed=42)
    np.testing.assert_array_equal(ds.noisy, ds2.noisy)
    arrays = ds.arrays()
    assert arrays["x"].shape == (32, 64)


def test_kpca_warm_attention():
    import jax
    import jax.numpy as jnp

    from vit_tpu.prepca.attention import KPCAWarmSelfAttention
    from vit_tpu.prepca.pipeline import compute_kernel_pca

    rng = np.random.default_rng(3)
    dim = 16
    data = rng.standard_normal((200, dim)).astype(np.float32)
    state = compute_kernel_pca(data, r=8, landmarks=64, seed=0)
    module = KPCAWarmSelfAttention(dim=dim, num_heads=2, kpca_state=state)
    x = jnp.asarray(rng.standard_normal((2, 5, dim)), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)
    out, probs = module.apply(params, x, need_weights=True)
    assert out.shape == (2, 5, dim)
    assert probs.shape == (2, 2, 5, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    # adapters initialized near identity: kernel is 0/1 strided pattern
    qk = np.asarray(params["params"]["q_adapter"]["kernel"])
    assert set(np.unique(qk)) <= {0.0, 1.0}
    # jit-compatible end to end
    jitted = jax.jit(lambda p, x: module.apply(p, x))
    assert jitted(params, x).shape == (2, 5, dim)
