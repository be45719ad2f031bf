"""Wavelet transform tests: exact filter generation, perfect reconstruction,
orthonormality, and wavelet-basis POCS (BASELINE config 3)."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import metrics, wavelet as wv
from pseudo_3d_interpolation_tpu.models import POCSConfig, WaveletTransform, pocs_interpolate_numpy

from test_pocs import random_mask, synthetic_slice


def test_haar_filter():
    h = wv.daubechies(1)
    np.testing.assert_allclose(h, [1 / np.sqrt(2)] * 2, rtol=1e-12)


def test_db2_matches_closed_form():
    """db2 has the analytic solution {(1±√3), (3±√3)} / (4√2)."""
    s3 = np.sqrt(3.0)
    analytic = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / (4 * np.sqrt(2))
    h = wv.daubechies(2)
    # orientation-agnostic comparison
    match = np.allclose(h, analytic, atol=1e-10) or np.allclose(h, analytic[::-1], atol=1e-10)
    assert match, h


@pytest.mark.parametrize("p", [2, 4, 8, 15, 20])
def test_filter_properties(p):
    """Σh = √2, ‖h‖ = 1, even-shift orthogonality, vanishing moments."""
    h = wv.daubechies(p)
    assert h.size == 2 * p
    np.testing.assert_allclose(h.sum(), np.sqrt(2.0), rtol=1e-9)
    np.testing.assert_allclose(np.dot(h, h), 1.0, rtol=1e-9)
    for k in range(1, p):
        np.testing.assert_allclose(np.dot(h[: -2 * k], h[2 * k:]), 0.0, atol=1e-8)
    # vanishing moments of the highpass: Σ g[k]·k^m = 0 for m < p
    g = h[::-1] * (-1.0) ** np.arange(2 * p)
    for m in range(min(p, 4)):
        np.testing.assert_allclose(np.dot(g, np.arange(2 * p, dtype=float) ** m), 0.0, atol=1e-5)


@pytest.mark.parametrize("name", ["haar", "db2", "db4", "db8"])
def test_dwt2_perfect_reconstruction(name):
    rng = np.random.default_rng(50)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    ll, det = wv.dwt2(x, name)
    assert ll.shape == (32, 32)
    back = np.asarray(wv.idwt2(ll, det, name))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_dwt2_energy_preserved():
    rng = np.random.default_rng(51)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    ll, (lh, hl, hh) = wv.dwt2(x, "db4")
    e_in = np.sum(x**2)
    e_out = sum(float(np.sum(np.asarray(c) ** 2)) for c in (ll, lh, hl, hh))
    np.testing.assert_allclose(e_out, e_in, rtol=1e-4)


@pytest.mark.parametrize("level", [1, 2, 3])
def test_wavedec2_roundtrip(level):
    rng = np.random.default_rng(52)
    x = rng.normal(size=(3, 64, 48)).astype(np.float32)  # batched
    coeffs = wv.wavedec2(x, "db4", level)
    assert coeffs[0].shape == (3, 64 // 2**level, 48 // 2**level)
    assert len(coeffs) == level + 1
    back = np.asarray(wv.waverec2(coeffs, "db4"))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_wavedec2_rejects_indivisible():
    with pytest.raises(ValueError, match="divisible"):
        wv.wavedec2(np.zeros((10, 10), np.float32), "db2", 3)


def test_unknown_wavelet():
    with pytest.raises(ValueError, match="not available"):
        wv.wavelet_filters("coif99")


def test_smooth_image_is_sparse():
    """A smooth image concentrates energy in the approximation band."""
    y, x = np.mgrid[0:64, 0:64] / 64.0
    img = np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    coeffs = wv.wavedec2(img.astype(np.float32), "db4", 3)
    e_ll = float(np.sum(np.asarray(coeffs[0]) ** 2))
    e_tot = float(np.sum(img**2))
    assert e_ll / e_tot > 0.95


def smooth_slice(h=64, w=64, seed=0):
    """Piecewise-smooth synthetic (Gaussian bumps) — sparse in wavelets,
    matching the geological character wavelet bases are chosen for."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w] / float(h)
    img = np.zeros((h, w), np.float64)
    for _ in range(6):
        cy, cx = rng.uniform(0.1, 0.9, 2)
        s = rng.uniform(0.05, 0.2)
        img += rng.uniform(0.5, 2.0) * np.exp(-(((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s)))
    return img.astype(np.float32)


def test_wavelet_pocs_reconstruction():
    """BASELINE config 3: wavelet-basis POCS on a noisy 30%-sampled slice
    (cell-wise fold mask, as derived from empty bins)."""
    x = smooth_slice()
    rng = np.random.default_rng(53)
    noisy = x + rng.normal(0, 0.02, x.shape).astype(np.float32)
    mask = (rng.uniform(size=x.shape) < 0.3).astype(np.float32)
    obs = noisy * mask
    cfg = POCSConfig(niter=40, thresh_op="soft", thresh_model="exponential",
                     p_min=1e-3, version="fast", alpha=1.0, transform_kind="WAVELET")
    tr = WaveletTransform(wavelet="db4", level=3)
    rec, n_it, _ = pocs_interpolate_numpy(obs, mask, cfg, transform=tr)
    snr_in = float(metrics.snr(x, obs))
    snr_out = float(metrics.snr(x, rec))
    assert snr_out > snr_in + 6, (snr_in, snr_out)
    assert snr_out > 15, snr_out


@pytest.mark.parametrize("p", [2, 4, 6, 8])
def test_symlet_properties(p):
    """Symlets: orthonormal, Σh=√2, even-shift orthogonality, and less
    asymmetric than the corresponding Daubechies filter."""
    h = wv.symlet(p)
    assert h.size == 2 * p
    np.testing.assert_allclose(h.sum(), np.sqrt(2.0), rtol=1e-9)
    np.testing.assert_allclose(np.dot(h, h), 1.0, rtol=1e-9)
    for k in range(1, p):
        np.testing.assert_allclose(np.dot(h[: -2 * k], h[2 * k:]), 0.0, atol=1e-8)

    def asym(h):
        w = np.linspace(0.01, np.pi - 0.01, 128)
        e = np.exp(-1j * np.outer(w, np.arange(len(h))))
        H = e @ h
        ph = np.unwrap(np.angle(H * np.exp(1j * w * (len(h) - 1) / 2)))
        return float(np.sum(np.diff(ph) ** 2))

    if p >= 4:
        assert asym(h) <= asym(wv.daubechies(p)) + 1e-9


@pytest.mark.parametrize("name", ["sym4", "sym8"])
def test_symlet_perfect_reconstruction(name):
    rng = np.random.default_rng(55)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    coeffs = wv.wavedec2(x, name, 2)
    back = np.asarray(wv.waverec2(coeffs, name))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)
