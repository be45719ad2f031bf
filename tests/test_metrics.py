"""Tests for SNR / PSNR / noise-level metrics."""

import numpy as np
from scipy.signal import convolve2d

from pseudo_3d_interpolation_tpu.ops import metrics


def test_snr_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    y = x + 0.1 * rng.normal(size=(64, 64)).astype(np.float32)
    expected = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    np.testing.assert_allclose(float(metrics.snr(x, y)), expected, rtol=1e-4)


def test_snr_perfect_is_inf():
    x = np.ones((8, 8), np.float32)
    assert np.isinf(float(metrics.snr(x, x)))


def test_snr_known_value():
    x = np.full((10, 10), 2.0, np.float32)
    y = x + 0.2
    expected = 10 * np.log10((2.0**2) / (0.2**2))
    np.testing.assert_allclose(float(metrics.snr(x, y)), expected, rtol=1e-4)


def test_psnr_formula():
    rng = np.random.default_rng(4)
    x = rng.uniform(size=(32, 32)).astype(np.float32)
    y = np.clip(x + 0.05 * rng.normal(size=(32, 32)), 0, 1).astype(np.float32)
    mse = np.mean((x - y) ** 2)
    expected = 10 * np.log10(1.0 / np.sqrt(mse))
    np.testing.assert_allclose(float(metrics.psnr(x, y)), expected, rtol=1e-4)


def test_immerkaer_vs_scipy():
    rng = np.random.default_rng(5)
    img = rng.normal(size=(48, 40)).astype(np.float32)

    def ref(img):
        def rescale(a, lo, hi):
            return lo + (a - a.min()) * (hi - lo) / (a.max() - a.min())

        M = [[1, -2, 1], [-2, 4, -2], [1, -2, 1]]
        h, w = img.shape
        s = np.sum(np.abs(convolve2d(rescale(img, 0, 255), M)))
        return s * np.sqrt(0.5 * np.pi) / (6 * (w - 2) * (h - 2))

    np.testing.assert_allclose(
        float(metrics.immerkaer_noise_level(img)), ref(img), rtol=1e-3
    )


def test_immerkaer_tracks_noise_amplitude():
    rng = np.random.default_rng(6)
    base = np.zeros((64, 64), np.float32)
    lo = float(metrics.immerkaer_noise_level(base + rng.normal(0, 1, base.shape).astype(np.float32)))
    hi = float(metrics.immerkaer_noise_level(base + rng.normal(0, 4, base.shape).astype(np.float32)))
    # estimator operates on [0,255]-rescaled data, so it reports relative
    # level — but more noise must still read as more noise
    assert 0 < lo < hi
