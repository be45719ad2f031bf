"""Tests for windowed stats, outlier chains, STA/LTA seafloor detection,
Butterworth filters."""

import numpy as np
import pytest
import scipy.signal

from pseudo_3d_interpolation_tpu.ops import filters as flt


def test_sta_lta_matches_reference_formulation():
    rng = np.random.default_rng(40)
    a = rng.normal(size=(3, 500)).astype(np.float32)
    nsta, nlta = 5, 50
    got = np.asarray(flt.sta_lta(a, nsta, nlta))

    # independent numpy mirror (obspy classic_sta_lta semantics)
    cs = np.cumsum(a**2, axis=-1)
    sta = cs.copy()
    sta[..., nsta:] = cs[..., nsta:] - cs[..., :-nsta]
    sta /= nsta
    lta = cs.copy()
    lta[..., nlta:] = cs[..., nlta:] - cs[..., :-nlta]
    lta /= nlta
    sta[..., : nlta - 1] = 0
    expected = np.divide(sta, lta, out=np.zeros_like(sta), where=lta != 0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_sta_lta_detects_onset():
    t = np.zeros((1, 1000), np.float32)
    t[0, 600:] = np.random.default_rng(0).normal(0, 1, 400)
    r = np.asarray(flt.sta_lta(t, 5, 100))[0]
    assert 595 <= np.argmax(r > 5) <= 615


def test_moving_average():
    a = np.arange(10, dtype=np.float32)
    got = np.asarray(flt.moving_average(a, 3))
    expected = np.convolve(a, np.ones(3) / 3, mode="valid")
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_moving_median_padded():
    a = np.array([1.0, 2, 100, 4, 5, 6, 7], np.float32)
    got = np.asarray(flt.moving_median(a, 3, padded=True))
    assert got.shape == a.shape
    assert got[2] == 4.0  # spike removed


def test_polynomial_filter_removes_trend():
    x = np.arange(200, dtype=np.float32)
    trend = 0.01 * x**2 - x + 3
    rng = np.random.default_rng(41)
    noise = rng.normal(0, 0.1, 200).astype(np.float32)
    got = np.asarray(flt.polynomial_filter(trend + noise, order=2, kind="high"))
    assert np.abs(got).max() < 1.0


def test_mad_single_double():
    rng = np.random.default_rng(42)
    a = rng.normal(size=200)
    med = np.median(a)
    expected = np.median(np.abs(a - med))
    np.testing.assert_allclose(flt.median_abs_deviation(a), expected, rtol=1e-9)
    d = flt.median_abs_deviation_double(a)
    assert d.shape == a.shape
    assert (d > 0).all()


def test_smooth_preserves_linear():
    x = np.linspace(0, 1, 100)
    got = flt.smooth(x, window_len=11, window="hanning")
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_outlier_filters_find_spike():
    rng = np.random.default_rng(43)
    a = rng.normal(size=200)
    a[50] = 40.0
    a[120] = -35.0
    for method in ("IQR", "MAD", "r_doubleMAD", "r_singleMAD"):
        out = flt.filter_interp_1d(a, method=method, kind="linear", win=11)
        assert abs(out[50]) < 5, method
        assert abs(out[120]) < 5, method


def test_filter_interp_boundary_protection():
    a = np.zeros(100)
    a[:3] = 50.0  # boundary run should be left alone
    a[60] = 50.0
    out = flt.filter_interp_1d(a, method="MAD", kind="linear")
    assert out[0] == 50.0  # boundary flags dropped
    assert abs(out[60]) < 1


def test_butterworth_filtfilt_parity():
    rng = np.random.default_rng(44)
    x = rng.normal(size=(4, 1024)).astype(np.float64)
    got = flt.butterworth_filter(x, "lowpass", 500.0, fs=4000.0, order=6)
    sos = scipy.signal.butter(6, 500.0 / 2000.0, btype="lowpass", output="sos")
    expected = scipy.signal.sosfiltfilt(sos, x, axis=-1)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_butterworth_spectral_matches_filtfilt_interior():
    """Device path (|H|² in rfft domain) ≈ sosfiltfilt away from the edges."""
    fs = 4000.0
    t = np.arange(2048) / fs
    x = (np.sin(2 * np.pi * 100 * t) + np.sin(2 * np.pi * 1500 * t)).astype(np.float32)[None]
    sos = flt.butterworth_design("lowpass", 500.0, fs, order=6)
    got = np.asarray(flt.butterworth_apply_spectral(x, sos))
    expected = scipy.signal.sosfiltfilt(sos, x, axis=-1)
    np.testing.assert_allclose(got[0], expected[0], atol=1e-2)
    # high-frequency tone removed (edges carry the usual zero-phase
    # transient, present in filtfilt too — compare the interior)
    interior = slice(100, -100)
    assert np.abs(got[0, interior] - np.sin(2 * np.pi * 100 * t)[interior]).max() < 0.01


def test_filter_frequency_auto_order():
    rng = np.random.default_rng(45)
    x = rng.normal(size=(2, 512)).astype(np.float64)
    out = flt.filter_frequency(x, [400.0, 600.0], fs=4000.0, filter_type="lowpass")
    assert out.shape == x.shape
    outd = np.asarray(flt.filter_frequency(
        x.astype(np.float32), [400.0, 600.0], fs=4000.0, filter_type="lowpass", device=True))
    assert outd.shape == x.shape


def synthetic_section(nsamples=800, ntraces=120, seed=46):
    """Water column + dipping seafloor + sub-bottom reflectors."""
    rng = np.random.default_rng(seed)
    data = rng.normal(0, 0.01, (nsamples, ntraces)).astype(np.float32)
    seafloor = (300 + 40 * np.sin(np.linspace(0, 3, ntraces))).astype(int)
    for j in range(ntraces):
        sf = seafloor[j]
        data[sf, j] += 1.0  # strong seafloor spike
        data[sf + 1, j] += 0.6
        data[sf + 40, j] += 0.3  # sub-bottom reflector
        data[sf:, j] += rng.normal(0, 0.05, nsamples - sf)
    return data, seafloor


def test_detect_seafloor_reflection():
    data, seafloor = synthetic_section()
    picks = flt.detect_seafloor_reflection(data, win=20)
    err = np.abs(picks - seafloor)
    assert np.median(err) <= 2
    assert err.max() <= 25


def test_detect_seafloor_with_zero_traces():
    data, seafloor = synthetic_section()
    data[:, 40:43] = 0.0  # simulate merged zero traces
    picks = flt.detect_seafloor_reflection(data, win=20)
    err = np.abs(picks - seafloor)
    assert np.median(err) <= 3
