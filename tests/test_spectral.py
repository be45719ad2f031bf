"""Tests for the time<->frequency stage (xrft-equivalent semantics)."""

import numpy as np

from pseudo_3d_interpolation_tpu.ops import cplx, spectral


def make_traces(n=256, b=4, dt=0.25e-3, t0=0.1):
    rng = np.random.default_rng(30)
    x = rng.normal(size=(b, n)).astype(np.float32)
    twt = t0 + np.arange(n) * dt
    return x, twt


def test_forward_true_amplitude_phase():
    x, twt = make_traces()
    dt, t0 = twt[1] - twt[0], twt[0]
    spec = spectral.forward_fft(x, twt, real=True)
    expected = np.fft.rfft(x, axis=-1) * dt * np.exp(-2j * np.pi * spec.freqs * t0)
    np.testing.assert_allclose(cplx.to_complex(spec.data), expected, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(spec.freqs, np.fft.rfftfreq(x.shape[-1], dt))


def test_roundtrip():
    x, twt = make_traces()
    spec = spectral.forward_fft(x, twt)
    twt_out, x_out = spectral.inverse_fft_original(spec)
    np.testing.assert_allclose(twt_out, twt, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x_out), x, rtol=1e-3, atol=1e-4)


def test_odd_length_truncated():
    x, twt = make_traces(n=255)
    spec = spectral.forward_fft(x, twt)
    assert spec.n_time == 254
    assert spec.nfft == 254


def test_upsampled_roundtrip():
    x, twt = make_traces(n=128)
    spec = spectral.forward_fft(x, twt, upsample=2)
    assert spec.nfft == 256
    assert spec.freqs.size == 129
    twt_out, x_out = spectral.inverse_fft(spec)
    assert x_out.shape[-1] == 256
    np.testing.assert_allclose(np.asarray(x_out)[..., :128], x, rtol=1e-3, atol=1e-4)
    # padding region reconstructs ~zero
    assert np.abs(np.asarray(x_out)[..., 128:]).max() < 1e-4


def test_freq_filter_window_shapes():
    freqs = np.fft.rfftfreq(256, 0.25e-3)
    for ftype, ff in [("lowpass", [800, 1000]), ("highpass", [100, 200]),
                      ("bandpass", [100, 200, 800, 1000])]:
        win = spectral.freq_filter_window(freqs, ff, ftype)
        assert win.shape == freqs.shape
        assert win.min() >= 0 and win.max() <= 1
    lp = spectral.freq_filter_window(freqs, [800, 1000], "lowpass")
    assert lp[freqs < 800].min() == 1.0
    assert lp[freqs > 1000].max() == 0.0
    hp = spectral.freq_filter_window(freqs, [100, 200], "highpass")
    assert hp[freqs < 100].max() == 0.0
    assert hp[freqs > 200].min() == 1.0


def test_lowpass_filter_and_drop_roundtrip():
    """Lowpass + drop bins; inversion pads bins back and reconstructs the
    lowpassed signal."""
    n, dt = 256, 0.25e-3
    t = 0.0 + np.arange(n) * dt
    # bin-aligned tones (bins 20 and 96 of 256 @ 4 kHz) to avoid leakage
    x = (np.sin(2 * np.pi * 312.5 * t) + np.sin(2 * np.pi * 1500 * t)).astype(np.float32)[None, :]
    spec = spectral.forward_fft(x, t)
    filt = spectral.apply_freq_filter(spec, [600, 800], "lowpass", drop_filtered=True)
    assert filt.data.shape[-1] < spec.data.shape[-1]
    assert filt.nfft == spec.nfft
    twt_out, x_out = spectral.inverse_fft_original(filt)
    x_out = np.asarray(x_out)
    # the 300 Hz component survives, the 1500 Hz one is gone
    ref_low = np.sin(2 * np.pi * 312.5 * t)[None, :]
    err = np.abs(x_out - ref_low).max()
    assert err < 0.05, err


def test_complex_fullfft_path():
    x, twt = make_traces(n=128)
    spec = spectral.forward_fft(x, twt, real=False)
    assert spec.freqs.size == 128
    twt_out, x_out = spectral.inverse_fft_original(spec)
    np.testing.assert_allclose(np.asarray(x_out), x, rtol=1e-3, atol=1e-4)


def test_freq_filter_window_full_fft_hermitian():
    """Full-fft (fftfreq-ordered, negative bins) windows act on |f| and
    preserve Hermitian symmetry (regression: positional construction broke
    on non-ascending freq layouts)."""
    freqs = np.fft.fftfreq(64, 0.01)  # fs=100 Hz, ordering [0..+50, -50..-df]
    win = spectral.freq_filter_window(freqs, [10.0, 20.0], "lowpass")
    assert win[np.abs(freqs) < 10].min() == 1.0
    assert win[np.abs(freqs) > 20].max() == 0.0
    # symmetric in ±f
    for k in range(1, 32):
        np.testing.assert_allclose(win[k], win[64 - k], atol=1e-7)


def test_wavelet_transform_odd_shapes():
    """WAVELET POCS pads odd/indivisible slices internally (regression)."""
    from pseudo_3d_interpolation_tpu.models import POCSConfig, WaveletTransform, pocs_interpolate_numpy

    rng = np.random.default_rng(150)
    x = rng.normal(size=(3, 45, 53)).astype(np.float32)
    mask = (rng.uniform(size=(45, 53)) < 0.6).astype(np.float32)
    cfg = POCSConfig(niter=6, p_min=1e-3, transform_kind="WAVELET")
    rec, n_it, _ = pocs_interpolate_numpy(x * mask, mask, cfg,
                                          transform=WaveletTransform("db2"))
    assert rec.shape == x.shape
    assert np.isfinite(rec).all()


def test_forward_fft_validates_upsample():
    import pytest

    from pseudo_3d_interpolation_tpu.ops.spectral import forward_fft

    x = np.random.default_rng(0).normal(size=(2, 16)).astype(np.float32)
    twt = np.arange(16) * 1e-3
    for bad in (1.5, 0, -2):
        with pytest.raises(ValueError, match="upsample"):
            forward_fft(x, twt, upsample=bad)
