"""Tests for tidal harmonic prediction and CRS conversions."""

import numpy as np
import pandas as pd
import pytest

from pseudo_3d_interpolation_tpu.utils import crs, tide


# --------------------------- tide -------------------------------------------
def test_m2_period():
    """An M2-only tide must oscillate at 12.4206 h period."""
    times = pd.date_range("2024-03-01", periods=24 * 30 * 6, freq="600s")
    h = tide.predict_tide(times, {"M2": (1.0, 0.0)})
    # dominant FFT period
    spec = np.abs(np.fft.rfft(h - h.mean()))
    freqs = np.fft.rfftfreq(len(h), 600.0)  # Hz
    peak_period_h = 1.0 / freqs[np.argmax(spec)] / 3600.0
    assert abs(peak_period_h - 12.4206) < 0.05
    assert 0.9 < np.max(np.abs(h)) < 1.1


def test_k1_period():
    times = pd.date_range("2024-03-01", periods=24 * 30 * 6, freq="600s")
    h = tide.predict_tide(times, {"K1": (0.5, 30.0)})
    spec = np.abs(np.fft.rfft(h - h.mean()))
    freqs = np.fft.rfftfreq(len(h), 600.0)
    peak_period_h = 1.0 / freqs[np.argmax(spec)] / 3600.0
    assert abs(peak_period_h - 23.9345) < 0.2


def test_spring_neap_beat():
    """M2+S2 beat at the 14.77-day spring/neap cycle."""
    times = pd.date_range("2024-01-01", periods=24 * 6 * 60, freq="600s")
    h = tide.predict_tide(times, {"M2": (1.0, 0.0), "S2": (0.4, 0.0)})
    # envelope over daily windows
    daily_max = pd.Series(np.abs(h)).groupby(np.arange(len(h)) // (24 * 6)).max()
    assert daily_max.max() > 1.25  # springs: constructive
    assert daily_max.min() < 0.75  # neaps: destructive


def test_mean_level_and_unknown():
    times = pd.date_range("2024-01-01", periods=10, freq="1h")
    h = tide.predict_tide(times, {}, mean_level=2.5)
    np.testing.assert_allclose(h, 2.5)
    with pytest.raises(ValueError, match="unknown constituent"):
        tide.predict_tide(times, {"XX9": (1.0, 0.0)})


def test_tide_table_feeds_compensation(tmp_path):
    df = tide.tide_table("2024-01-01", "2024-01-02", {"M2": (1.0, 0.0)})
    assert {"datetime", "height"} <= set(df.columns)
    assert len(df) == 145


# --------------------------- CRS ---------------------------------------------
def test_utm_roundtrip():
    rng = np.random.default_rng(130)
    lon = 9.0 + rng.uniform(-3, 3, 100)
    lat = rng.uniform(-75, 80, 100)
    e, n = crs.transform(lon, lat, 4326, 32632)
    lon2, lat2 = crs.transform(e, n, 32632, 4326)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_south_false_northing():
    e, n = crs.transform(173.0, -41.0, 4326, 32760)  # NZ, zone 60S
    assert 0 < n < 10000000
    lon2, lat2 = crs.transform(e, n, 32760, 4326)
    np.testing.assert_allclose([lon2, lat2], [173.0, -41.0], atol=1e-9)


def test_zone_params():
    assert crs.utm_zone_params(32632) == (9.0, 0.0)
    assert crs.utm_zone_params(32760) == (177.0, 10000000.0)
    with pytest.raises(ValueError):
        crs.utm_zone_params(25832)


def test_central_meridian_easting():
    e, n = crs.geographic_to_tm(45.0, 9.0, 9.0)
    np.testing.assert_allclose(e, 500000.0, atol=1e-6)


def test_dms():
    np.testing.assert_allclose(crs.dms_to_dd(12, 30, 36), 12.51)
    np.testing.assert_allclose(crs.dms_to_dd(-12, 30, 0), -12.5)
