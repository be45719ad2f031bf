"""Stage-1 step tests on synthetic profiles."""

import numpy as np
import pandas as pd
import pytest

from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy
from pseudo_3d_interpolation_tpu.pipeline import stage1


def ricker(t, f0=200.0):
    a = (np.pi * f0 * t) ** 2
    return (1 - 2 * a) * np.exp(-a)


def make_profile(path, ntr=80, ns=400, dt_us=250, delrt_ms=20, seafloor_ms=None,
                 seed=0, times_start="2023-05-01T10:00:00", x0=0.0, y0=0.0,
                 heading=(1.0, 0.0), spacing=5.0, extra_headers=None, data=None):
    rng = np.random.default_rng(seed)
    dt_ms = dt_us / 1000.0
    if data is None:
        data = rng.normal(0, 0.02, (ntr, ns)).astype(np.float32)
        t_axis = np.arange(ns) * dt_ms
        if seafloor_ms is None:
            seafloor_ms = np.full(ntr, 40.0)
        for i in range(ntr):
            d_ms = delrt_ms[i] if np.ndim(delrt_ms) else delrt_ms
            data[i] += ricker((t_axis - (seafloor_ms[i] - d_ms)) * 1e-3).astype(np.float32)
    t0 = np.datetime64(times_start)
    times = t0 + np.arange(ntr) * np.timedelta64(1, "s")
    dt64 = pd.DatetimeIndex(times)
    xs = x0 + np.arange(ntr) * spacing * heading[0]
    ys = y0 + np.arange(ntr) * spacing * heading[1]
    headers = {
        "SourceX": np.rint(xs * 100).astype(np.int64),
        "SourceY": np.rint(ys * 100).astype(np.int64),
        "SourceGroupScalar": -100,
        "CoordinateUnits": 1,
        "DelayRecordingTime": np.asarray(delrt_ms) if np.ndim(delrt_ms) else delrt_ms,
        "YearDataRecorded": dt64.year.values,
        "DayOfYear": dt64.dayofyear.values,
        "HourOfDay": dt64.hour.values,
        "MinuteOfHour": dt64.minute.values,
        "SecondOfMinute": dt64.second.values,
    }
    headers.update(extra_headers or {})
    write_segy(path, data, headers=headers, fmt=5, dt_us=dt_us)
    return data


def test_despike(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    data = make_profile(p, seed=1)
    # plant strong spikes
    with SegyFile(p) as f:
        d = f.trace_data()
    d[10, 100] = 50.0
    d[40, 250:253] = -40.0
    with SegyFile(p) as _f:
        raw_headers = _f.trace_headers_raw()
    write_segy(p, d, raw_trace_headers=raw_headers, fmt=5, dt_us=250)
    outs = stage1.despike(p, window=(9, 5), threshold=5.0)
    with SegyFile(outs[0]) as f:
        clean = f.trace_data()
        assert "DESPIKE" in f.text
    assert abs(clean[10, 100]) < 1.0
    assert np.abs(clean[40, 250:253]).max() < 1.0
    # the vast majority of samples stay untouched (noise extremes may also
    # trip the detector, as in the reference)
    changed = np.abs(clean - d) > 1e-5
    assert changed.mean() < 0.01


def test_delrt_pad(tmp_path):
    p1 = str(tmp_path / "a_UTM.sgy")
    p2 = str(tmp_path / "b_UTM.sgy")
    make_profile(p1, delrt_ms=20, seed=2)
    make_profile(p2, delrt_ms=30, seed=3, times_start="2023-05-01T11:00:00")
    outs = stage1.delrt_pad(str(tmp_path))
    with SegyFile(outs[0]) as f1, SegyFile(outs[1]) as f2:
        assert f1.n_samples == f2.n_samples
        assert (f1.header("DelayRecordingTime") == 20).all()
        assert (f2.header("DelayRecordingTime") == 20).all()
        d2 = f2.trace_data()
        # the 30ms file should be zero for the first 10ms (40 samples)
        assert np.abs(d2[:, :40]).max() == 0


def test_delrt_correct(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    ntr = 80
    # all traces recorded identically (true delrt 20 ms) but some headers
    # wrongly claim 0 ms — the classic broken-logger case
    data = make_profile(str(tmp_path / "tmp.sgy"), ntr=ntr, delrt_ms=20, seed=4)
    delrt = np.full(ntr, 20)
    delrt[30:35] = 0
    make_profile(p, ntr=ntr, delrt_ms=delrt, seed=4, data=data)
    outs = stage1.delrt_correct(p, win_samples=200)
    with SegyFile(outs[0]) as f:
        fixed = f.header("DelayRecordingTime")
    # the wrong traces should be re-based to ~20
    assert np.abs(fixed[30:35] - 20).max() <= 2
    assert (fixed[:30] == 20).all()


def test_static_correction(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    ntr = 120
    smooth_floor = 40.0 + 3.0 * np.sin(np.linspace(0, 2 * np.pi, ntr))
    rng = np.random.default_rng(5)
    jitter = rng.integers(-4, 5, ntr) * 0.25  # heave jitter in ms
    make_profile(p, ntr=ntr, seafloor_ms=smooth_floor + jitter, seed=5)
    outs = stage1.static_correct(p, mode="amp", savgol_window=31)
    with SegyFile(outs[0]) as f:
        corrected = f.trace_data()
        statics = f.header("TotalStaticApplied")
        assert "STATIC" in f.text
    # after correction the first-break picks should be smoother
    from pseudo_3d_interpolation_tpu.ops import filters as flt

    picks = flt.detect_seafloor_reflection(corrected.T, win=15,
                                           post_detection_filter=False)
    rough_before = np.abs(np.diff(jitter / 0.25)).mean()
    rough_after = np.abs(np.diff(picks)).mean()
    assert rough_after < rough_before
    assert statics.any()
    import os

    assert os.path.exists(outs[0].replace(".sgy", ".sta"))


def test_tide_compensation(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, seed=6)
    tide_csv = str(tmp_path / "tide.csv")
    pd.DataFrame({
        "datetime": pd.date_range("2023-05-01T09:00:00", periods=10, freq="900s"),
        "height": np.linspace(-1.0, 1.0, 10),
    }).to_csv(tide_csv, index=False)
    outs = stage1.tide_compensate(p, tide_csv)
    with SegyFile(outs[0]) as f:
        assert "TIDE" in f.text
    tid = pd.read_csv(outs[0].replace(".sgy", ".tid"))
    assert tid["shift_samples"].abs().max() >= 1
    assert (tid["tide_m"].diff().dropna() > 0).all()  # rising tide


def test_mistie_network(tmp_path):
    """Two crossing lines; line B recorded 2 ms deeper -> solver splits the
    mistie between them (gauge: zero mean)."""
    dt_ms = 0.25
    floor = 40.0
    pa = str(tmp_path / "A_UTM.sgy")
    pb = str(tmp_path / "B_UTM.sgy")
    make_profile(pa, ntr=60, seafloor_ms=np.full(60, floor), seed=7,
                 x0=0, y0=50, heading=(1, 0), spacing=5)
    make_profile(pb, ntr=60, seafloor_ms=np.full(60, floor + 2.0), seed=8,
                 x0=150, y0=0, heading=(0, 1), spacing=5,
                 times_start="2023-05-01T12:00:00")
    outs = stage1.mistie_correct(str(tmp_path), min_correlation=0.3)
    import os

    mst = pd.read_csv(os.path.join(str(tmp_path), "misties.csv"))
    assert len(mst) >= 1
    assert abs(abs(mst["mistie_ms"].iloc[0]) - 2.0) <= 2 * dt_ms
    # applied shifts should reduce the measured mistie to ~0
    profiles = {}
    for p in outs:
        with SegyFile(p) as f:
            from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates

            x, y, _ = scale_coordinates(f)
            profiles[p] = dict(nav=np.column_stack([x, y]), data=f.trace_data(),
                               delrt=f.header("DelayRecordingTime").astype(float),
                               dt_ms=f.dt_us / 1000.0)
    df2, _ = stage1.compute_misties(profiles, min_correlation=0.3)
    assert abs(df2["mistie_ms"].iloc[0]) <= 2 * dt_ms


def test_merge(tmp_path):
    big = str(tmp_path / "big_UTM.sgy")
    small = str(tmp_path / "small_UTM.sgy")
    make_profile(big, ntr=80, seed=9, times_start="2023-05-01T10:00:00")
    # contiguous recording (no gap -> no zero-trace insertion)
    make_profile(small, ntr=5, seed=10, times_start="2023-05-01T10:01:20",
                 x0=400.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    merged = [o for o in outs if "merged" in o]
    assert len(merged) == 1
    with SegyFile(merged[0]) as f:
        assert f.n_traces == 85
        assert "MERGE" in f.text
    import os

    assert os.path.exists(merged[0].replace(".sgy", ".parts"))


def test_reproject_roundtrip(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, x0=500000.0, y0=6000000.0, seed=11)
    out1 = stage1.reproject(p, 32632, 4326)[0]
    with SegyFile(out1) as f:
        # geographic output is CoordinateUnits=2 milli-arc-seconds (not
        # degrees quantized by a length scalar)
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates
        assert int(f.header("CoordinateUnits")[0]) == 2
        lon, lat, units = scale_coordinates(f)
    assert units == 2
    assert 8.9 < lon[0] < 9.1 and 54.0 < lat[0] < 54.3
    out2 = stage1.reproject(out1, 4326, 32632)[0]
    with SegyFile(out2) as f:
        x = f.header("SourceX") / 100.0
    assert abs(x[0] - 500000.0) < 600  # dominated by the -100 scalar rounding


def test_merge_fills_data_gaps(tmp_path):
    """A recording gap between merged files gets zero traces with
    interpolated coordinates and dead-trace codes."""
    big = str(tmp_path / "big_UTM.sgy")
    small = str(tmp_path / "small_UTM.sgy")
    # 1 s shot interval; second file starts 6 s after the first ends -> 5 missing
    make_profile(big, ntr=60, seed=20, times_start="2023-05-01T10:00:00",
                 x0=0.0)
    make_profile(small, ntr=5, seed=21, times_start="2023-05-01T10:01:05",
                 x0=65 * 5.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    merged = [o for o in outs if "merged" in o][0]
    with SegyFile(merged) as f:
        assert f.n_traces == 60 + 5 + 5
        codes = f.header("TraceIdentificationCode")
        assert (codes == 2).sum() == 5  # inserted dead traces
        data = f.trace_data()
        assert np.abs(data[codes == 2]).max() == 0
        # interpolated coordinates are monotonic across the gap
        x = f.header("SourceX")
        assert (np.diff(x.astype(np.int64)) > 0).all()


def test_batch_continues_past_corrupt_file(tmp_path):
    """A corrupt SEG-Y in the batch is reported, others still process."""
    good = str(tmp_path / "good_UTM.sgy")
    make_profile(good, seed=30)
    bad = str(tmp_path / "bad_UTM.sgy")
    with open(bad, "wb") as f:
        f.write(b"not a segy file" * 10)
    outs = stage1.despike(str(tmp_path))
    assert len(outs) == 1
    assert "good" in outs[0]


def test_tide_sign_removes_tidal_depth_error(tmp_path):
    """Regression: high tide records the seafloor DEEPER; compensation must
    shift traces up so the seafloor returns to its true TWT."""
    p = str(tmp_path / "prof_UTM.sgy")
    ntr = 80
    tide_m = np.linspace(0.0, 1.5, ntr)  # rising tide during the line
    dt_ms = 0.25
    tide_ms = 2.0 * tide_m / 1500.0 * 1e3  # extra two-way time
    make_profile(p, ntr=ntr, seafloor_ms=40.0 + tide_ms, seed=40)
    tide_csv = str(tmp_path / "tide.csv")
    pd.DataFrame({
        "datetime": pd.date_range("2023-05-01T10:00:00", periods=ntr, freq="1s"),
        "height": tide_m,
    }).to_csv(tide_csv, index=False)
    outs = stage1.tide_compensate(p, tide_csv)
    with SegyFile(outs[0]) as f:
        corrected = f.trace_data()
    peaks = np.argmax(np.abs(corrected[:, :200]), axis=1) * dt_ms + 20.0
    # without compensation the last traces sit ~2 ms deep; after, ~40 ms flat
    assert abs(peaks[-1] - 40.0) <= 2 * dt_ms, peaks[-5:]
    assert np.abs(peaks - 40.0).max() <= 3 * dt_ms


def test_merge_across_year_boundary_no_fabricated_gap(tmp_path):
    """Regression: Dec 31 -> Jan 1 recording must not fabricate a day gap."""
    a = str(tmp_path / "a_UTM.sgy")
    b = str(tmp_path / "b_UTM.sgy")
    make_profile(a, ntr=60, seed=31, times_start="2023-12-31T23:59:00")
    make_profile(b, ntr=5, seed=32, times_start="2024-01-01T00:00:00", x0=400.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    merged = [o for o in outs if "merged" in o][0]
    with SegyFile(merged) as f:
        # 60 + 5 traces, no fabricated zero traces
        assert f.n_traces == 65
        assert (f.header("TraceIdentificationCode") != 2).all()


def test_static_clipping_options():
    rng = np.random.default_rng(50)
    horizon = 100 + rng.normal(0, 2, 200)
    horizon[50] = 160  # big outlier handled by robust prefilter anyway
    s_plain = stage1.compute_static(horizon, 0.25)
    s_pct = stage1.compute_static(horizon, 0.25, clip_percentile=80)
    s_mad = stage1.compute_static(horizon, 0.25, clip_mad=2.0)
    s_hard = stage1.compute_static(horizon, 0.25, clip_samples=1)
    assert np.abs(s_hard).max() <= 1
    assert np.abs(s_pct).max() <= np.abs(s_plain).max()
    assert np.abs(s_mad - np.median(s_plain)).max() <= np.abs(s_plain - np.median(s_plain)).max()


def test_merge_preserves_high_rate_traces(tmp_path):
    """Regression: traces sharing the same 1-s timestamp + position are real
    data (high ping rate / stationary vessel), not duplicates — dedup must
    key on full header equality."""
    big = str(tmp_path / "big_UTM.sgy")
    small = str(tmp_path / "small_UTM.sgy")
    # stationary vessel: same coordinates for all traces, 1 Hz headers with
    # 4 traces per second would alias — emulate by equal SourceX + same time
    data = make_profile(big, ntr=80, seed=60, times_start="2023-05-01T10:00:00",
                        spacing=0.0)  # all traces same position
    make_profile(small, ntr=5, seed=61, times_start="2023-05-01T10:01:20",
                 x0=0.0, spacing=0.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    merged = [o for o in outs if "merged" in o][0]
    with SegyFile(merged) as f:
        assert f.n_traces == 85  # nothing dropped


def test_despike_chunked_matches_unchunked():
    """The haloed trace-block path must equal the one-shot path."""
    rng = np.random.default_rng(70)
    data = rng.normal(0, 0.1, (200, 120)).astype(np.float32)
    data[50, 30] = 20.0
    data[100, 90] = -15.0
    c1, s1 = stage1.despike_section(data, window=(9, 5), threshold=5.0)
    # force tiny blocks (a few traces each)
    c2, s2 = stage1.despike_section(data, window=(9, 5), threshold=5.0,
                                    max_bytes=200 * 9 * 5 * 4 * 30)
    np.testing.assert_allclose(c2, c1, rtol=1e-6)
    np.testing.assert_array_equal(s2, s1)


def test_despike_shape_bucketing_is_exact():
    """Bucketing the (samples, traces) axes up to (128, 64) multiples must
    not change any output value: the extension's first r entries mirror
    the true edge exactly like the kernel's own reflect pad."""
    rng = np.random.default_rng(72)
    base = rng.normal(0, 0.1, (256, 128)).astype(np.float32)
    base[64, 17] = 30.0
    base[200, 126] = -25.0  # spike near the trace edge
    base[254, 60] = 18.0    # spike near the sample edge
    c_ref, s_ref = stage1.despike_section(base, window=(9, 5), threshold=5.0)
    # odd sub-shape: (250, 119) pads to (384, 128) internally
    sub = np.ascontiguousarray(base[:250, :119])
    c, s = stage1.despike_section(sub, window=(9, 5), threshold=5.0)
    assert c.shape == sub.shape
    # interior (windows never see either true edge): bucketed result of the
    # sub-section equals the big section's values there
    np.testing.assert_allclose(c[4:246, 2:117], c_ref[4:246, 2:117], rtol=1e-6)
    np.testing.assert_array_equal(s[4:246, 2:117], s_ref[4:246, 2:117])
    # edge exactness: unbucketed shapes (multiples already) vs a manually
    # reflected-then-trimmed equivalent
    c3, s3 = stage1.despike_section(sub, window=(9, 5), threshold=5.0,
                                    max_bytes=250 * 9 * 5 * 4 * 40)
    np.testing.assert_allclose(c3, c, rtol=1e-6)
    np.testing.assert_array_equal(s3, s)


def test_segment_intersections_chunked_matches_unchunked():
    rng = np.random.default_rng(71)
    a = np.column_stack([np.linspace(0, 100, 300),
                         50 + rng.normal(0, 0.5, 300)])
    b = np.column_stack([50 + rng.normal(0, 0.5, 250),
                         np.linspace(0, 100, 250)])
    full = stage1._segment_intersections(a, b, chunk=10_000)
    small = stage1._segment_intersections(a, b, chunk=64)
    assert len(full) == len(small) >= 1
    pts_f = sorted((round(p[0][0], 6), round(p[0][1], 6)) for p in full)
    pts_s = sorted((round(p[0][0], 6), round(p[0][1], 6)) for p in small)
    assert pts_f == pts_s


def test_merge_splits_ragged_sample_counts(tmp_path):
    """Files with different n_samples in one temporal group must not crash
    the merge — the group splits into conforming runs (ADVICE r1)."""
    big = str(tmp_path / "big_UTM.sgy")
    small = str(tmp_path / "small_UTM.sgy")
    make_profile(big, ntr=80, ns=400, seed=80, times_start="2023-05-01T10:00:00")
    make_profile(small, ntr=5, ns=300, seed=81,
                 times_start="2023-05-01T10:01:20", x0=400.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    # no merged output (shapes differ), both originals pass through untouched
    assert len(outs) == 2
    assert not any("merged" in o for o in outs)


def test_merge_gap_fillers_get_interpolated_timestamps(tmp_path):
    """Inserted zero traces must carry interpolated recording times, not a
    copy of the previous trace's timestamp (ADVICE r1)."""
    big = str(tmp_path / "big_UTM.sgy")
    small = str(tmp_path / "small_UTM.sgy")
    make_profile(big, ntr=60, seed=82, times_start="2023-05-01T10:00:00", x0=0.0)
    make_profile(small, ntr=5, seed=83, times_start="2023-05-01T10:01:05",
                 x0=65 * 5.0)
    outs = stage1.merge_small_files(str(tmp_path), min_kb=40.0, max_gap_s=120.0)
    merged = [o for o in outs if "merged" in o][0]
    with SegyFile(merged) as f:
        codes = f.header("TraceIdentificationCode")
        mins = f.header("MinuteOfHour").astype(int)
        secs = f.header("SecondOfMinute").astype(int)
    t = mins * 60 + secs
    assert (codes == 2).sum() == 5
    # whole timeline (including fillers) is strictly increasing at 1 s
    assert (np.diff(t) == 1).all(), t[55:70]


def test_delrt_offset_trace_case(tmp_path):
    """Reference offset-trace special case (delrt_correction_segy.py:195-242):
    a genuine delrt change whose header flip lags the data change by one
    trace — the boundary trace was recorded with the NEW delay but still
    carries the OLD header. It must snap to the new delay; the genuine
    change itself must survive untouched."""
    p = str(tmp_path / "prof_UTM.sgy")
    ntr, k = 60, 30  # data changes at trace k, header changes at k+1
    dt_ms = 0.25
    true_floor_ms = 40.0  # flat in absolute TWT
    recorded_delrt = np.where(np.arange(ntr) < k, 20.0, 30.0)  # actual recording
    header_delrt = np.where(np.arange(ntr) < k + 1, 20, 30)    # lagging header
    # seafloor position inside each trace window follows the RECORDED delay
    make_profile(p, ntr=ntr, delrt_ms=recorded_delrt, seed=77,
                 seafloor_ms=np.full(ntr, true_floor_ms))
    # overwrite the header with the lagging flip
    with SegyFile(p) as f:
        d = f.trace_data()
        raw = f.trace_headers_raw().copy()
        txt = f.text
    from pseudo_3d_interpolation_tpu.io.segy import TRACE_HEADER_FIELDS, write_segy

    off, dtc = TRACE_HEADER_FIELDS["DelayRecordingTime"]
    size = int(dtc[-1])
    for t in range(ntr):
        raw[t, off - 1 : off - 1 + size] = (
            np.array([header_delrt[t]], ">" + dtc).view(np.uint8))
    write_segy(p, d, raw_trace_headers=raw, text=txt, fmt=5, dt_us=250)

    outs = stage1.delrt_correct(p)
    with SegyFile(outs[0]) as f:
        fixed = f.header("DelayRecordingTime").astype(int)
    expect = recorded_delrt.astype(int)
    np.testing.assert_array_equal(fixed, expect)


def test_delrt_genuine_change_untouched(tmp_path):
    """A clean, aligned delrt change is a real recording change — the
    correction must not rewrite anything."""
    p = str(tmp_path / "prof_UTM.sgy")
    ntr, k = 60, 30
    delrt = np.where(np.arange(ntr) < k, 20.0, 30.0)
    make_profile(p, ntr=ntr, delrt_ms=delrt, seed=78,
                 seafloor_ms=np.full(ntr, 40.0))
    outs = stage1.delrt_correct(p)
    with SegyFile(outs[0]) as f:
        fixed = f.header("DelayRecordingTime").astype(int)
    np.testing.assert_array_equal(fixed, delrt.astype(int))


def test_despike_bucketing_reuses_compilation():
    """Two sections with different trace counts in the same (128, 64)
    bucket must hit one compiled kernel (the per-file recompile fix)."""
    rng = np.random.default_rng(73)
    stage1._despike_kernel.clear_cache()
    a = rng.normal(0, 0.1, (200, 50)).astype(np.float32)
    b = rng.normal(0, 0.1, (190, 62)).astype(np.float32)
    stage1.despike_section(a, window=(9, 5))
    n1 = stage1._despike_kernel._cache_size()
    stage1.despike_section(b, window=(9, 5))
    assert stage1._despike_kernel._cache_size() == n1 == 1


def test_shift_traces_bucketing_exact():
    """Zero-pad shape bucketing of the shift kernel is exact incl. negative
    shifts reaching past the true trace end."""
    rng = np.random.default_rng(74)
    data = rng.normal(size=(37, 130)).astype(np.float32)
    shifts = rng.integers(-9, 9, 37)
    out = stage1._shift_traces(data, shifts)
    assert out.shape == data.shape
    for i, s in enumerate(shifts):
        expect = np.zeros(130, np.float32)
        if s >= 0:
            expect[s:] = data[i, : 130 - s]
        else:
            expect[:s] = data[i, -s:]
        np.testing.assert_allclose(out[i], expect)


def test_despike_tiny_section_extension_exact():
    """_extend_windowed_axis at n == r+1 must produce a full-length array
    with a real mirror (slice(n-2, -1, -1) used to yield an EMPTY mirror
    and an array r short of the reported length)."""
    a = np.arange(12, dtype=np.float32).reshape(4, 3)  # 3 traces, rx=2 edge
    ext, n = stage1._extend_windowed_axis(a, 1, 64, 2)
    assert ext.shape[1] == n == 64
    np.testing.assert_array_equal(ext[:, 3], a[:, 1])  # mirror of col 1
    np.testing.assert_array_equal(ext[:, 4], a[:, 0])  # mirror of col 0
    # and the public path on a 3-trace section matches numpy reflect stats
    rng = np.random.default_rng(5)
    d = rng.normal(0, 0.1, (64, 3)).astype(np.float32)
    d[30, 1] = 25.0
    c, s = stage1.despike_section(d, window=(9, 5), threshold=5.0)
    assert c.shape == d.shape and s[30, 1]


def test_reproject_accepts_wkt_and_proj_specs(tmp_path):
    """reproject() takes any parse_crs spec (reference: any pyproj CRS,
    reproject_segy.py:73-169) — WKT source, proj-string destination."""
    wkt_utm32 = (
        'PROJCS["WGS 84 / UTM zone 32N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",9],'
        'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, x0=500000.0, y0=6000000.0, seed=11)
    out = stage1.reproject(p, wkt_utm32, "+proj=longlat +datum=WGS84")[0]
    with SegyFile(out) as f:
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates
        lon, lat, units = scale_coordinates(f)
        assert "WKT:WGS 84 / UTM zone 32N" in f.text
    assert units == 2
    assert 8.9 < lon[0] < 9.1 and 54.0 < lat[0] < 54.3


def test_reproject_cli_wkt_file(tmp_path):
    """p3d reproject --src-epsg @file.wkt --dst-epsg EPSG:4326."""
    from pseudo_3d_interpolation_tpu.cli import main as cli_main

    wkt_utm32 = (
        'PROJCS["WGS 84 / UTM zone 32N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",9],'
        'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')
    wf = tmp_path / "src.wkt"
    wf.write_text(wkt_utm32)
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, x0=500000.0, y0=6000000.0, seed=11)
    rc = cli_main(["reproject", p, "--src-epsg", f"@{wf}",
                   "--dst-epsg", "EPSG:4326"])
    assert rc == 0
    out = p.replace(".sgy", "_reproj.sgy")
    with SegyFile(out) as f:
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates
        lon, _, units = scale_coordinates(f)
    assert units == 2 and 8.9 < lon[0] < 9.1


# ---------------------------------------------------------------------------
# round-3 option depth (reference flag parity)
# ---------------------------------------------------------------------------
def test_despike_replace_scaled_and_mode():
    rng = np.random.default_rng(9)
    data = rng.normal(0, 0.1, (300, 40)).astype(np.float32)
    data[100, 10] = 30.0
    for replace in ("scaled", "mode"):
        cleaned, spikes = stage1.despike_section(data, window=(9, 5),
                                                 threshold=5.0, mode="median",
                                                 replace=replace)
        assert spikes[100, 10]
        # spike pulled down to background magnitude, sign logic per mode
        assert abs(cleaned[100, 10]) < 1.0
        # non-spikes untouched
        keep = ~spikes
        np.testing.assert_array_equal(cleaned[keep], data[keep])


def test_despike_window_time_overrides_samples(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, seed=11)
    with SegyFile(p) as f:
        d = f.trace_data()
    d[10, 100] = 50.0
    with SegyFile(p) as _f:
        raw_headers = _f.trace_headers_raw()
    write_segy(p, d, raw_trace_headers=raw_headers,
               fmt=5, dt_us=250)
    # 2.5 ms at dt=0.25 ms -> 11-sample window (odd-forced)
    outs = stage1.despike(p, window=(9, 5), threshold=5.0, window_time_ms=2.5)
    with SegyFile(outs[0]) as f:
        assert abs(f.trace_data()[10, 100]) < 50.0


def test_static_limit_depressions():
    ntr = 400
    x = np.linspace(0, 1, ntr)
    horizon = 100 + 20 * x  # gentle trend
    # a pockmark: 15-sample-deep depression across traces 190-210, narrower
    # than the savgol window so the smooth bridges it (a shift the clamp
    # must prevent from flattening real topography)
    pm = slice(190, 211)
    horizon = horizon.copy()
    horizon[pm] += 15 * np.hanning(21)
    static_plain = stage1.compute_static(horizon, 0.25, savgol_window=101,
                                         savgol_order=3, clip_samples=None,
                                         clip_percentile=None)
    static_lim = stage1.compute_static(horizon, 0.25, savgol_window=101,
                                       savgol_order=3, clip_samples=None,
                                       clip_percentile=None,
                                       limit_depressions=(10, 10, 3))
    # without the clamp, the savgol smooth tries to fill the depression
    assert np.abs(static_plain[pm]).max() >= 10
    # with it, shifts over the depression are held to the center limit
    assert np.abs(static_lim[pm]).max() <= 3
    # far-field statics unaffected
    np.testing.assert_array_equal(static_lim[:100], static_plain[:100])


def test_static_write_seafloor2trace(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    ntr = 80
    make_profile(p, ntr=ntr, seafloor_ms=np.full(ntr, 40.0), seed=13)
    # explicit picker windows: the 400-sample traces put the seafloor
    # inside the default nlta..2nlta threshold window
    outs = stage1.static_correct(p, mode="amp", write_seafloor2trace=True,
                                 write_aux_file=False, nsta=4, nlta=30)
    with SegyFile(outs[0]) as f:
        twt_ns = f.header("UnassignedInt2").astype(np.int64)
        scal = f.header("UnassignedInt1").astype(np.int64)
        assert "SEAFLOOR (byte:237" in f.text
    assert (scal == -1000).all()
    # picked seafloor TWT should be ~40 ms (stored as ms x 1000)
    assert np.abs(twt_ns / 1000.0 - 40.0).max() < 3.0
    import os
    assert not os.path.exists(outs[0].replace(".sgy", ".sta"))


def test_mistie_win_cc_and_toggles(tmp_path):
    # two crossing lines (as in test_mistie_network) with win_cc covering
    # the seafloor; results equal the unwindowed solve on this clean data
    pa = str(tmp_path / "a_UTM.sgy")
    pb = str(tmp_path / "b_UTM.sgy")
    make_profile(pa, ntr=60, x0=0, y0=100, heading=(1, 0), seed=21,
                 seafloor_ms=np.full(60, 42.0))
    make_profile(pb, ntr=60, x0=150, y0=0, heading=(0, 1), seed=22,
                 seafloor_ms=np.full(60, 44.0))
    outs = stage1.mistie_correct(str(tmp_path), win_cc_ms=(20.0, 80.0),
                                 write_aux_file=False, write_qc=False)
    assert len(outs) == 2
    import glob
    import os
    for o in outs:
        assert not os.path.exists(o.replace(".sgy", ".mst"))
    # write_qc gates only the GEO layers; the tabular per-intersection
    # record is the primary mistie artifact and always lands
    assert not os.path.exists(str(tmp_path / "misties.geojson"))
    assert not glob.glob(str(tmp_path / "*.gpkg"))
    assert os.path.exists(str(tmp_path / "misties.csv"))


def test_reproject_dst_coords_group(tmp_path):
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, seed=31, x0=500000, y0=6000000)
    outs = stage1.reproject(p, 32632, 4326, dst_coords="group")
    with SegyFile(outs[0]) as f:
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates

        gx = f.header("GroupX")
        # the scalar/units fields are GLOBAL: the pair the coordinates were
        # READ from must stay decodable too — it is re-encoded with the
        # transformed values, not left as stale UTM ints that would decode
        # as fake degrees downstream (tide/mistie/nav read these bytes)
        slon, slat, units = scale_coordinates(f, (73, 77))
        glon, glat, _ = scale_coordinates(f, (81, 85))
    assert (gx != 0).any()
    assert units == 2
    assert 8.9 < slon[0] < 9.1 and 54.0 < slat[0] < 54.3
    np.testing.assert_allclose(slon, glon)
    np.testing.assert_allclose(slat, glat)


def test_reproject_group_bytes_writes_back_to_group(tmp_path):
    """Reading group coordinates (bytes 81/85) must write the reprojected
    values back to GroupX/GroupY, not clobber SourceX/SourceY and leave the
    read fields stale under the new global scalar (review round-3)."""
    p = str(tmp_path / "prof_UTM.sgy")
    xs = 500000.0 + np.arange(80) * 5.0
    make_profile(p, x0=500000.0, y0=6000000.0, seed=12, extra_headers={
        "GroupX": np.rint(xs * 100).astype(np.int64),
        "GroupY": np.rint(np.full(80, 6000000.0) * 100).astype(np.int64),
    })
    with SegyFile(p) as f:
        src_x_before = f.header("SourceX").copy()
    out = stage1.reproject(p, 32632, 4326, coords_bytes=(81, 85))[0]
    with SegyFile(out) as f:
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates
        lon, lat, units = scale_coordinates(f, (81, 85))
        assert units == 2
        assert 8.9 < lon[0] < 9.1 and 54.0 < lat[0] < 54.3
        # the scalar/units fields are GLOBAL: the populated source pair is
        # re-encoded consistently (transformed to the new units) rather
        # than left as stale raw ints that now decode wrong
        slon, slat, _ = scale_coordinates(f, (73, 77))
        assert 8.9 < slon[0] < 9.1 and 54.0 < slat[0] < 54.3
        assert not np.array_equal(f.header("SourceX"), src_x_before)

    # 'auto' scalar resolves via check_coordinate_scalar; garbage rejected
    stage1.reproject(p, 32632, 4326, scalar="auto")
    with pytest.raises(ValueError, match="scalar"):
        stage1.reproject(p, 32632, 4326, scalar=-3)


def test_mistie_qc_gpkg_declares_undefined_srs(tmp_path):
    """Header coordinates are in the survey's (unknown, usually projected)
    CRS — the QC GeoPackage must label its layers with the spec's
    undefined-cartesian SRS (-1), not WGS84 degrees (GIS tools would put
    UTM metres at impossible lat/lons)."""
    import glob
    import sqlite3

    pa = str(tmp_path / "A_UTM.sgy")
    pb = str(tmp_path / "B_UTM.sgy")
    make_profile(pa, ntr=60, seafloor_ms=np.full(60, 40.0), seed=7,
                 x0=0, y0=50, heading=(1, 0), spacing=5)
    make_profile(pb, ntr=60, seafloor_ms=np.full(60, 42.0), seed=8,
                 x0=150, y0=0, heading=(0, 1), spacing=5,
                 times_start="2023-05-01T12:00:00")
    stage1.mistie_correct(str(tmp_path), min_correlation=0.3)
    gpkgs = glob.glob(str(tmp_path / "*.gpkg"))
    assert len(gpkgs) == 1
    con = sqlite3.connect(gpkgs[0])
    try:
        srs = {r[0] for r in con.execute(
            "SELECT srs_id FROM gpkg_geometry_columns")}
        assert srs == {-1}
    finally:
        con.close()


# ----------------- regression tests: stage-1 review fixes --------------------
def test_rewrite_preserves_source_binary_header(tmp_path):
    """Stage-1 rewrites keep unmanaged binary-header fields
    (MeasurementSystem, job/line numbers) — the from-scratch header zeroed
    them; a preserved ExtendedHeaders count must NOT survive (this writer
    emits no stanzas)."""
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, seed=40)
    raw = bytearray(open(p, "rb").read())
    # MeasurementSystem=1 (3255, i2), JobID=7 (3201, i4)
    raw[3254:3256] = (1).to_bytes(2, "big")
    raw[3200:3204] = (7).to_bytes(4, "big")
    open(p, "wb").write(bytes(raw))
    outs = stage1.despike(p, window=(9, 5), threshold=5.0)
    with SegyFile(outs[0]) as f:
        assert f.bin["MeasurementSystem"] == 1
        assert f.bin["JobID"] == 7
        assert f.bin["ExtendedHeaders"] == 0


def test_delrt_correct_long_wrong_run(tmp_path):
    """A LONG run of wrong delrt headers is fully corrected: the cascade
    proceeds ~win/2 traces per pass, so the old 3-pass cap left the
    interior wrong and fabricated delrt steps at the frontier."""
    ntr = 200
    data = make_profile(str(tmp_path / "tmp.sgy"), ntr=ntr, delrt_ms=20,
                        seed=41)
    delrt = np.full(ntr, 20)
    delrt[60:120] = 0  # 60-trace wrong run (minority of the profile)
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, ntr=ntr, delrt_ms=delrt, seed=41, data=data)
    outs = stage1.delrt_correct(p, win_samples=200)
    with SegyFile(outs[0]) as f:
        fixed = f.header("DelayRecordingTime")
    assert np.abs(fixed - 20).max() <= 2, np.unique(fixed)


def test_delrt_correct_keeps_genuine_long_segments(tmp_path):
    """Window widening is evidence-gated: a GENUINE delrt change (data
    recorded with the other delay — first breaks continuous) must survive
    untouched even when one segment is long."""
    ntr = 200
    delrt = np.full(ntr, 20)
    delrt[60:120] = 30  # genuine: traces really recorded 10 ms later
    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, ntr=ntr, delrt_ms=delrt, seed=46)
    outs = stage1.delrt_correct(p, win_samples=200)
    with SegyFile(outs[0]) as f:
        fixed = f.header("DelayRecordingTime")
    np.testing.assert_array_equal(fixed, delrt)


def test_segment_intersections_shared_vertex_no_duplicate():
    """A crossing exactly on a polyline's interior vertex must produce ONE
    intersection, not two (double-weighted mistie observation)."""
    a = np.column_stack([np.arange(5, dtype=float), np.zeros(5)])
    b = np.column_stack([np.full(5, 2.0), np.arange(5, dtype=float) - 2.0])
    hits = stage1._segment_intersections(a, b)
    assert len(hits) == 1
    pt = hits[0][0]
    np.testing.assert_allclose(pt, [2.0, 0.0], atol=1e-12)


def test_mistie_mixed_dt_fails_upfront(tmp_path):
    make_profile(str(tmp_path / "A_UTM.sgy"), ntr=20, dt_us=250, seed=42,
                 x0=0, y0=50, heading=(1, 0))
    make_profile(str(tmp_path / "B_UTM.sgy"), ntr=20, dt_us=500, seed=43,
                 x0=50, y0=0, heading=(0, 1),
                 times_start="2023-05-01T12:00:00")
    with pytest.raises(ValueError, match="one sample interval"):
        stage1.mistie_correct(str(tmp_path))


def test_merge_and_delrt_pad_skip_zero_trace_files(tmp_path):
    make_profile(str(tmp_path / "good_UTM.sgy"), ntr=20, seed=44)
    empty = str(tmp_path / "empty_UTM.sgy")
    make_profile(empty, ntr=1, seed=45,
                 times_start="2023-05-01T11:00:00")
    with open(empty, "r+b") as fh:
        fh.truncate(3600)
    outs = stage1.delrt_pad(str(tmp_path))
    assert len(outs) == 1
    outs = stage1.merge_small_files(str(tmp_path), min_kb=1.0)
    assert len(outs) >= 1


def test_byte_delay_nonstandard_field(tmp_path):
    """--byte-delay routes the recording delay to a custom i2 header byte
    (reference delrt_correction_segy.py:45-46 / delrt_padding_segy.py:39-40):
    delrt_pad must READ the delay there and WRITE the re-based delay back to
    the same byte, leaving the standard byte-109 field untouched."""
    delays = np.r_[np.full(40, 20), np.full(40, 60)]
    p = str(tmp_path / "prof.sgy")
    # standard field stays 0; real delay lives at byte 233 (i2)
    make_profile(p, delrt_ms=0, extra_headers={(233, "i2"): delays})
    outs = stage1.delrt_pad(p, byte_delay=233)
    with SegyFile(outs[0]) as f:
        np.testing.assert_array_equal(f.header((233, "i2")),
                                      np.full(80, 20))
        assert (f.header("DelayRecordingTime") == 0).all()
        # padded onto the global axis: 20..(60 + 400*0.25) ms
        assert f.n_samples == int(round((60 + 400 * 0.25 - 20) / 0.25))
        data = f.trace_data()
    # the late-delay half starts 160 samples (40 ms) in
    assert np.abs(data[60, :160]).max() == 0.0
    assert np.abs(data[60, 160:]).max() > 0.0


def test_merge_txt_suffix_names_output(tmp_path):
    """merge --txt-suffix controls the merged filename (reference
    merge_segys.py:174 out_name = f'{basename}_{txt_suffix}{suffix}')."""
    p1 = str(tmp_path / "a.sgy")
    p2 = str(tmp_path / "b.sgy")
    make_profile(p1, ntr=30, times_start="2023-05-01T10:00:00")
    make_profile(p2, ntr=4, times_start="2023-05-01T10:00:31")
    outs = stage1.merge_small_files([p1, p2], min_kb=100.0,
                                    txt_suffix="mrg")
    assert len(outs) == 1 and outs[0].endswith("a_mrg.sgy")
