"""BASELINE config 4 at test scale: the complete workflow — ALL 16 steps —
on synthetic SEG-Y profiles with realistic defects.

Defects injected: a small file to merge back into its line, geographic
(WGS84) coordinates that need reprojection, wrong DelayRecordingTime
headers, a tie line recorded with a different delay (needs padding),
spikes, per-trace heave jitter, a line-wide vertical mistie, a spatially
varying tide, and missing crosslines. The chain must repair all of them and
reconstruct the missing lines:

01 merge -> 02 reproject -> 03 delrt-correct -> 04 delrt-pad -> 05 static
-> 06 tide (atlas) -> 07 mistie -> 08 despike -> [09 segy2cube]
-> 10 binning -> 11 preprocess -> 12 fft -> 13 pocs -> 14 ifft
-> 15 postprocess -> 16 export.
"""

import os
import shutil

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy
from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
from pseudo_3d_interpolation_tpu.ops import metrics
from pseudo_3d_interpolation_tpu.pipeline import stage1
from pseudo_3d_interpolation_tpu.pipeline.binning import BinningGeometry, bin_cube
from pseudo_3d_interpolation_tpu.pipeline.export import cube_to_segy
from pseudo_3d_interpolation_tpu.pipeline.fft import apply_fft
from pseudo_3d_interpolation_tpu.pipeline.ifft import apply_ifft
from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate
from pseudo_3d_interpolation_tpu.pipeline.postprocess import postprocess
from pseudo_3d_interpolation_tpu.pipeline.preprocess import preprocess
from pseudo_3d_interpolation_tpu.utils import crs as crs_lib
from pseudo_3d_interpolation_tpu.utils.tide import TideAtlas

from test_stage1 import make_profile, ricker


def _wgs84_headers(xs, ys):
    """UTM32N meter coordinates -> WGS84 header fields (milli-arcseconds,
    CoordinateUnits=2 — ~3 cm resolution)."""
    lat, lon = crs_lib.tm_to_geographic(np.asarray(xs) + 500000.0,
                                        np.asarray(ys) + 5.9e6, 9.0)
    return {
        "SourceX": np.rint(lon * 3_600_000).astype(np.int64),
        "SourceY": np.rint(lat * 3_600_000).astype(np.int64),
        "SourceGroupScalar": 1,
        "CoordinateUnits": 2,
    }


@pytest.mark.slow
def test_complete_workflow(tmp_path):
    rng = np.random.default_rng(200)
    survey = tmp_path / "survey"
    survey.mkdir()
    n_lines, ntr, ns = 16, 32, 256
    spacing = 10.0
    dt_us = 250

    # ---- synthetic acquisition: parallel lines along y, some missing ------
    acquired = sorted(set([0, n_lines - 1]) | {
        int(i) for i in rng.choice(n_lines, size=int(n_lines * 0.65), replace=False)
    })
    floor_of = lambda i, j: 40.0 + 1.5 * np.sin(0.35 * i) + 1.0 * np.cos(0.3 * j)

    def make_line(path, i, ntr_=ntr, trace0=0, times_start=None, delrt=20,
                  floor_extra=0.0, seed=None):
        j = np.arange(trace0, trace0 + ntr_)
        floor = np.array([floor_of(i, jj) for jj in j]) + floor_extra
        jitter = rng.integers(-3, 4, ntr_) * 0.25  # heave
        xs = 5.0 + i * spacing + 0.0 * j
        ys = 5.0 + j * spacing
        make_profile(
            path, ntr=ntr_, ns=ns, dt_us=dt_us, delrt_ms=delrt,
            seafloor_ms=floor + jitter, seed=seed if seed is not None else 300 + i,
            times_start=times_start or f"2023-05-01T{6 + i:02d}:00:00",
            extra_headers=_wgs84_headers(xs, ys),
        )

    split_line = acquired[2]
    for i in acquired:
        if i == split_line:
            # 01: this line arrives as a big file + a small contiguous tail
            make_line(str(survey / f"line{i:02d}a_UTM.sgy"), i, ntr_=ntr - 6)
            make_line(str(survey / f"line{i:02d}b_UTM.sgy"), i, ntr_=6,
                      trace0=ntr - 6,
                      times_start=f"2023-05-01T{6 + i:02d}:00:{ntr - 6:02d}")
        else:
            make_line(str(survey / f"line{i:02d}_UTM.sgy"), i)
    # one crossing tie line along x with a 1.5 ms mistie AND a different
    # recording delay (04 must pad it onto the global TWT axis)
    tie_i = np.linspace(0, n_lines - 1, 40)
    tie_floor = np.array([floor_of(i, 16) for i in tie_i])
    make_profile(
        str(survey / "tie_UTM.sgy"), ntr=40, ns=ns, dt_us=dt_us, delrt_ms=30,
        seafloor_ms=tie_floor + 1.5, seed=400,
        times_start="2023-05-02T01:00:00",
        extra_headers=_wgs84_headers(5.0 + tie_i * spacing,
                                     np.full(40, 5.0 + 16 * spacing)),
    )

    # 03: corrupt two DelayRecordingTime headers (data untouched)
    delrt_victim = str(survey / f"line{acquired[3]:02d}_UTM.sgy")
    with SegyFile(delrt_victim) as f:
        raw = f.trace_headers_raw().copy()
        d = f.trace_data()
        txt = f.text
    from pseudo_3d_interpolation_tpu.io.segy import TRACE_HEADER_FIELDS

    off, dtc = TRACE_HEADER_FIELDS["DelayRecordingTime"]
    size = int(dtc[-1])
    for t in (10, 20):
        raw[t, off - 1 : off - 1 + size] = np.array([27], ">" + dtc).view(np.uint8)
    write_segy(delrt_victim, d, raw_trace_headers=raw, text=txt, fmt=5,
               dt_us=dt_us)

    # 08 fodder: inject spikes into one line
    victim = str(survey / f"line{acquired[1]:02d}_UTM.sgy")
    with SegyFile(victim) as f:
        d = f.trace_data()
        raw = f.trace_headers_raw()
        txt = f.text
    d[5, 100] = 30.0
    d[20, 50:53] = -25.0
    write_segy(victim, d, raw_trace_headers=raw, text=txt, fmt=5, dt_us=dt_us)

    # ---- stage 1 (reference step order) ------------------------------------
    work = str(tmp_path / "work")
    os.makedirs(work)

    # 01 merge: the split line recombines; everything else passes through
    outs = stage1.merge_small_files(str(survey), min_kb=40.0, max_gap_s=120.0,
                                    output_dir=work)
    assert sum("merged" in o for o in outs) == 1
    for o in outs:
        if not o.startswith(work):
            shutil.copy(o, work)
    merged = [o for o in outs if "merged" in o][0]
    with SegyFile(merged) as f:
        assert f.n_traces == ntr and "MERGE" in f.text

    # 02 reproject WGS84 -> UTM 32N
    outs = stage1.reproject(work, 4326, 32632, inplace=True)
    with SegyFile(outs[0]) as f:
        from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates

        x, y, units = scale_coordinates(f)
        assert units in (0, 1) and 5.0e5 < x[0] < 5.002e5

    # 03 delrt correction: the corrupted headers (27 ms) re-base onto the
    # local first-break trend — exact to the trace's own heave (<=1 ms)
    outs = stage1.delrt_correct(work, inplace=True)
    fixed = [o for o in outs if f"line{acquired[3]:02d}" in o][0]
    with SegyFile(fixed) as f:
        delrt = f.header("DelayRecordingTime").astype(int)
        assert (np.abs(delrt - 20) <= 1).all(), delrt

    # 04 delrt padding: one global TWT axis across all files (origin = the
    # survey's minimum delay, incl. the 30 ms tie line and the +-1 ms
    # delrt-corrected traces)
    outs = stage1.delrt_pad(work, inplace=True)
    ns_pad, delrt0 = None, None
    for o in outs:
        with SegyFile(o) as f:
            d0 = int(f.header("DelayRecordingTime")[0])
            assert (f.header("DelayRecordingTime") == d0).all()
            delrt0 = delrt0 if delrt0 is not None else d0
            assert d0 == delrt0 and abs(delrt0 - 20) <= 1
            ns_pad = ns_pad or f.n_samples
            assert f.n_samples == ns_pad

    # 05 static
    stage1.static_correct(work, savgol_window=21, inplace=True)

    # 06 tide from a spatial harmonic atlas (per-trace lat/lon/time)
    lat_ax = np.linspace(53.0, 53.5, 9)
    lon_ax = np.linspace(8.9, 9.1, 9)
    atlas = TideAtlas(lat_ax, lon_ax, {
        "M2": (np.full((9, 9), 0.25), np.full((9, 9), 40.0)),
        "S2": (np.full((9, 9), 0.10), np.full((9, 9), 100.0)),
    })
    atlas_path = str(tmp_path / "atlas.nc")
    atlas.save(atlas_path)
    stage1.tide_compensate(work, atlas_path, src_epsg=32632, inplace=True)

    # 07 mistie
    outs = stage1.mistie_correct(work, min_correlation=0.2, inplace=True)

    # 08 despike
    outs = stage1.despike(work, threshold=6.0, inplace=True)
    with SegyFile([o for o in outs if f"line{acquired[1]:02d}" in o][0]) as f:
        clean = f.trace_data()
        assert np.abs(clean[5, :]).max() < 10.0  # spike removed
    with SegyFile(outs[0]) as f:
        for step in ("REPROJECT", "STATIC", "TIDE", "MISTIE", "DESPIKE"):
            assert step in f.text, step

    # 09 segy -> cube conversion (the direct profile->cube path)
    from pseudo_3d_interpolation_tpu.pipeline.segy2cube import convert

    conv = convert(outs[0], out_dir=str(tmp_path / "conv"))
    from pseudo_3d_interpolation_tpu.io.ncio import read_cube

    conv_cube = read_cube(conv[0])
    assert any(v not in ("fold",) for v in conv_cube.data_vars)

    # ---- stage 2 ------------------------------------------------------------
    # 10 binning (exclude the tie line: different vertical datum)
    inline_files = [o for o in outs if "tie" not in o]
    geom = BinningGeometry(
        spacing=spacing,
        extent=(500000.0, 500000.0 + n_lines * spacing,
                5.9e6, 5.9e6 + ntr * spacing),
        stacking_method="average",
    )
    cube = bin_cube(inline_files, geom, out_path=str(tmp_path / "cube.nc"))
    fold = cube["fold"]
    assert (fold.sum(axis=1) > 0).sum() == len(acquired)

    # 11 preprocess
    pp = preprocess(cube, balance="rms")
    # 12 fft
    freq = apply_fft(pp)
    # 13 pocs
    cfg = POCSConfig(niter=40, thresh_op="hard", p_min="adaptive",
                     version="fast", alpha=0.75, eps=1e-16)
    interp = interpolate(freq, cfg, batch=16)
    # 14 ifft
    back = apply_ifft(interp, var="freq_amp_interp")
    out_var = next(v for v in back.data_vars if v not in ("fold", "amp_ref"))
    rec = np.asarray(back[out_var])

    # ---- quality: reconstructed missing ilines contain the reflector ------
    missing = np.setdiff1d(np.arange(n_lines), acquired)
    dt_ms = dt_us / 1000.0
    win = 24
    fracs = []
    for i in missing:
        for j in range(4, ntr - 4):
            c = int(floor_of(i, j) / dt_ms) - int(20 / dt_ms)
            e = rec[i, j] ** 2
            tot = float(e.sum())
            if tot > 0:
                fracs.append(float(e[max(c - win, 0) : c + win].sum()) / tot)
    uniform_share = (2 * win) / rec.shape[-1]
    mean_frac = float(np.mean(fracs))
    assert mean_frac > 1.5 * uniform_share, (mean_frac, uniform_share)
    amp_missing = float(np.abs(rec[missing]).max())
    amp_acquired = float(np.abs(rec[acquired]).max())
    assert amp_missing > 0.3 * amp_acquired, (amp_missing, amp_acquired)

    # 15 postprocess: slice smoothing + AGC
    back.data_vars["fold"] = cube.data_vars["fold"]
    post = postprocess(back, var=out_var, smoothing={"sigma": 0.8},
                       agc_win=0.02)
    post_var = next(v for v in post.data_vars if v not in ("fold", "amp_ref"))
    pdata = np.asarray(post[post_var])
    assert pdata.shape == rec.shape and np.isfinite(pdata).all()

    # 16 export
    out_segy = str(tmp_path / "cube_final.sgy")
    if "fold" not in post.data_vars:
        post.data_vars["fold"] = cube.data_vars["fold"]
    cube_to_segy(post, out_segy, var=post_var)
    with SegyFile(out_segy) as f:
        assert f.n_traces == n_lines * ntr
        assert f.bin["SortingCode"] == 4
