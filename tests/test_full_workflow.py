"""BASELINE config 4 at test scale: the complete workflow, stage 1 through
stage 2, on synthetic SEG-Y profiles with realistic defects.

Defects injected: spikes, per-trace heave jitter, a line-wide vertical
mistie, tide, small files to merge, and missing crosslines. The chain must
repair them and reconstruct the missing lines.
"""

import os

import numpy as np
import pandas as pd
import pytest

from pseudo_3d_interpolation_tpu.io.segy import SegyFile
from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
from pseudo_3d_interpolation_tpu.ops import metrics
from pseudo_3d_interpolation_tpu.pipeline import stage1
from pseudo_3d_interpolation_tpu.pipeline.binning import BinningGeometry, bin_cube
from pseudo_3d_interpolation_tpu.pipeline.export import cube_to_segy
from pseudo_3d_interpolation_tpu.pipeline.fft import apply_fft
from pseudo_3d_interpolation_tpu.pipeline.ifft import apply_ifft
from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate
from pseudo_3d_interpolation_tpu.pipeline.preprocess import preprocess

from test_stage1 import make_profile, ricker


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
    for i in acquired:
        floor = np.array([floor_of(i, j) for j in range(ntr)])
        jitter = rng.integers(-3, 4, ntr) * 0.25  # heave
        make_profile(
            str(survey / f"line{i:02d}_UTM.sgy"), ntr=ntr, ns=ns, dt_us=dt_us,
            seafloor_ms=floor + jitter, seed=300 + i,
            x0=5.0 + i * spacing, y0=5.0, heading=(0, 1), spacing=spacing,
            times_start=f"2023-05-01T{6 + i:02d}:00:00",
        )
    # one crossing tie line along x (with a 1.5 ms mistie)
    tie_floor = np.array([floor_of(i, 16) for i in np.linspace(0, n_lines - 1, 40)])
    make_profile(
        str(survey / "tie_UTM.sgy"), ntr=40, ns=ns, dt_us=dt_us,
        seafloor_ms=tie_floor + 1.5, seed=400,
        x0=5.0, y0=5.0 + 16 * spacing, heading=(1, 0),
        spacing=(n_lines - 1) * spacing / 39.0,
        times_start="2023-05-02T01:00:00",
    )

    # inject spikes into one line
    victim = str(survey / f"line{acquired[1]:02d}_UTM.sgy")
    with SegyFile(victim) as f:
        d = f.trace_data()
        raw = f.trace_headers_raw()
        txt = f.text
    d[5, 100] = 30.0
    d[20, 50:53] = -25.0
    from pseudo_3d_interpolation_tpu.io.segy import write_segy

    write_segy(victim, d, raw_trace_headers=raw, text=txt, fmt=5, dt_us=dt_us)

    # ---- stage 1 ----------------------------------------------------------
    work = str(tmp_path / "work")
    os.makedirs(work)
    outs = stage1.despike(str(survey), threshold=6.0, output_dir=work)
    assert len(outs) == len(acquired) + 1
    outs = stage1.static_correct(work, savgol_window=21, output_dir=None, inplace=True)
    tide_csv = str(tmp_path / "tide.csv")
    pd.DataFrame({
        "datetime": pd.date_range("2023-05-01T00:00:00", periods=60, freq="1h"),
        "height": 0.3 * np.sin(np.linspace(0, 9, 60)),
    }).to_csv(tide_csv, index=False)
    outs = stage1.tide_compensate(work, tide_csv, inplace=True)
    outs = stage1.mistie_correct(work, min_correlation=0.2, inplace=True)
    with SegyFile(outs[0]) as f:
        assert "DESPIKE" in f.text and "STATIC" in f.text
        assert "TIDE" in f.text and "MISTIE" in f.text

    # ---- stage 2 ----------------------------------------------------------
    # exclude the tie line from binning (its vertical datum differs)
    inline_files = [o for o in outs if "tie" not in o]
    geom = BinningGeometry(
        spacing=spacing,
        extent=(0.0, n_lines * spacing, 0.0, ntr * spacing),
        stacking_method="average",
    )
    cube = bin_cube(inline_files, geom, out_path=str(tmp_path / "cube.nc"))
    fold = cube["fold"]
    assert (fold.sum(axis=1) > 0).sum() == len(acquired)

    pp = preprocess(cube, balance="rms")
    freq = apply_fft(pp)
    cfg = POCSConfig(niter=40, thresh_op="hard", p_min="adaptive",
                     version="fast", alpha=0.75, eps=1e-16)
    interp = interpolate(freq, cfg, batch=16)
    back = apply_ifft(interp, var="freq_amp_interp")
    # inverse restores the original variable name from provenance attrs
    out_var = next(v for v in back.data_vars if v not in ("fold", "amp_ref"))
    rec = np.asarray(back[out_var])

    # ---- quality: reconstructed missing ilines contain the reflector ------
    missing = np.setdiff1d(np.arange(n_lines), acquired)
    amp = np.asarray(pp["amp"])
    snr_before = float(metrics.snr(np.zeros_like(amp[missing]), amp[missing]))
    # the reconstructed missing lines must carry reflector energy near the
    # expected seafloor TWT (peak within ±6 ms at this very coarse 16-iline
    # grid) and at amplitudes comparable to acquired lines
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
    # energy concentrates around the expected reflector, well above chance
    assert mean_frac > 1.5 * uniform_share, (mean_frac, uniform_share)
    amp_missing = float(np.abs(rec[missing]).max())
    amp_acquired = float(np.abs(rec[acquired]).max())
    assert amp_missing > 0.3 * amp_acquired, (amp_missing, amp_acquired)

    # ---- export -----------------------------------------------------------
    out_segy = str(tmp_path / "cube_final.sgy")
    back.data_vars["fold"] = cube.data_vars["fold"]
    cube_to_segy(back, out_segy, var=out_var)
    with SegyFile(out_segy) as f:
        assert f.n_traces == n_lines * ntr
        assert f.bin["SortingCode"] == 4
