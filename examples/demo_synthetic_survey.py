"""End-to-end demo: synthetic multi-line survey -> full workflow -> QC images.

Creates a decimated pseudo-3D survey with injected defects (spikes, heave
jitter, tide), runs the complete 16-step-style chain through the library
API, and writes QC figures + artifacts into ``./demo_output``.

Run:  python examples/demo_synthetic_survey.py [output_dir]
(CPU or TPU; on CPU takes ~1 minute.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_survey(survey_dir: str, n_lines=24, ntr=48, ns=384, dt_us=250,
                spacing=10.0, keep_frac=0.6, seed=0):
    from pseudo_3d_interpolation_tpu.io.segy import write_segy

    rng = np.random.default_rng(seed)
    acquired = sorted(set([0, n_lines - 1]) | {
        int(i) for i in rng.choice(n_lines, size=int(n_lines * keep_frac), replace=False)
    })
    dt_ms = dt_us / 1000.0
    t_axis = np.arange(ns) * dt_ms

    def ricker(t, f0=250.0):
        a = (np.pi * f0 * t) ** 2
        return (1 - 2 * a) * np.exp(-a)

    floor_of = lambda i, j: 40.0 + 2.5 * np.sin(0.25 * i) + 1.5 * np.cos(0.2 * j)
    truth = np.zeros((n_lines, ntr, ns), np.float32)
    for i in range(n_lines):
        for j in range(ntr):
            for horizon, amp in [(floor_of(i, j), 1.0), (floor_of(i, j) + 25.0, -0.5)]:
                truth[i, j] += amp * ricker((t_axis - (horizon - 20.0)) * 1e-3).astype(np.float32)

    for i in acquired:
        data = truth[i] + rng.normal(0, 0.02, (ntr, ns)).astype(np.float32)
        jitter = rng.integers(-3, 4, ntr)
        for j in range(ntr):
            data[j] = np.roll(data[j], jitter[j])
        if i == acquired[1]:  # plant spikes in one line
            data[5, 100] = 25.0
            data[20, 200:203] = -20.0
        times = pd.date_range(f"2023-06-01T{6 + i % 18:02d}:00:00", periods=ntr, freq="1s")
        write_segy(
            os.path.join(survey_dir, f"line{i:02d}_UTM.sgy"), data,
            headers={
                "SourceX": np.rint((5.0 + i * spacing) * 100).astype(np.int64),
                "SourceY": np.rint((5.0 + np.arange(ntr) * spacing) * 100).astype(np.int64),
                "SourceGroupScalar": -100, "CoordinateUnits": 1,
                "DelayRecordingTime": 20,
                "YearDataRecorded": times.year.values,
                "DayOfYear": times.dayofyear.values,
                "HourOfDay": times.hour.values,
                "MinuteOfHour": times.minute.values,
                "SecondOfMinute": times.second.values,
            },
            fmt=1, dt_us=dt_us,  # IBM float, like real TOPAS data
        )
    return truth, np.asarray(acquired), floor_of


def main(out_root="demo_output"):
    from pseudo_3d_interpolation_tpu import qc
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
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile

    os.makedirs(out_root, exist_ok=True)
    survey = os.path.join(out_root, "survey")
    os.makedirs(survey, exist_ok=True)
    print("1/7 creating synthetic survey (IBM-float SEG-Y)...")
    n_lines, ntr, ns, spacing = 24, 48, 384, 10.0
    truth, acquired, floor_of = make_survey(survey, n_lines, ntr, ns)
    print(f"    {len(acquired)}/{n_lines} lines acquired")

    print("2/7 stage 1: despike + static correction...")
    work = os.path.join(out_root, "work")
    outs = stage1.despike(survey, threshold=6.0, output_dir=work)
    outs = stage1.static_correct(work, savgol_window=21, inplace=True)

    with SegyFile(outs[0]) as f:
        qc.plot_seismic_image(f.trace_data().T, title="first profile after stage 1",
                              path=os.path.join(out_root, "qc_profile.png"))

    print("3/7 binning onto the 3D grid...")
    geom = BinningGeometry(spacing=spacing,
                           extent=(0.0, n_lines * spacing, 0.0, ntr * spacing))
    cube = bin_cube(outs, geom, out_path=os.path.join(out_root, "cube.nc"))
    qc.plot_fold_map(cube["fold"], path=os.path.join(out_root, "qc_fold.png"))

    print("4/7 preprocess + forward FFT...")
    pp = preprocess(cube, balance="rms")
    freq = apply_fft(pp, out_path=os.path.join(out_root, "cube_freq.nc"))

    print("5/7 POCS interpolation of every frequency slice...")
    cfg = POCSConfig(niter=50, thresh_op="hard", p_min="adaptive",
                     version="fast", alpha=0.75, eps=1e-16)
    interp = interpolate(freq, cfg, batch=32,
                         runtime_csv=os.path.join(out_root, "runtimes.csv"))

    print("6/7 inverse FFT + postprocess...")
    back = apply_ifft(interp, var="freq_amp_interp")
    out_var = next(v for v in back.data_vars if v not in ("fold", "amp_ref"))
    post = postprocess(back, var=out_var, smoothing={"kind": "gaussian", "sigma": 0.8})

    rec = np.asarray(post[out_var])
    missing = np.setdiff1d(np.arange(n_lines), acquired)
    amp = np.asarray(pp["amp"])
    print(f"    cube SNR (vs amp-normalized truth): sparse "
          f"{float(metrics.snr(np.sign(truth), np.sign(amp))):.1f} -> see QC images")
    # crossline section through acquired + missing lines
    j = ntr // 2
    qc.plot_seismic_difference(
        amp[:, j, :].T, rec[:, j, :].T, titles=("binned (gaps)", "interpolated"),
        path=os.path.join(out_root, "qc_interpolation.png"))

    print("7/7 exporting final SEG-Y...")
    post.data_vars["fold"] = cube.data_vars["fold"]
    cube_to_segy(post, os.path.join(out_root, "cube_final.sgy"), var=out_var)
    print(f"done — artifacts in {out_root}/")
    print(f"    missing lines reconstructed: {missing.tolist()}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_output")
