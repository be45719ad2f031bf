"""Smoke tests for the QC plotting library (files written, figures valid)."""

import os

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu import qc


@pytest.fixture
def section():
    rng = np.random.default_rng(120)
    return rng.normal(size=(200, 60)).astype(np.float32)


def test_seismic_image(section, tmp_path):
    p = str(tmp_path / "img.png")
    qc.plot_seismic_image(section, twt=np.arange(200) * 0.25e-3, title="t", path=p)
    assert os.path.getsize(p) > 1000


def test_difference(section, tmp_path):
    p = str(tmp_path / "diff.png")
    qc.plot_seismic_difference(section, section * 0.5, path=p)
    assert os.path.exists(p)


def test_wiggle(section, tmp_path):
    p = str(tmp_path / "wig.png")
    qc.plot_seismic_wiggle(section[:, :20], twt=np.arange(200) * 0.25e-3, path=p)
    assert os.path.exists(p)


def test_statics_overlay(section, tmp_path):
    p = str(tmp_path / "sta.png")
    horizon = 50 + 10 * np.sin(np.linspace(0, 3, 60))
    qc.plot_statics_overlay(section, horizon, static=np.ones(60),
                            twt=np.arange(200) * 0.25e-3, path=p)
    assert os.path.exists(p)


def test_spectra(section, tmp_path):
    qc.plot_trace_spectrum(section[:, 0], fs=4000.0, path=str(tmp_path / "sp1.png"))
    qc.plot_average_spectrum(section.T, fs=4000.0, n_traces=10,
                             path=str(tmp_path / "sp2.png"))
    assert os.path.exists(str(tmp_path / "sp2.png"))


def test_inversion_panels(tmp_path):
    rng = np.random.default_rng(121)
    x = (rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))).astype(np.complex64)
    qc.plot_inversion_result(x * 0.5, x, metadata={"transform_kind": "FFT",
                                                   "version": "fast",
                                                   "niterations": 42},
                             path=str(tmp_path / "inv.png"))
    qc.plot_inversion_result(np.real(x) * 0.5, np.real(x),
                             path=str(tmp_path / "inv_real.png"))
    assert os.path.exists(str(tmp_path / "inv.png"))


def test_fold_map(tmp_path):
    fold = np.random.default_rng(122).integers(0, 5, (20, 15))
    qc.plot_fold_map(fold, path=str(tmp_path / "fold.png"))
    assert os.path.exists(str(tmp_path / "fold.png"))


def test_wiggle_diff_and_statics_panels(tmp_path):
    """Round-2 parity panels (reference plot.py:536, 704)."""
    from pseudo_3d_interpolation_tpu.qc import (plot_seismic_wiggle_diff,
                                                plot_statics_panels)

    rng = np.random.default_rng(0)
    ns, ntr = 120, 24
    before = rng.normal(0, 0.1, (ns, ntr)).astype(np.float32)
    before[50:55] += 1.0
    after = np.roll(before, 2, axis=0)
    p1 = str(tmp_path / "wigdiff.png")
    plot_seismic_wiggle_diff(before, after, twt=np.arange(ns) * 0.25e-3, path=p1)
    p2 = str(tmp_path / "statics.png")
    plot_statics_panels([before, after, after * 0.5],
                        titles=["raw", "static", "smoothed"], path=p2)
    import os

    assert os.path.getsize(p1) > 5000 and os.path.getsize(p2) > 5000


def test_frequency_spectrum_grids(tmp_path):
    """Reference plot.py:863 (per-trace grid) and :1067 (survey average)."""
    from pseudo_3d_interpolation_tpu.qc import (plot_average_freq_spectrum,
                                                plot_trace_freq_spectrum)

    rng = np.random.default_rng(1)
    fs = 4000.0
    t = np.arange(400) / fs
    data = (np.sin(2 * np.pi * 300 * t)[None, :]
            + 0.1 * rng.normal(size=(6, 400))).astype(np.float32)
    p1 = str(tmp_path / "traces.png")
    plot_trace_freq_spectrum(data, fs, trace_labels=list("abcdef"), path=p1)
    p2 = str(tmp_path / "avg.png")
    plot_average_freq_spectrum(data, fs, norm=True, path=p2)
    import os

    assert os.path.getsize(p1) > 5000 and os.path.getsize(p2) > 5000


def test_cli_qc_compare(tmp_path):
    """p3d qc --compare writes before/after/difference panels for two cubes
    (sparse vs interpolated view, reference plot.py:199ff/536ff)."""
    import numpy as np
    from pseudo_3d_interpolation_tpu.cli import main
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, write_cube

    rng = np.random.default_rng(0)
    coords = {"iline": np.arange(8, dtype=np.int32),
              "xline": np.arange(10, dtype=np.int32),
              "twt": np.arange(32, dtype=np.float64) * 1e-3}
    a = rng.normal(size=(8, 10, 32)).astype(np.float32)
    for name, arr in [("a", a), ("b", a * 0.5)]:
        write_cube(str(tmp_path / f"{name}.nc"), Cube(
            coords=dict(coords),
            data_vars={"amp": (("iline", "xline", "twt"), arr)}))
    out = tmp_path / "qc"
    rc = main(["qc", str(tmp_path / "a.nc"), "--compare", str(tmp_path / "b.nc"),
               "--output-dir", str(out), "-V", "0"])
    assert rc == 0
    names = [p.name for p in out.iterdir()]
    assert any("a_vs_b_il4.png" == n for n in names), names
    assert any("wiggle" in n for n in names), names


def test_plot_option_parity(tmp_path):
    """Reference option surface (plot.py:23-533): dt-or-twt axis, gain,
    norm='rms'/'max', env, reverse, traces/add_info labels, tr_step."""
    from pseudo_3d_interpolation_tpu import qc

    rng = np.random.default_rng(0)
    data = rng.normal(size=(64, 24)).astype(np.float32)
    f = qc.plot_seismic_image(data, dt=0.001, gain=2.0, norm="rms", env=True,
                              reverse=True, units="ms", show_colorbar=False,
                              path=str(tmp_path / "img.png"))
    assert (tmp_path / "img.png").exists()
    f = qc.plot_seismic_difference(
        data, data[:, :20], dt=0.001, norm="max",  # mismatched shapes -> zero diff
        path=str(tmp_path / "diff.png"))
    assert (tmp_path / "diff.png").exists()
    traces = np.arange(100, 100 + 24)
    info = [f"d{k}" for k in range(24)]
    qc.plot_seismic_wiggle(data, dt=0.001, traces=traces, add_info=info,
                           gain=1.5, norm=True, tr_step=4, color="b",
                           path=str(tmp_path / "wig.png"))
    assert (tmp_path / "wig.png").exists()


def test_plot_iline_grid(tmp_path):
    from pseudo_3d_interpolation_tpu import qc

    rng = np.random.default_rng(1)
    cube = rng.normal(size=(10, 16, 32)).astype(np.float32)
    qc.plot_iline_grid(cube, twt=np.linspace(0, 0.5, 32),
                       path=str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").exists()
    # explicit iline selection
    qc.plot_iline_grid(cube, ilines=[0, 4, 9],
                       path=str(tmp_path / "grid3.png"))
    assert (tmp_path / "grid3.png").exists()
