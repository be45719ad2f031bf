"""Tests for preprocessing, postprocessing, export, and segy2cube steps."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube
from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy
from pseudo_3d_interpolation_tpu.ops.affine import Affine
from pseudo_3d_interpolation_tpu.pipeline import postprocess as post
from pseudo_3d_interpolation_tpu.pipeline.export import cube_to_segy
from pseudo_3d_interpolation_tpu.pipeline.preprocess import preprocess
from pseudo_3d_interpolation_tpu.pipeline.segy2cube import convert, profile_to_cube


def small_cube(n_il=10, n_xl=8, ns=64, seed=100):
    rng = np.random.default_rng(seed)
    amp = rng.normal(size=(n_il, n_xl, ns)).astype(np.float32)
    return Cube(
        coords={
            "iline": np.arange(1, n_il + 1),
            "xline": np.arange(1, n_xl + 1),
            "twt": np.arange(ns) * 0.25e-3,
        },
        data_vars={
            "amp": (("iline", "xline", "twt"), amp),
            "fold": (("iline", "xline"), np.ones((n_il, n_xl), np.int32)),
        },
        attrs={"text": "C01 survey"},
    )


# --------------------------- preprocess --------------------------------------
def test_preprocess_balance_and_envelope():
    c = small_cube()
    out = preprocess(c, balance="rms", envelope=True)
    rms = np.sqrt(np.mean(out["amp"] ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-4)
    assert "amp_ref" in out.data_vars
    assert "env" in out.data_vars and (out["env"] >= -1e-4).all()
    assert "BALANCE(rms)" in out.attrs["history"]


def test_preprocess_filter_and_resample():
    c = small_cube()
    out = preprocess(c, filter_type="lowpass", filter_freqs=[600.0, 900.0],
                     resample_to=128)
    assert out["amp"].shape[-1] == 128
    assert len(out.coords["twt"]) == 128
    np.testing.assert_allclose(out.coords["twt"][1] - out.coords["twt"][0],
                               0.25e-3 / 2, rtol=1e-6)


def test_preprocess_gain():
    c = small_cube()
    out = preprocess(c, gain_args={"tpow": 1.0})
    assert "GAIN(tpow=1.0)" in out.attrs["history"]


# --------------------------- postprocess -------------------------------------
def test_postprocess_upsample():
    c = small_cube()
    out = post.postprocess(c, var="amp", upsample_factors={"iline": 2, "xline": 1})
    assert out["amp"].shape == (20, 8, 64)
    assert len(out.coords["iline"]) == 20
    assert "fold" not in out.data_vars


def test_postprocess_footprint_and_smooth():
    c = small_cube(n_il=32, n_xl=32)
    out = post.postprocess(
        c, var="amp",
        footprint={"sigma": 3, "direction": "both"},
        smoothing={"kind": "gaussian", "sigma": 1.0},
    )
    assert out["amp"].shape == (32, 32, 64)
    assert np.isfinite(out["amp"]).all()
    assert "FOOTPRINT_REMOVAL" in out.attrs["history"]


def test_footprint_filter_suppresses_periodic_stripes():
    """Periodic iline stripes (classic footprint) must lose energy."""
    n = 64
    slices = np.zeros((4, n, n), np.float32)
    stripes = np.cos(2 * np.pi * np.arange(n) * 16 / n)[:, None]  # high-k stripes along ilines
    rng = np.random.default_rng(101)
    signal = rng.normal(size=(4, n, n)).astype(np.float32)
    noisy = signal + 2.0 * stripes[None]
    ff = post.footprint_filter(n, n, sigma=5, direction="both")
    cleaned = post.apply_kxky_filter(noisy, ff)
    stripe_energy_before = np.mean((noisy - signal) ** 2)
    stripe_energy_after = np.mean((cleaned - signal) ** 2)
    assert stripe_energy_after < 0.5 * stripe_energy_before


def test_postprocess_median_smooth_and_agc():
    c = small_cube(n_il=16, n_xl=16)
    out = post.postprocess(
        c, var="amp", smoothing={"kind": "median", "size": 3}, agc_win=5e-3
    )
    assert np.isfinite(out["amp"]).all()
    assert "AGC" in out.attrs["history"]


# --------------------------- export ------------------------------------------
def test_cube_to_segy_roundtrip(tmp_path):
    c = small_cube()
    c.attrs["text"] = "survey xyz\nprocessing: POCS"
    ilxl2xy = Affine().translation((-1.0, -1.0)).scaling(10.0)  # il/xl -> meters
    p = str(tmp_path / "cube.sgy")
    cube_to_segy(c, p, ilxl_to_coords=ilxl2xy)
    with SegyFile(p) as f:
        assert f.n_traces == 10 * 8
        assert f.n_samples == 64
        assert f.dt_us == 250
        np.testing.assert_array_equal(np.unique(f.header("INLINE_3D")), np.arange(1, 11))
        np.testing.assert_array_equal(np.unique(f.header("CROSSLINE_3D")), np.arange(1, 9))
        # coordinates: il=1,xl=1 -> (0, 0); il=2 -> x=10m
        cx = f.header("CDP_X")
        assert cx[0] == 0 and cx[8] == 1000  # scaled by 100
        data = f.trace_data().reshape(10, 8, 64)
        np.testing.assert_allclose(data, c["amp"], rtol=1e-6)
        assert "pseudo-3D cube" in f.text
        assert f.bin["SortingCode"] == 4


# --------------------------- segy2cube ---------------------------------------
def test_profile_roundtrip(tmp_path):
    rng = np.random.default_rng(102)
    data = rng.normal(size=(30, 50)).astype(np.float32)
    p = str(tmp_path / "prof_UTM.sgy")
    write_segy(p, data, headers={
        "SourceX": np.arange(30) * 100, "SourceY": np.full(30, 5),
        "SourceGroupScalar": -100, "CoordinateUnits": 1,
        "DelayRecordingTime": 10,
    }, fmt=5, dt_us=250)
    outs = convert(p, out_dir=str(tmp_path / "nc"))
    assert len(outs) == 1
    c = read_cube(outs[0])
    np.testing.assert_allclose(c["amp"], data, rtol=1e-6)
    assert c.coords["twt"][0] == pytest.approx(0.010)
    np.testing.assert_allclose(c["x"], np.arange(30))
