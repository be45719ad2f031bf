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
    # (n-1)*f + 1 points: original samples stay on the grid, spacing is
    # exactly bin/f (reference line-index law)
    assert out["amp"].shape == (19, 8, 64)
    assert len(out.coords["iline"]) == 19
    il = np.asarray(out.coords["iline"])
    assert np.allclose(np.diff(il), 0.5)
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


# ------------------ regression tests: stage-2 review fixes -------------------
def test_antialias_filter_keeps_signal_small_grids():
    """The keep band is centered with npad//2 per side: adding the full
    npad emptied the band for small grids, the degenerate rescale left the
    all-zero filter unchanged, and the upsampled cube was silently wiped
    to zeros."""
    ff = post.antialias_filter(20, 8, "iline", {"iline": 2, "xline": 1})
    assert ff.shape == (20, 8) and ff.max() > 0.9
    c = small_cube(n_il=10, n_xl=8)
    amp_in = np.asarray(c["amp"]).copy()
    out = post.postprocess(c, var="amp",
                           upsample_factors={"iline": 2, "xline": 1})
    amp_out = np.asarray(out["amp"])
    # energy survives the anti-alias step (was exactly zero before)
    assert np.abs(amp_out).max() > 0.1 * np.abs(amp_in).max()
    # and the keep fraction is in the right ballpark: the central rows of
    # the shifted filter pass ~unity
    ff = post.antialias_filter(64, 64, "iline", {"iline": 2, "xline": 1})
    assert ff[32, 32] > 0.9
    keep_rows = (ff[:, 32] > 0.5).sum()
    assert 20 <= keep_rows <= 46  # ~ny*(1-0.49) = 33 +- smoothing width


def test_antialias_filter_refuses_empty_band():
    # sigma=4 -> even npad: the centered band can reach exactly zero rows
    with pytest.raises(ValueError, match="keep band"):
        post.antialias_filter(4, 8, "iline", {"iline": 100, "xline": 1},
                              sigma=4)


def test_footprint_filter_zero_width_notches_nothing():
    """fwidth == 0 (buffer_center ~ 1) must notch NOTHING — shape[-0:] is
    the full slice and used to notch the entire stripe including DC."""
    ff = post.footprint_filter(32, 32, sigma=3, buffer_center=0.999)
    assert ff.min() > 0.9


def test_postprocess_unit_upsample_is_noop():
    c = small_cube()
    out = post.postprocess(c, var="amp",
                           upsample_factors={"iline": 1, "xline": 1})
    assert out["amp"].shape == (10, 8, 64)
    assert "fold" in out.data_vars  # not popped
    assert "UPSAMPLE" not in str(out.attrs.get("history", ""))


def test_postprocess_upsample_drops_stale_grid_vars():
    c = small_cube()
    c.data_vars["env"] = (("iline", "xline", "twt"),
                          np.abs(np.asarray(c["amp"])))
    out = post.postprocess(c, var="amp",
                           upsample_factors={"iline": 2, "xline": 1})
    # env still has the OLD grid shape -> must not be written against the
    # refined coordinates
    assert "env" not in out.data_vars and "fold" not in out.data_vars


def test_export_upsampled_cube_navigation_not_stretched(tmp_path):
    """Navigation comes from the coordinate VALUES: feeding the renumbered
    1..N header indices into the affine stretched the written grid by the
    upsample factor."""
    c = small_cube()
    up = post.postprocess(c, var="amp",
                          upsample_factors={"iline": 2, "xline": 1})
    ilxl2xy = Affine().translation((-1.0, -1.0)).scaling(10.0)
    p = str(tmp_path / "up.sgy")
    cube_to_segy(up, p, ilxl_to_coords=ilxl2xy)
    with SegyFile(p) as f:
        cx = f.header("CDP_X").astype(float) / 100.0  # unscale -100
        n_xl = len(up.coords["xline"])
        # first iline sits at the survey origin; the LAST iline must sit at
        # the original extent (il=10 -> 90 m), not 2x it
        assert cx[0] == 0.0
        assert abs(cx[-n_xl] - 90.0) < 1e-6
        # consecutive upsampled ilines follow the endpoint-preserving
        # linspace spacing ((10-1)/19 il = 4.7368 m), quantized to cm by
        # the -100 scalar — NOT the stretched 10 m the index bug produced
        want = round((np.asarray(up.coords["iline"])[1] - 1.0) * 10.0, 2)
        assert abs(cx[n_xl] - want) < 0.011


def test_convert_survives_empty_profile(tmp_path):
    """A zero-trace SEG-Y in the survey directory must not abort the whole
    conversion batch."""
    rng = np.random.default_rng(7)
    good = str(tmp_path / "good_UTM.sgy")
    write_segy(good, rng.normal(size=(5, 16)).astype(np.float32),
               headers={"SourceX": 100, "SourceY": 200,
                        "SourceGroupScalar": 1, "CoordinateUnits": 1},
               dt_us=250)
    empty = str(tmp_path / "empty_UTM.sgy")
    write_segy(empty, rng.normal(size=(1, 16)).astype(np.float32),
               headers={"SourceX": 100, "SourceY": 200,
                        "SourceGroupScalar": 1, "CoordinateUnits": 1},
               dt_us=250)
    with open(empty, "r+b") as fh:
        fh.truncate(3600)
    outs = convert(str(tmp_path))
    assert len(outs) == 2


def test_get_transform_rejects_typo_options():
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform

    with pytest.raises(TypeError, match="nscales"):
        get_transform("SHEARLET", nscales=3)
    with pytest.raises(TypeError, match="precison"):
        get_transform("FFT", precison="high")
    # cross-basis keys from a shared YAML stay tolerated
    t = get_transform("SHEARLET", wavelet="db4", n_scales=3)
    assert t.n_scales == 3


def test_postprocess_auto_equal_bin_upsample():
    """upsample_factors='auto' derives the factor from the bin_size attrs
    the binning step stamps, refining the COARSER axis (reference bare
    --upsample: 'upsample to equal bin size', cube_postprocessing_3D.py:
    350-488)."""
    c = small_cube()
    c.attrs["bin_size_iline"] = 10.0  # coarser -> refine ilines x2
    c.attrs["bin_size_xline"] = 5.0
    out = post.postprocess(c, var="amp", upsample_factors="auto")
    assert out["amp"].shape == (19, 8, 64)
    assert out.attrs["bin_size_iline"] == 5.0  # attrs stay truthful
    # and the refined axis spacing really IS the finer bin (5 m over the
    # 10 m original): exactly 0.5 iline units
    assert np.allclose(np.diff(np.asarray(out.coords["iline"])), 0.5)
    # equal bins already -> no-op (fold survives)
    c2 = small_cube()
    c2.attrs["bin_size"] = 5.0
    out2 = post.postprocess(c2, var="amp", upsample_factors="auto")
    assert out2["amp"].shape == (10, 8, 64) and "fold" in out2.data_vars
    # missing attrs and non-integer ratios fail loudly
    with pytest.raises(ValueError, match="bin_size"):
        post.postprocess(small_cube(), var="amp", upsample_factors="auto")
    c3 = small_cube()
    c3.attrs["bin_size_iline"] = 10.0
    c3.attrs["bin_size_xline"] = 4.0
    with pytest.raises(ValueError, match="integer ratio"):
        post.postprocess(c3, var="amp", upsample_factors="auto")


def test_postprocess_upsample_expands_equal_bin_size_attr():
    """An explicit anisotropic upsample of an equal-bin cube must expand
    the 'bin_size' attr to truthful per-axis keys — leaving it stale made
    a later upsample_factors='auto' silently no-op on the now-anisotropic
    cube (round-3 review)."""
    c = small_cube()
    c.attrs["bin_size"] = 10.0
    out = post.postprocess(c, var="amp",
                           upsample_factors={"iline": 2, "xline": 1})
    assert "bin_size" not in out.attrs
    assert out.attrs["bin_size_iline"] == 5.0
    assert out.attrs["bin_size_xline"] == 10.0
    # and 'auto' now refines the xlines to match, instead of no-opping
    out2 = post.postprocess(out, var="amp", upsample_factors="auto")
    assert out2.attrs["bin_size_xline"] == 5.0
    assert out2["amp"].shape == (19, 15, 64)


def test_cube2segy_auto_scalar(tmp_path):
    """--scalar-coords 'auto' resolves through check_coordinate_scalar like
    the reference (cube_cnv_netcdf2segy_3D.py:41-45)."""
    c = small_cube(n_il=3, n_xl=2, ns=16)
    p = str(tmp_path / "o.sgy")
    cube_to_segy(c, p, var="amp", coordinate_scalar="auto")
    with SegyFile(p) as f:
        assert (f.header("SourceGroupScalar") == -100).all()
    with pytest.raises(ValueError, match="scalar"):
        cube_to_segy(c, p, var="amp", coordinate_scalar=37)
