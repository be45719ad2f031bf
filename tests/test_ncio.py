"""Cube store tests: round-trip, complex split/combine, dimension scales."""

import h5py
import numpy as np

from pseudo_3d_interpolation_tpu.io.ncio import Cube, CubeFile, CubeWriter, read_cube, write_cube


def make_cube():
    rng = np.random.default_rng(90)
    il = np.arange(1, 9)
    xl = np.arange(1, 7)
    twt = np.arange(16) * 0.25e-3
    amp = rng.normal(size=(16, 8, 6)).astype(np.float32)
    fold = rng.integers(0, 4, size=(8, 6)).astype(np.int32)
    c = Cube(
        coords={"twt": twt, "iline": il, "xline": xl},
        data_vars={
            "amp": (("twt", "iline", "xline"), amp),
            "fold": (("iline", "xline"), fold),
        },
        attrs={"long_name": "test cube", "history": "binning;"},
        var_attrs={"amp": {"units": "amplitude"}},
        coord_attrs={"twt": {"units": "s"}},
    )
    return c, amp, fold


def test_roundtrip(tmp_path):
    c, amp, fold = make_cube()
    p = str(tmp_path / "cube.nc")
    write_cube(p, c, chunks={"twt": 1})
    back = read_cube(p)
    np.testing.assert_allclose(back["amp"], amp)
    np.testing.assert_array_equal(back["fold"], fold)
    assert back.dims_of("amp") == ("twt", "iline", "xline")
    np.testing.assert_allclose(back.coords["twt"], c.coords["twt"])
    assert back.attrs["long_name"] == "test cube"
    assert back.var_attrs["amp"]["units"] == "amplitude"
    assert back.coord_attrs["twt"]["units"] == "s"


def test_complex_split_combine(tmp_path):
    rng = np.random.default_rng(91)
    z = (rng.normal(size=(4, 5, 6)) + 1j * rng.normal(size=(4, 5, 6))).astype(np.complex64)
    c = Cube(
        coords={"freq_twt": np.arange(4.0), "iline": np.arange(5.0), "xline": np.arange(6.0)},
        data_vars={"freq_amp": (("freq_twt", "iline", "xline"), z)},
    )
    p = str(tmp_path / "freq.nc")
    write_cube(p, c)
    # on disk: split pair, float32 (reference convention)
    with h5py.File(p, "r") as f:
        assert "freq_amp.real" in f and "freq_amp.imag" in f
        assert f["freq_amp.real"].dtype == np.float32
    back = read_cube(p)
    assert back["freq_amp"].dtype == np.complex64
    np.testing.assert_allclose(back["freq_amp"], z, rtol=1e-6)
    # split form preserved when not combining
    split = read_cube(p, combine_complex=False)
    assert "freq_amp.real" in split.data_vars


def test_dimension_scales_netcdf_compatible(tmp_path):
    c, *_ = make_cube()
    p = str(tmp_path / "scales.nc")
    write_cube(p, c)
    with h5py.File(p, "r") as f:
        assert f["twt"].attrs["CLASS"] == b"DIMENSION_SCALE"
        # amp dimension 0 is attached to the twt scale
        assert f["amp"].dims[0][0] == f["twt"]


def test_history_append():
    c, *_ = make_cube()
    c.append_history("FFT(TIME)")
    assert c.attrs["history"].endswith("FFT(TIME);")
    assert "FFT(TIME)" in c.attrs["text"]


def test_partial_variable_read(tmp_path):
    c, amp, fold = make_cube()
    p = str(tmp_path / "part.nc")
    write_cube(p, c)
    back = read_cube(p, variables=["fold"])
    assert "fold" in back.data_vars and "amp" not in back.data_vars


def test_cubefile_lazy_slab_reads(tmp_path):
    """CubeFile slabs must equal in-RAM reads, including complex recombine."""
    p = str(tmp_path / "lazy.nc")
    rng = np.random.default_rng(0)
    il, xl, F = 8, 6, 10
    amp = (rng.normal(size=(il, xl, F)) + 1j * rng.normal(size=(il, xl, F))
           ).astype(np.complex64)
    fold = rng.integers(0, 3, size=(il, xl)).astype(np.int32)
    cube = Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "freq_twt": np.arange(F) * 2.0},
        data_vars={"freq_env": (("iline", "xline", "freq_twt"), amp),
                   "fold": (("iline", "xline"), fold)},
        attrs={"history": "test;"},
    )
    write_cube(p, cube, chunks={"freq_twt": 1})
    with CubeFile(p) as cf:
        assert cf.sizes() == {"iline": il, "xline": xl, "freq_twt": F}
        assert cf.dims_of("freq_env") == ("iline", "xline", "freq_twt")
        assert cf.is_complex("freq_env") and not cf.is_complex("fold")
        np.testing.assert_array_equal(cf.read("fold"), fold)
        slab = cf.read_slab("freq_env", dim="freq_twt", start=3, stop=7)
        np.testing.assert_array_equal(slab, amp[:, :, 3:7])
        assert cf.attrs["history"] == "test;"


def test_cubewriter_incremental_matches_write_cube(tmp_path):
    """A slab-by-slab CubeWriter file must read back like a write_cube file."""
    p = str(tmp_path / "inc.nc")
    rng = np.random.default_rng(1)
    il, xl, F = 5, 4, 9
    rec = (rng.normal(size=(il, xl, F)) + 1j * rng.normal(size=(il, xl, F))
           ).astype(np.complex64)
    fold = rng.integers(0, 2, size=(il, xl)).astype(np.int32)
    coords = {"iline": np.arange(il), "xline": np.arange(xl),
              "freq_twt": np.arange(F) * 1.5}
    with CubeWriter(p, coords, attrs={"history": "streamed;"}) as w:
        w.create_var("freq_env_interp", ("iline", "xline", "freq_twt"),
                     np.complex64, chunks={"freq_twt": 1})
        w.create_var("fold", ("iline", "xline"), np.int32)
        w.write_slab("fold", fold)
        for s in range(0, F, 4):
            w.write_slab("freq_env_interp", rec[:, :, s : s + 4],
                         dim="freq_twt", start=s)
    back = read_cube(p)
    np.testing.assert_array_equal(back["freq_env_interp"], rec)
    np.testing.assert_array_equal(back["fold"], fold)
    assert back.attrs["history"] == "streamed;"
    # and lazily
    with CubeFile(p) as cf:
        np.testing.assert_array_equal(
            cf.read_slab("freq_env_interp", dim="freq_twt", start=2, stop=5),
            rec[:, :, 2:5])


def test_encodings_pack_unpack_roundtrip(tmp_path):
    """CF-convention packed storage (reference YAML 'encodings' family,
    cube_binning_3D.py:1476-1483): int16 + scale_factor storage reads back
    as float within quantization, NaN survives via _FillValue."""
    p = str(tmp_path / "packed.nc")
    rng = np.random.default_rng(0)
    amp = rng.normal(0, 0.5, (6, 5, 8)).astype(np.float32)
    amp[0, 0, 0] = np.nan
    cube = Cube(
        coords={"iline": np.arange(6), "xline": np.arange(5), "twt": np.arange(8.0)},
        data_vars={"amp": (("iline", "xline", "twt"), amp)},
    )
    write_cube(p, cube, encodings={"amp": {
        "dtype": "int16", "scale_factor": 5.0e-05, "_FillValue": -32768}})
    with h5py.File(p, "r") as f:
        assert f["amp"].dtype == np.int16  # actually packed on disk
    back = read_cube(p)["amp"]
    assert back.dtype == np.float32
    ok = ~np.isnan(amp)
    np.testing.assert_allclose(back[ok], amp[ok], atol=5.1e-05)
    assert np.isnan(back[0, 0, 0])


def test_attrs_config_families(tmp_path):
    """attrs_time / attrs_freq / encodings loader + application."""
    from pseudo_3d_interpolation_tpu.io.ncio import apply_attrs, load_attrs_config

    cfg = {
        "attrs_time": {
            "amp": {"long_name": "seismic amplitude", "units": "-"},
            "twt": {"long_name": "two-way travel time", "units": "ms"},
            "cube": {"description": "institutional metadata"},
        },
        "attrs_freq": {"data": {"long_name": "amplitude"},
                       "new_dim": {"long_name": "frequency", "units": "kHz"}},
        "encodings": {"amp": {"dtype": "int16", "scale_factor": 5e-5,
                              "_FillValue": -32768}},
        "var_aux": ["fold"],
    }
    at, af, enc, aux = load_attrs_config(cfg)
    assert "amp" in at and "data" in af and "amp" in enc and aux == ["fold"]
    cube = Cube(coords={"twt": np.arange(4.0)},
                data_vars={"amp": (("twt",), np.zeros(4, np.float32))})
    apply_attrs(cube, at)
    assert cube.var_attrs["amp"]["long_name"] == "seismic amplitude"
    assert cube.coord_attrs["twt"]["units"] == "ms"
    assert cube.attrs["description"] == "institutional metadata"


def test_fill_only_encoding_roundtrips_nan(tmp_path):
    """Integer encoding with _FillValue but default scale/offset must still
    restore NaN on read (the unpack trigger used to require scale/offset)."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube

    amp = np.array([[1.0, np.nan], [3.0, 4.0]], np.float32)
    cube = Cube(coords={"iline": np.arange(2), "xline": np.arange(2)},
                data_vars={"amp": (("iline", "xline"), amp)})
    p = str(tmp_path / "fill.nc")
    write_cube(p, cube, encodings={"amp": {"dtype": "i4", "_FillValue": -1}})
    back = read_cube(p)
    out = np.asarray(back["amp"])
    assert np.isnan(out[0, 1])
    np.testing.assert_allclose(out[0, 0], 1.0)


def test_cubefile_read_slab_unpacks_cf(tmp_path):
    """The streaming reader must apply the same CF unpacking read_cube does
    — the POCS driver derives its sampling mask from 'fold' through this
    path, and packed/fill values would silently corrupt the mask."""
    from pseudo_3d_interpolation_tpu.io.ncio import (Cube, CubeFile,
                                                     read_cube, write_cube)

    rng = np.random.default_rng(9)
    amp = rng.normal(size=(4, 3)).astype(np.float32)
    fold = np.array([[0, 1, 2], [3, 0, 1], [2, 2, 0], [1, 0, 4]], np.float32)
    fold[0, 0] = np.nan
    cube = Cube(coords={"iline": np.arange(4), "xline": np.arange(3)},
                data_vars={"amp": (("iline", "xline"), amp),
                           "fold": (("iline", "xline"), fold)})
    p = str(tmp_path / "packed.nc")
    write_cube(p, cube, encodings={
        "amp": {"dtype": "i2", "scale_factor": 1e-3, "_FillValue": -32768},
        "fold": {"dtype": "i2", "_FillValue": -1},
    })
    want_amp = np.asarray(read_cube(p)["amp"])
    want_fold = np.asarray(read_cube(p)["fold"])
    with CubeFile(p) as cf:
        got_amp = cf.read("amp")
        got_fold = cf.read("fold")
        got_slab = cf.read_slab("amp", dim="iline", start=1, stop=3)
    np.testing.assert_array_equal(got_amp, want_amp)
    np.testing.assert_array_equal(got_fold, want_fold)
    np.testing.assert_array_equal(got_slab, want_amp[1:3])
    assert np.isnan(got_fold[0, 0]) and got_fold.dtype.kind == "f"


def test_cubefile_var_attrs_strip_packing_keys(tmp_path):
    """CubeFile hands out UNPACKED floats, so its public var_attrs must not
    carry the CF packing keys: a pipeline step that copies them onto its
    float output would make read_cube re-apply the scale to already-unpacked
    data (the streaming POCS driver did exactly that — 1000x amplitude
    corruption)."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, CubeFile, write_cube

    amp = np.linspace(-1, 1, 12).astype(np.float32).reshape(4, 3)
    cube = Cube(coords={"iline": np.arange(4), "xline": np.arange(3)},
                data_vars={"amp": (("iline", "xline"), amp)},
                var_attrs={"amp": {"units": "mV"}})
    p = str(tmp_path / "packed.nc")
    write_cube(p, cube, encodings={
        "amp": {"dtype": "i2", "scale_factor": 1e-3, "_FillValue": -32768}})
    with CubeFile(p) as cf:
        attrs = cf.var_attrs["amp"]
    assert "scale_factor" not in attrs
    assert "add_offset" not in attrs
    assert "_FillValue" not in attrs
    assert attrs["units"] == "mV"


def test_streaming_pocs_output_not_rescaled_by_packing_attrs(tmp_path):
    """End-to-end regression: a CF-packed input cube through the streaming
    checkpointed POCS driver must read back at physical amplitude (the
    packing attrs used to leak onto the float output variable, so read_cube
    re-applied scale_factor: wrote 1.0, read back 0.001)."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube
    from pseudo_3d_interpolation_tpu.models import POCSConfig
    from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate_checkpointed

    rng = np.random.default_rng(5)
    il = xl = 16
    nf = 3
    amp = rng.normal(size=(il, xl, nf)).astype(np.float32)
    fold = (rng.uniform(size=(il, xl)) < 0.6).astype(np.int32)
    amp *= fold[:, :, None]
    src = str(tmp_path / "in.nc")
    out = str(tmp_path / "out.nc")
    write_cube(src, Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "freq_twt": np.arange(nf, dtype=np.float64)},
        data_vars={"amp": (("iline", "xline", "freq_twt"), amp),
                   "fold": (("iline", "xline"), fold)}),
        encodings={"amp": {"dtype": "i4", "scale_factor": 1e-3,
                           "_FillValue": -2**31}})
    cfg = POCSConfig(niter=2, p_min=1e-3, eps=0.0, alpha=1.0)
    res = interpolate_checkpointed(src, cfg, str(tmp_path / "ck"),
                                   out_path=out, batch=4)
    got = np.asarray(read_cube(res)["amp_interp"])
    want = np.asarray(read_cube(src)["amp"])  # unpacked physical values
    obs = fold[:, :, None].astype(bool) & np.broadcast_to(
        np.ones_like(amp, bool), amp.shape)
    # alpha=1 reinsertion keeps observed cells exactly; they must come back
    # at PHYSICAL scale, not re-shrunk by the packing scale_factor
    np.testing.assert_allclose(got[obs], want[obs], rtol=0, atol=2e-3)
    assert np.abs(got).max() > 0.1 * np.abs(want).max()
