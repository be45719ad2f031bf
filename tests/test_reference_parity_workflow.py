"""Workflow-level reference-parity gate: execute the ACTUAL reference
stage-1 scripts and diff their SEG-Y outputs against this repo's steps.

The solver gate (test_reference_parity.py) and the operator gate
(test_reference_parity_ops.py) pin L1/L2; this file closes the last
un-gated surface — the reference's *workflow scripts* — by running them
through :mod:`pseudo_3d_interpolation_tpu.io.segyio_compat`, the
segyio-compatible API over the repo's own codec. The scripts execute
unmodified (``import segyio`` resolves to the shim), read files this
repo wrote, and write files this repo re-reads, so every byte crosses
both codecs.

Gates (each reference wrapper from /root/reference):
  - 04 delrt padding (delrt_padding_segy.wrapper_delrt_padding_segy):
    trace-exact data + header/bin-field agreement with stage1.delrt_pad.
  - 03 delrt correction (delrt_correction_segy.check_DelayRecordingTime_
    changes): corrected DelayRecordingTime vectors agree with
    stage1.delrt_correct on the spurious-run scenario.
  - 05 static correction, ``--mode swdep``
    (static_correction_segy.wrapper_static_correction_segy): identical
    integer sample shifts (TotalStaticApplied headers) and shifted traces.
  - 05 static correction, ``--mode amp``: the STA/LTA picker feeds the
    same chain — identical shifts/headers/traces on a clean wavelet
    seafloor.
  - 08 despike (despiking_2D_segy.wrapper_despiking_2D_segy): both
    remove the injected bursts with a bounded fraction of samples
    modified (the detectors differ in documented ways).
  - 02 reproject (reproject_segy.wrapper_reproject_segy, over the
    additional pyproj-compatible facade utils/pyproj_compat): coordinate
    headers byte-identical to `p3d reproject`.

  - 01 merge (merge_segys.wrapper_merge_segys): identical merged traces,
    gap zero-trace, interpolated counters/coords/timestamps. Runs with ONE
    test-side patch: pandas ≥ 2 removed the positional-axis
    ``pd.isnull(df).any(1)`` call (merge_segys.py:321).
  - 06 tide (tide_compensation_segy.wrapper_tide_compensation): identical
    compensated traces + sample shifts, with the reference's tpxo interface
    stubbed by the repo's own TideAtlas engine over a shared synthetic
    atlas (tide physics itself is pinned by tests/test_tide_crs.py).
  - 07 mistie (mistie_correction_segy.main_misties + wrapper): identical
    corrected traces on a crossing survey with an injected mistie, with
    shapely/geopandas stubbed by the repo's vectorized segment-intersection
    math, plus an alias for the reference's own case-sensitivity bug
    (imports ``functions.utils_io``, file is ``utils_IO.py`` — unrunnable
    as-is on any case-sensitive filesystem).

Args are built via each script's own ``define_input_args().parse_args``
so reference defaults apply verbatim. With these three, all 8 stage-1
steps are workflow-diffed against the live reference scripts.
"""

from __future__ import annotations

import os
import shutil
import sys
import types

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.io.segy import SegyFile
from pseudo_3d_interpolation_tpu.pipeline import stage1

from test_stage1 import make_profile

REF_ROOT = os.environ.get("P3D_REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "pseudo_3D_interpolation")),
    reason=f"reference checkout not available at {REF_ROOT} "
           "(set P3D_REFERENCE_ROOT)",
)


@pytest.fixture(scope="module")
def ref(request):
    """Import the live reference workflow scripts over the segyio shim."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat

    segyio_compat.install()
    request.addfinalizer(segyio_compat.uninstall)
    if "dask" not in sys.modules:  # functions/utils.py module-level import
        stub = types.ModuleType("dask")
        stub.array = types.ModuleType("dask.array")
        sys.modules["dask"] = stub
        request.addfinalizer(lambda: sys.modules.pop("dask", None))
    sys.path.insert(0, REF_ROOT)
    try:
        from pseudo_3D_interpolation import (  # noqa: F401
            delrt_correction_segy as rc,
            delrt_padding_segy as rp,
            despiking_2D_segy as rd,
            static_correction_segy as rs,
        )
    finally:
        sys.path.remove(REF_ROOT)
    return types.SimpleNamespace(pad=rp, corr=rc, static=rs, despike=rd)


def _twin_inputs(tmp_path, name, **kwargs):
    """The same synthetic profile in two directories (one per pipeline)."""
    a = tmp_path / "ref"
    b = tmp_path / "repo"
    a.mkdir(exist_ok=True)
    b.mkdir(exist_ok=True)
    pa = str(a / f"{name}.sgy")
    make_profile(pa, **kwargs)
    pb = str(b / f"{name}.sgy")
    shutil.copy2(pa, pb)
    return pa, pb


def _headers(path, fields):
    with SegyFile(path) as f:
        return {name: f.header(name) for name in fields}


def _data_bin(path):
    with SegyFile(path) as f:
        return f.trace_data(), dict(f.bin)


# ---------------------------------------------------------------------------
# 04 — delrt padding
# ---------------------------------------------------------------------------


def test_delrt_padding_matches_reference(ref, tmp_path):
    ntr = 48
    delrt = np.repeat([20, 24, 28], 16)
    seafloor = np.linspace(46.0, 52.0, ntr)
    pa, pb = _twin_inputs(tmp_path, "pad", ntr=ntr, ns=400,
                          delrt_ms=delrt, seafloor_ms=seafloor, seed=3)

    args = ref.pad.define_input_args().parse_args([pa])
    assert ref.pad.wrapper_delrt_padding_segy(pa, args) is not False
    out_ref = pa.replace(".sgy", "_pad.sgy")
    assert os.path.isfile(out_ref)

    (out_repo,) = stage1.delrt_pad(pb, txt_suffix="pad")

    d_ref, bin_ref = _data_bin(out_ref)
    d_repo, bin_repo = _data_bin(out_repo)
    assert d_ref.shape == d_repo.shape
    np.testing.assert_array_equal(d_ref, d_repo)
    assert bin_ref["Samples"] == bin_repo["Samples"]
    assert bin_ref["SamplesOriginal"] == bin_repo["SamplesOriginal"] == 400

    fields = ("DelayRecordingTime", "TRACE_SAMPLE_COUNT", "SourceX")
    h_ref = _headers(out_ref, fields)
    h_repo = _headers(out_repo, fields)
    for name in fields:
        np.testing.assert_array_equal(h_ref[name], h_repo[name], err_msg=name)
    assert np.all(h_ref["DelayRecordingTime"] == 20)


# ---------------------------------------------------------------------------
# 03 — delrt correction
# ---------------------------------------------------------------------------


def test_delrt_correction_matches_reference(ref, tmp_path):
    """The case the reference's detector corrects (its case [2],
    delrt_correction_segy.py:176-196): the recording window genuinely
    re-bases at trace 31 (the data's first break shifts), but the headers
    flip one trace EARLY — trace 30 is recorded with the old delay while
    its header already carries the new one. Both implementations must
    re-base exactly that trace and leave the genuine change alone."""
    import segyio

    ntr, ns = 60, 400
    true_delrt = np.where(np.arange(ntr) < 31, 20, 26)   # data recorded with
    wrong_delrt = np.where(np.arange(ntr) < 30, 20, 26)  # headers claim
    pa, pb = _twin_inputs(tmp_path, "corr", ntr=ntr, ns=ns,
                          delrt_ms=true_delrt,
                          seafloor_ms=np.full(ntr, 50.0), seed=5)
    for p in (pa, pb):
        with segyio.open(p, "r+") as f:
            for i in range(ntr):
                f.header[i][segyio.TraceField.DelayRecordingTime] = \
                    int(wrong_delrt[i])

    with segyio.open(pa, "r+", strict=False, ignore_geometry=True) as f:
        ref.corr.check_DelayRecordingTime_changes(
            f, ntr, byte_delay=109, n_traces=5, n_samples=16,
            update_segy=True, verbosity=0)
    (out_repo,) = stage1.delrt_correct(pb, n_neighbors=5, win_samples=200)

    d_ref = _headers(pa, ("DelayRecordingTime",))["DelayRecordingTime"]
    d_repo = _headers(out_repo, ("DelayRecordingTime",))["DelayRecordingTime"]
    np.testing.assert_array_equal(d_ref, true_delrt)
    np.testing.assert_array_equal(d_repo, d_ref)


# ---------------------------------------------------------------------------
# 05 — static correction (swdep mode: deterministic, no picker)
# ---------------------------------------------------------------------------


def test_static_swdep_matches_reference(ref, tmp_path):
    ntr, ns = 64, 400
    rng = np.random.default_rng(11)
    # smooth seafloor + short-wavelength heave the static must remove
    base = 45.0 + 3.0 * np.sin(np.linspace(0, 2.2 * np.pi, ntr))
    heave = rng.normal(0.0, 0.6, ntr)
    seafloor = base + heave
    swdep = np.rint(seafloor * 100).astype(np.int64)  # ms*100 via scaler -100
    pa, pb = _twin_inputs(
        tmp_path, "stat", ntr=ntr, ns=ns, delrt_ms=20, seafloor_ms=seafloor,
        seed=7,
        extra_headers={"SourceWaterDepth": swdep, "ElevationScalar": -100})

    args = ref.static.define_input_args().parse_args(
        [pa, "--mode", "swdep", "--inplace"])
    ref.static.wrapper_static_correction_segy(pa, args)
    (out_repo,) = stage1.static_correct(pb, mode="swdep", inplace=True)
    assert out_repo == pb

    fields = ("TotalStaticApplied", "UnassignedInt1")
    h_ref = _headers(pa, fields)
    h_repo = _headers(pb, fields)
    assert np.any(h_ref["TotalStaticApplied"] != 0)
    for name in fields:
        np.testing.assert_array_equal(h_ref[name], h_repo[name], err_msg=name)
    d_ref, _ = _data_bin(pa)
    d_repo, _ = _data_bin(pb)
    np.testing.assert_array_equal(d_ref, d_repo)


# ---------------------------------------------------------------------------
# 08 — despike
# ---------------------------------------------------------------------------


def test_despike_both_remove_bursts(ref, tmp_path):
    """Workflow-level despike gate. The two despike kernels differ in
    documented ways (shape-bucketed windows, global noise floor, taper
    shape), so the assertion is behavioral: the injected bursts shrink to
    the background level in BOTH outputs, and samples far from any burst
    are bit-identical to the input."""
    ntr, ns = 64, 400
    spikes = [(12, 200), (30, 120), (50, 310)]
    pa, pb = _twin_inputs(tmp_path, "spk", ntr=ntr, ns=ns, delrt_ms=20,
                          seafloor_ms=np.full(ntr, 42.0), seed=13)
    import segyio

    for p in (pa, pb):
        with segyio.open(p, "r+") as f:
            for tr, s in spikes:
                t = f.trace[tr]
                t[s:s + 4] = 25.0
                f.trace[tr] = t
    d_in, _ = _data_bin(pa)

    args = ref.despike.define_input_args().parse_args(
        [pa, "--inplace", "--mode", "median", "--window_time", "3",
         "--window_traces", "5", "--threshold_factor", "5",
         "--out_amplitude", "zeros"])
    ref.despike.wrapper_despiking_2D_segy(pa, args)
    stage1.despike(pb, window=(9, 5), threshold=5.0, mode="median",
                   replace="zeros", inplace=True)

    d_ref, _ = _data_bin(pa)
    d_repo, _ = _data_bin(pb)
    background = np.abs(d_in).mean() * 10
    for d_out, label in ((d_ref, "reference"), (d_repo, "repo")):
        assert d_out.shape == d_in.shape, label
        for tr, s in spikes:
            peak = np.abs(d_out[tr, s:s + 4]).max()
            assert peak < background, (label, tr, s, peak)
        # surgical repair: the overwhelming majority of samples untouched
        # (the reference's windowed detector also fires on a few noise
        # excursions — >5x the 12-sample window median — so bit-equality
        # of all clean traces holds only for the repo's global-floor
        # detector)
        # (the reference zeroes the whole detected trace segment — 3 spike
        # traces of 64 here; the repo tapers just the burst windows)
        frac = np.mean(d_out != d_in)
        assert frac < 0.06, (label, frac)


# ---------------------------------------------------------------------------
# the shim itself
# ---------------------------------------------------------------------------


def test_shim_roundtrip(tmp_path):
    """create/open/r+ semantics of the segyio-compatible layer."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    p = str(tmp_path / "t.sgy")
    make_profile(p, ntr=10, ns=64, delrt_ms=20,
                 seafloor_ms=np.full(10, 10.0), seed=1)
    with sgy.open(p) as f:
        assert f.tracecount == 10
        assert sgy.tools.dt(f) == 250.0
        np.testing.assert_allclose(
            f.samples, 20.0 + np.arange(64) * 0.25)
        vals = f.attributes(sgy.TraceField.DelayRecordingTime)[:]
        assert vals.dtype == np.int32 and np.all(vals == 20)
        spec = sgy.tools.metadata(f)
        data = f.trace.raw[:]
        text = f.text[0]
        spec.tracecount = 10

    out = str(tmp_path / "o.sgy")
    with sgy.create(out, spec) as dst:
        dst.text[0] = text
        dst.header[3] = {sgy.TraceField.FieldRecord: 77,
                         sgy.TraceField.DelayRecordingTime: 20}
        dst.trace = data * 2.0
        dst.bin[sgy.BinField.Interval] = 250

    with SegyFile(out) as g:  # re-read through the repo codec
        assert g.n_traces == 10 and g.n_samples == 64
        np.testing.assert_allclose(g.trace_data(), data * 2.0, atol=2e-6)
        assert g.header("FieldRecord")[3] == 77
        assert g.text.startswith("C01") or len(g.text) > 0

    with sgy.open(out, "r+") as f:  # in-place mutation persists
        f.header[0][sgy.TraceField.SourceX] = 123456
        t0 = f.trace[0]
        t0[:4] = 9.0
        f.trace[0] = t0
    with SegyFile(out) as g:
        assert g.header("SourceX")[0] == 123456
        np.testing.assert_allclose(g.trace_data()[0, :4], 9.0)


# ---------------------------------------------------------------------------
# 02 — reproject (via the pyproj-compatible facade)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_reproject(ref, request):
    """The reference reproject script additionally needs pyproj — resolved
    by utils/pyproj_compat (same analytic CRS engine as `p3d reproject`)."""
    from pseudo_3d_interpolation_tpu.utils import pyproj_compat

    pyproj_compat.install()
    request.addfinalizer(pyproj_compat.uninstall)
    sys.path.insert(0, REF_ROOT)
    try:
        from pseudo_3D_interpolation import reproject_segy as rr
    finally:
        sys.path.remove(REF_ROOT)
    return rr


def test_reproject_matches_reference(ref_reproject, tmp_path):
    """EPSG:32633 (UTM 33N) -> EPSG:3035 (LAEA Europe): the reference
    script run over the segyio+pyproj shims must write byte-identical
    coordinate headers to `p3d reproject` (same engine, independent
    plumbing: scale/unscale, per-trace header writes, units, scalar)."""
    ntr = 50
    xs = 500000.0 + np.arange(ntr) * 12.5
    pa, pb = _twin_inputs(tmp_path, "reproj", ntr=ntr, ns=64, delrt_ms=20,
                          seafloor_ms=np.full(ntr, 10.0), seed=9,
                          x0=500000.0, y0=5761000.0, heading=(1.0, 0.2),
                          spacing=12.5)
    del xs

    args = ref_reproject.define_input_args().parse_args(
        [pa, "--crs_src", "EPSG:32633", "--crs_dst", "EPSG:3035",
         "--inplace"])
    ref_reproject.wrapper_reproject_segy(pa, (73, 77), (73, 77), args)

    (out_repo,) = stage1.reproject(pb, "EPSG:32633", "EPSG:3035",
                                   inplace=True)
    assert out_repo == pb

    fields = ("SourceX", "SourceY", "SourceGroupScalar", "CoordinateUnits")
    h_ref = _headers(pa, fields)
    h_repo = _headers(pb, fields)
    for name in fields:
        np.testing.assert_array_equal(h_ref[name], h_repo[name], err_msg=name)
    # coordinates actually moved into the LAEA frame
    assert abs(h_ref["SourceX"][0] / 100.0 - 4664000) < 50000
    # traces untouched by a pure header step
    d_ref, _ = _data_bin(pa)
    d_repo, _ = _data_bin(pb)
    np.testing.assert_array_equal(d_ref, d_repo)


def test_pyproj_shim_surface():
    """The facade's own surface: CRS flags, to_epsg, transform round trip."""
    from pseudo_3d_interpolation_tpu.utils import pyproj_compat as pp

    wgs = pp.CRS("epsg:4326")
    utm = pp.CRS(32633)
    assert wgs.is_geographic and not wgs.is_projected
    assert utm.is_projected and utm.to_epsg() == 32633
    assert pp.CRS("EPSG:3035").to_epsg() == 3035
    t = pp.Transformer.from_crs(wgs, utm, always_xy=True)
    x, y = t.transform(np.array([15.0]), np.array([52.0]), errcheck=True)
    assert abs(x[0] - 500000.0) < 1e-3
    back = pp.Transformer.from_crs(utm, wgs, always_xy=True)
    lon, lat = back.transform(x, y)
    assert abs(lon[0] - 15.0) < 1e-9 and abs(lat[0] - 52.0) < 1e-9
    with pytest.raises(NotImplementedError):
        pp.Transformer.from_crs(wgs, utm)


def test_static_amp_matches_reference(ref, tmp_path):
    """'amp' mode end-to-end: STA/LTA seafloor picking feeds the static
    chain in both implementations. On a clean wavelet seafloor the picks
    agree exactly (the ops-parity gate pins the picker), so shifts,
    headers, and traces must match like the swdep gate."""
    ntr, ns = 64, 400
    rng = np.random.default_rng(21)
    seafloor = (42.0 + 2.5 * np.sin(np.linspace(0, 2.0 * np.pi, ntr))
                + rng.normal(0.0, 0.5, ntr))
    pa, pb = _twin_inputs(tmp_path, "statamp", ntr=ntr, ns=ns, delrt_ms=20,
                          seafloor_ms=seafloor, seed=23)

    args = ref.static.define_input_args().parse_args(
        [pa, "--mode", "amp", "--inplace", "--nsta", "4", "--nlta", "30",
         "--win_samples", "30"])
    ref.static.wrapper_static_correction_segy(pa, args)
    (out_repo,) = stage1.static_correct(pb, mode="amp", inplace=True,
                                        nsta=4, nlta=30, win_samples=30)
    assert out_repo == pb

    h_ref = _headers(pa, ("TotalStaticApplied",))["TotalStaticApplied"]
    h_repo = _headers(pb, ("TotalStaticApplied",))["TotalStaticApplied"]
    assert np.any(h_ref != 0)
    np.testing.assert_array_equal(h_ref, h_repo)
    d_ref, _ = _data_bin(pa)
    d_repo, _ = _data_bin(pb)
    np.testing.assert_array_equal(d_ref, d_repo)


def test_shim_preserves_extended_textual_stanzas(tmp_path):
    """A rewrite through the shim must carry extended textual stanzas
    along (dropping them while the binary header still counts them would
    shift the trace block by 3200 bytes)."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    p = str(tmp_path / "ext.sgy")
    make_profile(p, ntr=6, ns=64, delrt_ms=20,
                 seafloor_ms=np.full(6, 10.0), seed=2)
    raw = np.fromfile(p, np.uint8)
    stanza = np.frombuffer(
        ("SEG: EndText" + " " * 3188).encode("ascii"), np.uint8)
    spliced = np.concatenate([raw[:3600], stanza, raw[3600:]])
    # ExtendedHeaders (byte 3505, i2) = 1
    spliced[3504:3506] = np.frombuffer(
        np.asarray(1).astype(">i2").tobytes(), np.uint8)
    spliced.tofile(p)

    with SegyFile(p) as f:
        before = f.trace_data()
    with sgy.open(p, "r+") as f:
        assert f.ext_headers == 1
        f.header[0][sgy.TraceField.FieldRecord] = 42
    with SegyFile(p) as f:  # still structurally valid through the codec
        assert f.n_traces == 6
        assert f.header("FieldRecord")[0] == 42
        np.testing.assert_array_equal(f.trace_data(), before)


def test_shim_merges_second_handle_writes(tmp_path):
    """Writes made through a second handle while an 'r+' handle is open
    survive the outer close (the reference's static wrapper updates the
    textual header exactly this way, static_correction_segy.py:473-481)."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    p = str(tmp_path / "merge2.sgy")
    make_profile(p, ntr=6, ns=64, delrt_ms=20,
                 seafloor_ms=np.full(6, 10.0), seed=4)
    with sgy.open(p, "r+") as outer:
        t = outer.trace[0]
        t[:] = 7.0
        outer.trace[0] = t
        with sgy.open(p, "r+") as inner:  # e.g. write_textual_header
            inner.text[0] = b"PROVENANCE".ljust(3200)
    with SegyFile(p) as f:
        assert "PROVENANCE" in f.text      # inner write survived
        np.testing.assert_allclose(f.trace_data()[0], 7.0)  # outer too


def test_shim_header_write_range_checked(tmp_path):
    """Out-of-range header values fail loudly (write_segy semantics), not
    by silent two's-complement wrap."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    p = str(tmp_path / "rng.sgy")
    make_profile(p, ntr=4, ns=32, delrt_ms=20,
                 seafloor_ms=np.full(4, 5.0), seed=6)
    with sgy.open(p, "r+") as f:
        with pytest.raises(ValueError, match="16-bit"):
            f.header[0][sgy.TraceField.TotalStaticApplied] = 48000


def test_static_saturates_i2_header(tmp_path):
    """ms x 1000 statics beyond +-32.767 ms saturate byte 103 instead of
    failing the write (coarse-dt profiles: 10 samples at dt 4 ms = 40 ms)."""
    ntr = 64
    rng = np.random.default_rng(31)
    seafloor = 600.0 + 80.0 * np.sin(np.linspace(0, 2 * np.pi, ntr)) \
        + rng.normal(0, 45.0, ntr)  # wild heave in ms at dt 4 ms
    p = str(tmp_path / "coarse.sgy")
    make_profile(p, ntr=ntr, ns=400, dt_us=4000, delrt_ms=0,
                 seafloor_ms=seafloor, seed=31,
                 extra_headers={"SourceWaterDepth":
                                np.rint(seafloor * 100).astype(np.int64),
                                "ElevationScalar": -100})
    (out,) = stage1.static_correct(p, mode="swdep", inplace=True,
                                   limit_shift=1000)
    with SegyFile(out) as f:
        tsa = f.header("TotalStaticApplied")
        sta = np.asarray([int(x) for x in tsa])
    assert np.abs(sta).max() == 32767  # saturated, not wrapped/failed


def test_shim_ibm_format_roundtrip(tmp_path):
    """create() honors spec.format=1 (IBM float): bytes written through
    the shim decode identically through the repo codec."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    rng = np.random.default_rng(17)
    data = (rng.normal(0, 1.0, (6, 128)).astype(np.float32)
            * np.float32(2.0) ** rng.integers(-10, 10, (6, 1)))
    spec = sgy.Spec()
    spec.samples = np.arange(128) * 0.25
    spec.tracecount = 6
    spec.format = 1
    p = str(tmp_path / "ibm.sgy")
    with sgy.create(p, spec) as dst:
        dst.trace = data
        for i, h in enumerate(dst.header):
            h.update({sgy.TraceField.TRACE_SEQUENCE_FILE: i + 1,
                      sgy.TraceField.TRACE_SAMPLE_COUNT: 128,
                      sgy.TraceField.TRACE_SAMPLE_INTERVAL: 250})
    with SegyFile(p) as f:
        assert f.format == 1
        got = f.trace_data()
    # IBM has a 24-bit mantissa: 2^-21 relative quantization bound
    np.testing.assert_allclose(got, data, rtol=2 ** -20, atol=0)
    with sgy.open(p) as f:  # and back through the shim
        np.testing.assert_allclose(f.trace.raw[:], got, rtol=0, atol=0)


def test_shim_metadata_roundtrip(tmp_path):
    """tools.metadata -> create preserves dt, sample count, and format."""
    from pseudo_3d_interpolation_tpu.io import segyio_compat as sgy

    p = str(tmp_path / "meta.sgy")
    make_profile(p, ntr=5, ns=100, dt_us=500, delrt_ms=30,
                 seafloor_ms=np.full(5, 40.0), seed=19)
    with sgy.open(p) as f:
        spec = sgy.tools.metadata(f)
        assert len(spec.samples) == 100 and spec.tracecount == 5
        np.testing.assert_allclose(np.diff(spec.samples), 0.5)
    out = str(tmp_path / "meta2.sgy")
    with sgy.create(out, spec) as dst:
        dst.trace = np.zeros((5, 100), np.float32)
    with sgy.open(out) as g:
        assert sgy.tools.dt(g) == 500.0
        assert g.tracecount == 5 and g.trace.raw[:].shape == (5, 100)


# ---------------------------------------------------------------------------
# 01 — merge (the reference script runs over the shim with ONE test-side
# compatibility patch: pandas 2 removed the positional-axis DataFrame.any(1)
# call its merge_segys.py:321 makes — restored for the duration of the test)
# ---------------------------------------------------------------------------


@pytest.fixture()
def ref_merge(ref, monkeypatch):
    import pandas as pd

    orig_any = pd.DataFrame.any

    def _any(self, *args, **kwargs):
        if args and "axis" not in kwargs:
            kwargs["axis"] = args[0]
            args = args[1:]
        return orig_any(self, *args, **kwargs)

    monkeypatch.setattr(pd.DataFrame, "any", _any)
    sys.path.insert(0, REF_ROOT)
    try:
        from pseudo_3D_interpolation import merge_segys as rm
    finally:
        sys.path.remove(REF_ROOT)
    return rm


def _split_line(dirpath, gap_at=42, ntr_a=42, ntr_b=6, spacing=10.0):
    """One line as two files with a single missing trace between them."""
    os.makedirs(dirpath, exist_ok=True)
    a = os.path.join(dirpath, "line_a_UTM.sgy")
    b = os.path.join(dirpath, "line_b_UTM.sgy")
    make_profile(a, ntr=ntr_a, ns=256, dt_us=250, delrt_ms=20,
                 seafloor_ms=np.full(ntr_a, 40.0), seed=31,
                 times_start="2023-05-01T10:00:00", x0=0.0, spacing=spacing,
                 extra_headers={
                     "TRACE_SEQUENCE_LINE": np.arange(1, ntr_a + 1),
                     "FieldRecord": np.arange(1, ntr_a + 1)})
    t0_b = gap_at + 1  # one trace (index gap_at, second gap_at) is missing
    make_profile(b, ntr=ntr_b, ns=256, dt_us=250, delrt_ms=20,
                 seafloor_ms=np.full(ntr_b, 40.0), seed=32,
                 times_start=f"2023-05-01T10:00:{t0_b:02d}",
                 x0=t0_b * spacing, spacing=spacing,
                 extra_headers={
                     "TRACE_SEQUENCE_LINE": np.arange(t0_b + 1, t0_b + ntr_b + 1),
                     "FieldRecord": np.arange(t0_b + 1, t0_b + ntr_b + 1)})
    return a, b


def test_merge_matches_reference(ref_merge, tmp_path):
    """Reference wrapper_merge_segys vs stage1.merge_small_files: identical
    merged traces (incl. the inserted zero gap trace), coordinates,
    interpolated sequence counters, timestamps, and renumbered
    TRACE_SEQUENCE_FILE; .parts sidecars name the same sources."""
    ra, rb = _split_line(str(tmp_path / "ref"))
    pa, pb = _split_line(str(tmp_path / "repo"))

    ref_merge.wrapper_merge_segys([ra, rb], verbosity=0)
    ref_out = os.path.join(str(tmp_path / "ref"), "line_a_UTM_merge.sgy")
    assert os.path.isfile(ref_out)

    outs = stage1.merge_small_files(str(tmp_path / "repo"), min_kb=40.0,
                                    max_gap_s=120.0)
    repo_out = [o for o in outs if "merged" in o]
    assert len(repo_out) == 1
    repo_out = repo_out[0]

    da, _ = _data_bin(ref_out)
    db, _ = _data_bin(repo_out)
    assert da.shape == db.shape == (49, 256)
    np.testing.assert_array_equal(db, da)
    assert not da[42].any()  # the gap filler is a zero trace in both

    fields = ["TRACE_SEQUENCE_LINE", "TRACE_SEQUENCE_FILE", "FieldRecord",
              "SourceX", "SourceY", "YearDataRecorded", "DayOfYear",
              "HourOfDay", "MinuteOfHour", "SecondOfMinute",
              "DelayRecordingTime"]
    ha = _headers(ref_out, fields)
    hb = _headers(repo_out, fields)
    for name in fields:
        np.testing.assert_array_equal(hb[name], ha[name], err_msg=name)
    # the interpolated gap record carries the midpoint values
    assert int(ha["TRACE_SEQUENCE_LINE"][42]) == 43
    assert int(ha["SourceX"][42]) == 42000

    # .parts sidecars reference the same source files
    ref_parts = open(os.path.join(str(tmp_path / "ref"),
                                  "line_a_UTM_merge.parts")).read()
    repo_parts = open(repo_out.replace(".sgy", ".parts")).read()
    for name in ("line_a_UTM", "line_b_UTM"):
        assert name in ref_parts and name in repo_parts


# ---------------------------------------------------------------------------
# 06 — tide compensation (the reference script runs with its tpxo interface
# stubbed by the repo's own TideAtlas harmonic engine — both pipelines then
# predict from the SAME synthesized atlas, and the gate diffs the whole
# compensation chain: per-trace prediction, sample shift, output traces)
# ---------------------------------------------------------------------------


def _make_atlas(path):
    from pseudo_3d_interpolation_tpu.utils.tide import TideAtlas

    lat = np.linspace(53.9, 54.4, 5)
    lon = np.linspace(8.8, 9.2, 5)
    glat, glon = np.meshgrid(lat, lon, indexing="ij")
    atlas = TideAtlas(lat, lon, {
        "M2": (0.2 + 0.4 * (glat - lat[0]) / (lat[-1] - lat[0]),
               30.0 + 60.0 * (glon - lon[0]) / (lon[-1] - lon[0])),
        "S2": (0.05 + 0.1 * (glat - lat[0]) / (lat[-1] - lat[0]),
               100.0 + 40.0 * (glat - lat[0]) / (lat[-1] - lat[0])),
    })
    atlas.save(path)
    return path


@pytest.fixture()
def ref_tide(ref, monkeypatch, tmp_path):
    """Import the reference tide script over segyio + pyproj shims with
    ``tpxo_tide_prediction`` stubbed by the repo's TideAtlas engine."""
    import importlib
    import importlib.machinery

    from pseudo_3d_interpolation_tpu.utils import pyproj_compat
    from pseudo_3d_interpolation_tpu.utils.tide import TideAtlas

    stub = types.ModuleType("tpxo_tide_prediction")
    stub.__spec__ = importlib.machinery.ModuleSpec("tpxo_tide_prediction", None)

    def tide_predict(model_dir, lat, lon, times, constituents=None,
                     correct_minor=False, mode="track"):
        p = model_dir
        if os.path.isdir(p):
            p = os.path.join(p, "atlas.nc")
        atlas = TideAtlas.from_file(p)
        cons = [c.upper() for c in constituents] if constituents else None
        return atlas.predict(np.asarray(times), np.asarray(lat),
                             np.asarray(lon), constituents=cons,
                             correct_minor=correct_minor)

    stub.tide_predict = tide_predict
    monkeypatch.setitem(sys.modules, "tpxo_tide_prediction", stub)
    pyproj_compat.install()
    sys.path.insert(0, REF_ROOT)
    try:
        import pseudo_3D_interpolation.functions.backends as rb

        importlib.reload(rb)  # re-evaluate find_spec with the stub present
        assert rb.tpxo_tide_prediction_enabled
        sys.modules.pop("pseudo_3D_interpolation.tide_compensation_segy", None)
        from pseudo_3D_interpolation import tide_compensation_segy as rt
    finally:
        sys.path.remove(REF_ROOT)
        pyproj_compat.uninstall()
    yield rt
    sys.modules.pop("pseudo_3D_interpolation.tide_compensation_segy", None)
    importlib.reload(rb)  # restore honest flags for later tests


def test_tide_matches_reference(ref_tide, tmp_path):
    """Reference wrapper_tide_compensation vs stage1.tide_compensate over
    one shared synthetic atlas: identical predicted tides, identical
    integer shifts (opposite sign conventions in the aux files), identical
    compensated traces."""
    from pseudo_3d_interpolation_tpu.utils import pyproj_compat

    atlas_path = _make_atlas(str(tmp_path / "atlas.nc"))
    ntr = 48
    floor = 12.0 + 1.5 * np.sin(0.3 * np.arange(ntr))
    kwargs = dict(ntr=ntr, ns=256, dt_us=250, delrt_ms=0,
                  seafloor_ms=floor, seed=41,
                  times_start="2023-05-01T10:00:00",
                  x0=500000.0, y0=6000000.0, heading=(0.0, 1.0), spacing=25.0)
    pa, pb = _twin_inputs(tmp_path, "tideline", **kwargs)

    parser = ref_tide.define_input_args()
    args = parser.parse_args([
        pa, str(tmp_path), "--crs_src", "epsg:32632",
        "--constituents", "m2", "s2", "--src_coords", "source",
        "--write_aux"])
    args.verbose = 0
    pyproj_compat.install()
    try:
        ref_tide.wrapper_tide_compensation(pa, args)
    finally:
        pyproj_compat.uninstall()
    ref_out = pa.replace(".sgy", "_tide.sgy")
    assert os.path.isfile(ref_out)

    outs = stage1.tide_compensate(pb, atlas_path, src_epsg=32632)
    repo_out = outs[0]

    da, _ = _data_bin(ref_out)
    db, _ = _data_bin(repo_out)
    np.testing.assert_array_equal(db, da)

    # aux parity: tide heights match to the reference's 6-dp dump; the
    # sample columns are sign-mirrored conventions of the same shift
    import pandas as pd

    ref_aux = pd.read_csv(ref_out.replace(".sgy", ".tid"))
    repo_aux = pd.read_csv(repo_out.replace(".sgy", ".tid"))
    np.testing.assert_allclose(repo_aux["tide_m"], ref_aux["tide_m"],
                               atol=1e-6)
    np.testing.assert_array_equal(-repo_aux["shift_samples"],
                                  ref_aux["tide_samples"])
    assert np.abs(repo_aux["shift_samples"]).max() >= 1  # shifts actually happened


# ---------------------------------------------------------------------------
# 07 — mistie (the reference script runs with shapely/geopandas stubbed by a
# minimal geometry layer backed by the repo's own vectorized segment-
# intersection math, plus a module alias for its case-sensitivity bug:
# mistie_correction_segy.py:24 imports `functions.utils_io` while the file
# on disk is `utils_IO.py` — unrunnable on any case-sensitive filesystem)
# ---------------------------------------------------------------------------


def _make_shapely_stub():
    """Minimal shapely-2 surface for the reference mistie script, backed by
    stage1._segment_intersections (transversal polyline crossings only)."""
    import enum
    import importlib.machinery

    from pseudo_3d_interpolation_tpu.pipeline.stage1 import (
        _segment_intersections,
    )

    mod = types.ModuleType("shapely")
    mod.__spec__ = importlib.machinery.ModuleSpec("shapely", None)

    class Point:
        type_id = 0

        def __init__(self, x, y):
            self.x, self.y = float(x), float(y)

    class LineString:
        type_id = 1

        def __init__(self, coords):
            self.coords = np.asarray(coords, float)

    class MultiPoint:
        type_id = 4

        def __init__(self, pts):
            self.geoms = list(pts)

    class GeometryType(enum.IntEnum):
        MISSING = -1
        POINT = 0
        LINESTRING = 1
        LINEARRING = 2
        POLYGON = 3
        MULTIPOINT = 4
        MULTILINESTRING = 5
        MULTIPOLYGON = 6
        GEOMETRYCOLLECTION = 7

    def _pair_intersection(a, b):
        hits = _segment_intersections(a.coords, b.coords)
        pts = [Point(*h[0]) for h in hits]
        if not pts:
            return None
        return pts[0] if len(pts) == 1 else MultiPoint(pts)

    def linestrings(coords, indices=None):
        coords = np.asarray(coords, float)
        if indices is None:
            return LineString(coords)
        idx = np.asarray(indices)
        splits = np.nonzero(np.diff(idx))[0] + 1
        return np.array([LineString(c) for c in np.split(coords, splits)],
                        dtype=object)

    class STRtree:
        def __init__(self, geoms):
            self._geoms = list(geoms)

        def query(self, geoms, predicate=None):
            assert predicate == "intersects"
            rows, cols = [], []
            for i, ga in enumerate(np.atleast_1d(geoms)):
                for j, gb in enumerate(self._geoms):
                    if i == j or _pair_intersection(ga, gb) is not None:
                        rows.append(i)
                        cols.append(j)
            return np.asarray([rows, cols])

    def intersection(a, b):
        if isinstance(a, np.ndarray):
            return np.array([_pair_intersection(x, y) for x, y in zip(a, b)],
                            dtype=object)
        return _pair_intersection(a, b)

    def get_parts(geoms, return_index=False):
        parts, idx = [], []
        for k, g in enumerate(np.atleast_1d(geoms)):
            if isinstance(g, MultiPoint):
                parts.extend(g.geoms)
                idx.extend([k] * len(g.geoms))
            else:
                parts.append(g)
                idx.append(k)
        parts = np.array(parts, dtype=object)
        if return_index:
            return parts, np.asarray(idx)
        return parts

    def _vec(fn):
        def wrapped(g, *a):
            if isinstance(g, np.ndarray):
                return np.asarray([fn(x, *a) for x in g])
            return fn(g, *a)

        return wrapped

    mod.GeometryType = GeometryType
    mod.linestrings = linestrings
    mod.prepare = lambda g: None
    mod.STRtree = STRtree
    mod.intersection = intersection
    mod.get_parts = get_parts
    mod.get_type_id = _vec(lambda g: g.type_id)
    mod.get_num_points = _vec(
        lambda g: len(g.coords) if isinstance(g, LineString) else 0)
    mod.get_point = lambda g, j: Point(*g.coords[j])
    mod.get_x = _vec(lambda g: g.x)
    mod.get_y = _vec(lambda g: g.y)
    mod.Point = Point
    mod.LineString = LineString
    mod.MultiPoint = MultiPoint
    return mod


@pytest.fixture()
def ref_mistie(ref, monkeypatch):
    import importlib
    import importlib.machinery

    shap = _make_shapely_stub()
    gpd_stub = types.ModuleType("geopandas")
    gpd_stub.__spec__ = importlib.machinery.ModuleSpec("geopandas", None)
    monkeypatch.setitem(sys.modules, "shapely", shap)
    monkeypatch.setitem(sys.modules, "geopandas", gpd_stub)
    sys.path.insert(0, REF_ROOT)
    try:
        # the reference's own import bug: utils_io vs utils_IO.py
        utils_io = importlib.import_module(
            "pseudo_3D_interpolation.functions.utils_IO")
        monkeypatch.setitem(
            sys.modules, "pseudo_3D_interpolation.functions.utils_io",
            utils_io)
        sys.modules.pop("pseudo_3D_interpolation.mistie_correction_segy", None)
        from pseudo_3D_interpolation import mistie_correction_segy as rm
    finally:
        sys.path.remove(REF_ROOT)
    yield rm
    sys.modules.pop("pseudo_3D_interpolation.mistie_correction_segy", None)


def _crossing_survey(dirpath, mistie_ms=2.0):
    """Three parallel inlines + one tie line with a known vertical mistie."""
    os.makedirs(dirpath, exist_ok=True)
    ntr, ns, dt_us = 48, 400, 250
    # slowly varying floor: nonzero gradients exercise the geometry, but
    # the depth difference between the two nearest traces of any crossing
    # stays well under half a sample so both correlation conventions
    # (the reference's raw-envelope argmax, the repo's demeaned xcorr)
    # measure the exact injected mistie
    floor = lambda x, y: (50.0 + 3.0 * np.sin(2 * np.pi * y / 3000.0)
                          + 2.0 * np.cos(2 * np.pi * x / 4000.0))
    for i in range(3):
        x0 = 100.0 + 50.0 * i
        ys = np.arange(ntr) * 10.0
        make_profile(os.path.join(dirpath, f"line{i:02d}_UTM60S.sgy"),
                     ntr=ntr, ns=ns, dt_us=dt_us, delrt_ms=0,
                     seafloor_ms=floor(x0, ys), seed=60 + i,
                     times_start=f"2023-05-01T{10 + i:02d}:00:00",
                     x0=x0, y0=0.0, heading=(0.0, 1.0), spacing=10.0)
    xs = 85.0 + np.arange(40) * 10.0
    make_profile(os.path.join(dirpath, "tie00_UTM60S.sgy"),
                 ntr=40, ns=ns, dt_us=dt_us, delrt_ms=0,
                 seafloor_ms=floor(xs, 235.0) + mistie_ms, seed=70,
                 times_start="2023-05-02T01:00:00",
                 x0=85.0, y0=235.0, heading=(1.0, 0.0), spacing=10.0)


def test_mistie_matches_reference(ref_mistie, tmp_path):
    """Reference main_misties + wrapper_mistie_correction_segy vs
    stage1.mistie_correct on a 3-inlines + 1-tie crossing survey with an
    injected 2 ms mistie: the per-line integer shifts agree and the
    corrected traces are identical."""
    ref_dir = str(tmp_path / "ref")
    repo_dir = str(tmp_path / "repo")
    _crossing_survey(ref_dir)
    _crossing_survey(repo_dir)

    parser = ref_mistie.define_input_args()
    args = parser.parse_args([
        ref_dir, "--coords_path", ref_dir, "--coords_origin", "header",
        "--quality_threshold", "0.2", "--write_aux"])
    args.verbose = 0
    list_segy, offsets, offsets_ms, residuals = ref_mistie.main_misties(args)
    assert len(offsets) == 4 and np.abs(offsets).max() >= 1
    # offsets are indexed by line_id = first-appearance order in the sorted
    # navigation sweep; apply them to the files in that same order
    for fname in sorted(list_segy):
        line = fname.split("_UTM")[0]
        k = sorted(f.split("_UTM")[0] for f in list_segy).index(line)
        ref_mistie.wrapper_mistie_correction_segy(
            os.path.join(ref_dir, fname), offsets[k], offsets_ms[k], args)

    outs = stage1.mistie_correct(repo_dir, min_correlation=0.2)
    assert len(outs) == 4

    for fname in sorted(list_segy):
        ref_out = os.path.join(
            ref_dir, fname.replace(".sgy", "_mistie.sgy"))
        repo_out = [o for o in outs
                    if os.path.basename(o).startswith(fname.split("_UTM")[0])]
        assert len(repo_out) == 1, (fname, outs)
        da, _ = _data_bin(ref_out)
        db, _ = _data_bin(repo_out[0])
        np.testing.assert_array_equal(db, da, err_msg=fname)
