"""SEG-Y codec tests: IBM float correctness, write/read round-trips,
header scrapes, coordinate scaling, textual-header provenance."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.io import (
    SegyFile,
    add_processing_entry,
    check_coordinate_scalar,
    decode_textual_header,
    encode_textual_header,
    ibm2ieee,
    ieee2ibm,
    scale_coordinates,
    unscale_coordinates,
    write_segy,
)
from pseudo_3d_interpolation_tpu.io.textual import get_processing_entries


# --------------------------- IBM float --------------------------------------
def test_ibm_known_values():
    # canonical examples: 0x42640000 = 100.0, 0xC2640000 = -100.0,
    # 0x41100000 = 1.0, 0x40800000 = 0.5
    u = np.array([0x42640000, 0xC2640000, 0x41100000, 0x40800000, 0x00000000], np.uint32)
    np.testing.assert_allclose(ibm2ieee(u), [100.0, -100.0, 1.0, 0.5, 0.0], rtol=1e-6)


def test_ibm_roundtrip():
    rng = np.random.default_rng(80)
    x = np.concatenate([
        rng.normal(0, 1, 1000), rng.normal(0, 1e4, 1000), rng.normal(0, 1e-4, 1000),
        [0.0, 1.0, -1.0, 16.0, 1 / 16.0],
    ]).astype(np.float32)
    back = ibm2ieee(ieee2ibm(x))
    np.testing.assert_allclose(back, x, rtol=1e-6, atol=1e-30)


# --------------------------- write/read round trip ---------------------------
@pytest.fixture
def segy_path(tmp_path):
    return str(tmp_path / "test.sgy")


def make_file(path, fmt=5, ntr=15, ns=100, dt_us=250):
    rng = np.random.default_rng(81)
    data = rng.normal(size=(ntr, ns)).astype(np.float32)
    headers = {
        "FieldRecord": np.arange(1, ntr + 1),
        "SourceX": (np.linspace(500000, 500100, ntr) * 100).astype(np.int64),
        "SourceY": (np.linspace(6000000, 6000050, ntr) * 100).astype(np.int64),
        "SourceGroupScalar": -100,
        "CoordinateUnits": 1,
        "DelayRecordingTime": 50,
        "YearDataRecorded": 2020,
        "DayOfYear": 100,
        "HourOfDay": np.arange(ntr) % 24,
    }
    write_segy(path, data, headers=headers, fmt=fmt, dt_us=dt_us,
               text="Survey XYZ\nLine 001")
    return data, headers


@pytest.mark.parametrize("fmt", [5, 1, 3, 2])
def test_roundtrip_formats(segy_path, fmt):
    scale = 1000.0 if fmt in (2, 3) else 1.0  # int formats need integer-range data
    rng = np.random.default_rng(82)
    data = (rng.normal(size=(7, 64)) * scale).astype(np.float32)
    if fmt in (2, 3):
        data = np.rint(data).astype(np.float32)
    write_segy(segy_path, data, fmt=fmt, dt_us=500)
    with SegyFile(segy_path) as f:
        assert f.n_traces == 7
        assert f.n_samples == 64
        assert f.dt_us == 500
        assert f.format == fmt
        got = f.trace_data()
    rtol = 1e-6 if fmt in (5, 2, 3) else 1e-5
    np.testing.assert_allclose(got, data, rtol=rtol, atol=1e-6 * scale)


def test_header_access(segy_path):
    data, headers = make_file(segy_path)
    with SegyFile(segy_path) as f:
        np.testing.assert_array_equal(f.header("FieldRecord"), headers["FieldRecord"])
        np.testing.assert_array_equal(f.header("SourceX"), headers["SourceX"])
        assert (f.header("SourceGroupScalar") == -100).all()
        assert (f.header("DelayRecordingTime") == 50).all()
        # access by raw byte offset
        np.testing.assert_array_equal(f.header(9), headers["FieldRecord"])
        df = f.headers_dataframe(["FieldRecord", "SourceX", "HourOfDay"])
        assert list(df.columns) == ["FieldRecord", "SourceX", "HourOfDay"]
        assert len(df) == 15


def test_binary_header(segy_path):
    make_file(segy_path)
    with SegyFile(segy_path) as f:
        assert f.bin["Samples"] == 100
        assert f.bin["Interval"] == 250
        assert f.bin["SEGYRevision"] == 256


def test_partial_trace_read(segy_path):
    data, _ = make_file(segy_path)
    with SegyFile(segy_path) as f:
        got = f.trace_data(traces=[3, 7, 11])
    np.testing.assert_allclose(got, data[[3, 7, 11]], rtol=1e-6)


def test_raw_header_passthrough(segy_path, tmp_path):
    data, headers = make_file(segy_path)
    out2 = str(tmp_path / "copy.sgy")
    with SegyFile(segy_path) as f:
        write_segy(out2, f.trace_data(), raw_trace_headers=f.trace_headers_raw(),
                   fmt=5, dt_us=f.dt_us)
    with SegyFile(out2) as f:
        np.testing.assert_array_equal(f.header("SourceX"), headers["SourceX"])
        assert (f.header("DelayRecordingTime") == 50).all()


# --------------------------- coordinate scaling ------------------------------
def test_scale_coordinates(segy_path):
    make_file(segy_path)
    with SegyFile(segy_path) as f:
        x, y, units = scale_coordinates(f)
    assert units == 1
    np.testing.assert_allclose(x, np.linspace(500000, 500100, 15), atol=0.01)
    np.testing.assert_allclose(y, np.linspace(6000000, 6000050, 15), atol=0.01)


def test_unscale_roundtrip():
    x = np.array([500000.123, 500010.456])
    xi, yi = unscale_coordinates(x, x, scale_factor=-100)
    assert xi.dtype == np.int32
    np.testing.assert_allclose(xi / 100.0, x, atol=0.01)


def test_check_coordinate_scalar():
    assert check_coordinate_scalar("auto") == -100
    assert check_coordinate_scalar(-1000) == -1000
    with pytest.raises(ValueError):
        check_coordinate_scalar(-37)


# --------------------------- textual header ----------------------------------
def test_textual_roundtrip():
    raw = encode_textual_header("Hello World\nSecond line")
    assert len(raw) == 3200
    text = decode_textual_header(raw)
    lines = text.split("\n")
    assert len(lines) == 40
    assert "Hello World" in lines[0]
    assert "Second line" in lines[1]
    assert lines[5].startswith("C06")


def test_ebcdic_decode():
    raw = encode_textual_header("EBCDIC test line", ebcdic=True)
    text = decode_textual_header(raw)
    assert "EBCDIC test line" in text


def test_processing_provenance():
    text = decode_textual_header(encode_textual_header("Survey"))
    text = add_processing_entry(text, "STATIC CORRECTION", prefix="2024-01-15")
    text = add_processing_entry(text, "TIDE COMP", prefix="2024-01-15")
    text = add_processing_entry(text, "DESPIKE", prefix="2024-02-01")
    entries = get_processing_entries(text)
    assert any("STATIC CORRECTION" in e and "TIDE COMP" in e for e in entries)
    assert any("DESPIKE" in e for e in entries)
    assert "***** PROCESSING WORKFLOW *****" in text
    # header re-encodes cleanly
    assert len(encode_textual_header(text)) == 3200


def test_provenance_survives_segy_roundtrip(tmp_path):
    path = str(tmp_path / "prov.sgy")
    text = decode_textual_header(encode_textual_header("Line 42"))
    text = add_processing_entry(text, "MERGE", prefix="2023-12-01")
    write_segy(path, np.zeros((2, 10), np.float32), text=text, dt_us=100)
    with SegyFile(path) as f:
        assert "MERGE" in f.text
        assert "Line 42" in f.text


def test_ieee2ibm_saturates_out_of_range():
    """Magnitudes outside the IBM float range must saturate/flush, not wrap
    to a wrong exponent (ADVICE r1). IBM max (~7.2e75) exceeds the float32
    range, so the saturated patterns are checked at the bit level."""
    x = np.array([1e78, -1e78, 1e-80, -1e-80, 0.0, 1.0, np.inf, np.nan],
                 np.float64)
    enc = ieee2ibm(x)
    IBM_MAX = 0x7FFFFFFF  # sign=0, exp=127, mantissa all ones
    assert enc[0] == IBM_MAX
    assert enc[1] == (IBM_MAX | 0x80000000)
    assert enc[2] == 0 and enc[3] == 0 and enc[4] == 0
    assert enc[6] == IBM_MAX
    assert enc[7] == 0
    back = ibm2ieee(enc)
    assert back[5] == 1.0
    # within-range values still round-trip after the saturation change
    y = np.array([3.0e38, -1.2e-38, 123.456], np.float64)
    assert np.allclose(ibm2ieee(ieee2ibm(y)).astype(np.float64), y, rtol=1e-6)


# --------------------- ExtendedHeaders=-1 EndText scan -----------------------
def _insert_extended_stanzas(path, stanzas):
    """Set ExtendedHeaders=-1 and splice `stanzas` (3200-byte each) between
    the binary header and the trace data."""
    raw = bytearray(open(path, "rb").read())
    raw[3504:3506] = (-1).to_bytes(2, "big", signed=True)
    blocks = b"".join(s.ljust(3200)[:3200] if isinstance(s, bytes)
                      else s.encode("ascii").ljust(3200)[:3200]
                      for s in stanzas)
    raw[3600:3600] = blocks
    open(path, "wb").write(bytes(raw))


@pytest.mark.parametrize("encoding", ["ascii", "cp037"])
def test_extended_headers_endtext_scan(segy_path, encoding):
    """ExtendedHeaders=-1: stanzas are scanned until the '((SEG: EndText))'
    terminator — in EITHER textual encoding (EBCDIC extended headers are
    legal wherever EBCDIC main headers are; the scan used to match ASCII
    only and walked into the trace data)."""
    data, _ = make_file(segy_path)
    end = "((SEG: EndText))".encode(encoding)
    _insert_extended_stanzas(segy_path,
                             [b"extra metadata stanza one", end])
    with SegyFile(segy_path) as f:
        assert f.n_traces == data.shape[0]
        np.testing.assert_allclose(f.trace_data(), data, rtol=1e-6)


def test_extended_headers_no_endtext_raises(segy_path):
    data, _ = make_file(segy_path)
    raw = bytearray(open(segy_path, "rb").read())
    raw[3504:3506] = (-1).to_bytes(2, "big", signed=True)
    open(segy_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="EndText"):
        SegyFile(segy_path)


def test_write_unsigned16_field_rejects_negative(tmp_path):
    """A negative count/interval would round-trip through the reader's
    unsigned normalization as a huge positive value — write must refuse."""
    data = np.zeros((3, 10), np.float32)
    with pytest.raises(ValueError, match="TRACE_SAMPLE_INTERVAL"):
        write_segy(str(tmp_path / "neg.sgy"), data,
                   headers={"TRACE_SAMPLE_INTERVAL": -250}, dt_us=250)
    # the unsigned range itself still round-trips
    p = str(tmp_path / "big.sgy")
    write_segy(p, data, headers={"TRACE_SAMPLE_INTERVAL": 40000}, dt_us=250)
    with SegyFile(p) as f:
        assert int(f.header("TRACE_SAMPLE_INTERVAL")[0]) == 40000


def test_int_format_nan_encodes_to_zero(tmp_path):
    """NaN samples encode to 0 in the integer formats like the IBM path —
    the float->int cast of NaN is undefined (a full-scale spike)."""
    data = np.array([[1.0, np.nan, -2.0, np.inf, -np.inf]], np.float32)
    for fmt in (2, 3, 8):
        p = str(tmp_path / f"nan_{fmt}.sgy")
        write_segy(p, data, fmt=fmt, dt_us=250)
        with SegyFile(p) as f:
            out = f.trace_data()[0]
        assert out[1] == 0.0, (fmt, out)
        info = np.iinfo({2: np.int32, 3: np.int16, 8: np.int8}[fmt])
        assert out[3] == info.max and out[4] == info.min  # inf saturates


def test_binary_header_signed_unsigned_split(tmp_path):
    """Binary i2 fields mirror the reader: count/interval fields take the
    unsigned range, everything else is signed (ExtendedHeaders=-1 is the
    legal rev1 'variable count'); i4 fields range-check loudly."""
    data = np.zeros((2, 8), np.float32)
    p = str(tmp_path / "b.sgy")
    # signed field: -1 legal, 40000 rejected
    write_segy(p, data, dt_us=250, bin_updates={"EnsembleFold": -1})
    with pytest.raises(ValueError, match="EnsembleFold"):
        write_segy(p, data, dt_us=250, bin_updates={"EnsembleFold": 40000})
    # unsigned field: 40000 legal and round-trips via the reader's
    # normalization
    write_segy(p, data, dt_us=40000)
    with SegyFile(p) as f:
        assert f.dt_us == 40000
    with pytest.raises(ValueError, match="32-bit"):
        write_segy(p, data, dt_us=250, bin_updates={"JobID": 2**31})


def test_trace_header_i4_overflow_raises(tmp_path):
    data = np.zeros((2, 8), np.float32)
    with pytest.raises(ValueError, match="32-bit"):
        write_segy(str(tmp_path / "o.sgy"), data, dt_us=250,
                   headers={"CDP_X": 2_500_000_000})


def test_write_segy_warns_without_interval(tmp_path):
    data = np.zeros((2, 8), np.float32)
    with pytest.warns(UserWarning, match="sample interval"):
        write_segy(str(tmp_path / "w.sgy"), data)


def test_no_spurious_dt_warning_with_preserved_binary_header(tmp_path):
    """write_segy(raw_binary_header=src.binary_header_raw()) preserves the
    source's non-zero Interval, so the missing-sample-interval warning must
    not fire (it used to ignore raw_binary_header and warn 'readers will
    see dt_us == 0' on every such rewrite)."""
    import warnings

    from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy

    p1 = str(tmp_path / "a.sgy")
    data = np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32)
    write_segy(p1, data, dt_us=50)
    with SegyFile(p1) as f:
        raw_bin = f.binary_header_raw()
        d = f.trace_data()
    p2 = str(tmp_path / "b.sgy")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        write_segy(p2, d, raw_binary_header=raw_bin)
    with SegyFile(p2) as f:
        assert f.dt_us == 50
    # and the warning still fires when the preserved header has Interval==0
    raw_zero = np.array(raw_bin, np.uint8).copy()
    raw_zero[3217 - 3201:3219 - 3201] = 0
    with pytest.warns(UserWarning, match="dt_us == 0"):
        write_segy(str(tmp_path / "c.sgy"), d, raw_binary_header=raw_zero)


def test_header_tuple_spec_roundtrip(tmp_path):
    """(offset, dtype) field specs read/write arbitrary header bytes —
    the transport for the reference's --byte_delay option."""
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy

    p = str(tmp_path / "t.sgy")
    vals = np.arange(-3, 4, dtype=np.int64)
    write_segy(p, np.zeros((7, 16), np.float32), dt_us=250,
               headers={(233, "i2"): vals, (181, "i4"): vals * 100000})
    with SegyFile(p) as f:
        np.testing.assert_array_equal(f.header((233, "i2")), vals)
        np.testing.assert_array_equal(f.header((181, "i4")), vals * 100000)
        # a tuple spec over a standard field agrees with the named read
        np.testing.assert_array_equal(f.header((109, "i2")),
                                      f.header("DelayRecordingTime"))
    # range check still applies to tuple-keyed i2 fields
    import pytest as _pytest
    with _pytest.raises(ValueError, match="16-bit"):
        write_segy(p, np.zeros((1, 16), np.float32), dt_us=250,
                   headers={(233, "i2"): 70000})
