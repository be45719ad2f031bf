"""Tests for auxiliary IO: datalists, sidecars, navigation, exports,
backends flags."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from pseudo_3d_interpolation_tpu import backends
from pseudo_3d_interpolation_tpu.io import auxiliary as aux
from pseudo_3d_interpolation_tpu.io.segy import write_segy


def make_segy(path, ntr=10, x0=0.0):
    write_segy(path, np.zeros((ntr, 20), np.float32), headers={
        "SourceX": (np.arange(ntr) * 100 + int(x0 * 100)).astype(np.int64),
        "SourceY": np.full(ntr, 500),
        "SourceGroupScalar": -100, "CoordinateUnits": 1,
    }, fmt=5, dt_us=250)


def test_resolve_single_file(tmp_path):
    p = str(tmp_path / "a.sgy")
    make_segy(p)
    assert aux.resolve_input_files(p) == [p]


def test_resolve_directory_with_filters(tmp_path):
    for name in ["x_one_UTM.sgy", "x_two_UTM.sgy", "y_one_UTM.sgy"]:
        make_segy(str(tmp_path / name))
    files = aux.resolve_input_files(str(tmp_path), fnprefix="x_")
    assert len(files) == 2


def test_resolve_datalist(tmp_path):
    make_segy(str(tmp_path / "a.sgy"))
    make_segy(str(tmp_path / "b.sgy"))
    dl = str(tmp_path / "list.txt")
    with open(dl, "w") as f:
        f.write("a.sgy\n# comment\nb.sgy\n")
    files = aux.resolve_input_files(dl)
    assert [os.path.basename(f) for f in files] == ["a.sgy", "b.sgy"]


def test_resolve_invalid(tmp_path):
    with pytest.raises(IOError):
        aux.resolve_input_files(str(tmp_path / "missing.foo"))


def test_line_name():
    assert aux.line_name("/data/20200101_line7_UTM60S_despk.sgy") == "20200101_line7"
    assert aux.line_name("noline.sgy") == "noline"


def test_extract_navigation_and_sidecars(tmp_path):
    make_segy(str(tmp_path / "l1_UTM.sgy"), x0=0)
    make_segy(str(tmp_path / "l2_UTM.sgy"), x0=50)
    df = aux.extract_navigation(str(tmp_path), write_sidecars=True)
    assert {"tracl", "x", "y", "line"} <= set(df.columns)
    assert len(df) == 20
    assert os.path.exists(str(tmp_path / "l1_UTM.nav"))
    merged = aux.read_auxiliary_files(str(tmp_path), ".nav")
    assert merged is not None and len(merged) == 20


def test_export_coords_csv_and_geojson(tmp_path):
    df = pd.DataFrame({
        "x": [0.0, 1.0, 2.0], "y": [0.0, 0.5, 1.0],
        "line": ["A", "A", "A"], "tracl": [1, 2, 3],
    })
    p_csv = aux.export_coords(df, str(tmp_path / "nav.csv"))
    assert os.path.exists(p_csv)
    p_gj = aux.export_coords(df, str(tmp_path / "nav.geojson"))
    gj = json.load(open(p_gj))
    assert gj["type"] == "FeatureCollection"
    assert gj["features"][0]["geometry"]["type"] == "LineString"
    assert len(gj["features"][0]["geometry"]["coordinates"]) == 3


def test_backends_summary():
    s = backends.summary()
    assert s["platform"] in ("cpu", "tpu", "axon")
    assert s["native_segy"] in (True, False)
    assert "FFT" in s["transforms"]


def test_gpkg_writer_produces_valid_geopackage(tmp_path):
    """io/gpkg.py: the mistie QC GeoPackage (reference writes one via
    geopandas, mistie_correction_segy.py:629-703) must be a spec-conforming
    SQLite db: GPKG application_id, registry tables, and decodable
    GeoPackageBinary POINT blobs."""
    import sqlite3
    import struct

    import pandas as pd

    from pseudo_3d_interpolation_tpu.io.gpkg import write_gpkg_points

    df = pd.DataFrame({
        "x": [500010.5, 500120.0], "y": [6000050.0, 6000300.25],
        "line_a": ["L1", "L1"], "line_b": ["L2", "L3"],
        "mistie_ms": [1.25, -0.5], "correlation": [0.91, 0.82],
        "trace_a": [10, 42],
    })
    path = write_gpkg_points(str(tmp_path / "qc.gpkg"),
                             {"intersections": (df, "x", "y")},
                             srs_id=32632, srs_name="WGS 84 / UTM 32N")
    con = sqlite3.connect(path)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47  # 'GPKG'
        tables = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"gpkg_spatial_ref_sys", "gpkg_contents",
                "gpkg_geometry_columns", "intersections"} <= tables
        (tname, dtype, srs) = con.execute(
            "SELECT table_name, data_type, srs_id FROM gpkg_contents"
        ).fetchone()
        assert (tname, dtype, srs) == ("intersections", "features", 32632)
        rows = con.execute(
            "SELECT geom, line_a, mistie_ms, correlation, trace_a "
            "FROM intersections ORDER BY fid").fetchall()
        assert len(rows) == 2 and rows[0][1] == "L1" and rows[1][4] == 42
        blob = rows[1][0]
        assert blob[:2] == b"GP" and blob[2] == 0
        srs_id = struct.unpack_from("<i", blob, 4)[0]
        assert srs_id == 32632
        # little-endian WKB POINT after the 8-byte header
        assert blob[8] == 1 and struct.unpack_from("<I", blob, 9)[0] == 1
        x, y = struct.unpack_from("<dd", blob, 13)
        assert (x, y) == (500120.0, 6000300.25)
    finally:
        con.close()


def test_line_name_splitter_first_falls_back_to_stem():
    """Zone-first names ('UTM33N_line1') must not collapse distinct
    profiles onto the empty line name (silent sidecar mis-joins)."""
    from pseudo_3d_interpolation_tpu.io.auxiliary import line_name

    assert line_name("/d/UTM33N_line1.sgy") == "UTM33N_line1"
    assert line_name("/d/lineA_001_UTM33N_proc.sgy") == "lineA_001"


def test_export_coords_point_branch_numpy_scalars(tmp_path):
    """json.dump rejects np.int64 — the Point branch must .item() numpy
    scalars instead of relying on pandas object-upcasting."""
    import json

    import pandas as pd

    from pseudo_3d_interpolation_tpu.io.auxiliary import export_coords

    # all-numeric frame: iterrows yields numpy scalars, not Python ones
    df = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0],
                       "trace_a": np.array([10, 20], np.int64)})
    p = export_coords(df, str(tmp_path / "pts.geojson"))
    gj = json.load(open(p))
    assert gj["features"][0]["properties"]["trace_a"] == 10


def test_scale_coordinates_zero_trace_file(tmp_path):
    """A valid-but-empty SEG-Y (aborted line) yields empty coordinate
    arrays instead of an IndexError that aborts a directory scan."""
    from pseudo_3d_interpolation_tpu.io.headers import scale_coordinates
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile, write_segy

    p = str(tmp_path / "empty.sgy")
    write_segy(p, np.zeros((1, 16), np.float32), dt_us=250)
    # truncate to just the 3600-byte file headers: a structurally valid
    # zero-trace file (external tools write these for aborted lines)
    with open(p, "r+b") as fh:
        fh.truncate(3600)
    with SegyFile(p) as f:
        assert f.n_traces == 0
        x, y, units = scale_coordinates(f)
    assert x.size == 0 and y.size == 0
