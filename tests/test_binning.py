"""Geometry (Affine) and binning/stacking tests."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import binning as bn
from pseudo_3d_interpolation_tpu.ops.affine import Affine, coords_to_ilxl_transform, points_from_extent


# --------------------------- Affine ----------------------------------------
def test_affine_identity():
    a = Affine()
    p = np.array([[1.0, 2.0], [3.0, -4.0]])
    np.testing.assert_allclose(a.transform(p), p)


def test_affine_translate_scale_rotate():
    t = Affine().translation((1, 2)).scaling(2.0)
    np.testing.assert_allclose(t.transform([1.0, 1.0]), [4.0, 6.0])
    r = Affine().rotation(90.0)
    np.testing.assert_allclose(r.transform([1.0, 0.0]), [0.0, 1.0], atol=1e-12)


def test_affine_inverse_roundtrip():
    rng = np.random.default_rng(70)
    t = Affine().rotation(33.0).scaling((2.0, 0.5)).translation((10.0, -5.0))
    p = rng.normal(size=(20, 2))
    np.testing.assert_allclose(t.inverse().transform(t.transform(p)), p, atol=1e-9)


def test_affine_rotate_around():
    t = Affine().rotate_around(180.0, origin=(1.0, 1.0))
    np.testing.assert_allclose(t.transform([2.0, 1.0]), [0.0, 1.0], atol=1e-12)
    # origin is fixed point
    np.testing.assert_allclose(t.transform([1.0, 1.0]), [1.0, 1.0], atol=1e-12)


def test_affine_compose_order():
    a = Affine().translation((1.0, 0.0))
    b = Affine().scaling(2.0)
    # (b @ a): apply a first
    np.testing.assert_allclose((b @ a).transform([1.0, 1.0]), [4.0, 2.0])
    np.testing.assert_allclose(a.then(b).transform([1.0, 1.0]), [4.0, 2.0])


def test_affine_immutable():
    a = Affine()
    with pytest.raises(AttributeError):
        a.matrix = np.eye(3)
    b = a.rotation(10.0)
    assert b is not a
    np.testing.assert_allclose(a.matrix, np.eye(3))


# --------------------------- grid setup -------------------------------------
def test_coords_to_ilxl_axis_aligned():
    # 100 x 50 m extent, 10 m bins -> 10 ilines x 5 xlines
    t, n_il, n_xl = coords_to_ilxl_transform(extent=(0, 100, 0, 50), spacing=10.0)
    assert (n_il, n_xl) == (10, 5)
    # first bin center (5, 5) -> (il, xl) == (1, 1)
    np.testing.assert_allclose(t.transform([5.0, 5.0]), [1.0, 1.0], atol=1e-9)
    # last bin center
    np.testing.assert_allclose(t.transform([95.0, 45.0]), [10.0, 5.0], atol=1e-9)


def test_coords_to_ilxl_single_line_axis():
    """A one-bin-wide extent must round every in-bin coordinate to line 1
    (not divide by zero) AND stay invertible — bin_cube needs inverse()
    for the bin centers (a 20 m x 40 m grid at 20 m spacing: one iline)."""
    t, n_il, n_xl = coords_to_ilxl_transform(extent=(0, 20, 0, 40), spacing=20.0)
    assert (n_il, n_xl) == (1, 2)
    out = t.transform(np.array([[4.0, 10.0], [12.0, 30.0]]))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.round(out), [[1.0, 1.0], [1.0, 2.0]])
    centers = t.inverse().transform(np.array([[1.0, 1.0], [1.0, 2.0]]))
    np.testing.assert_allclose(centers, [[10.0, 10.0], [10.0, 30.0]], atol=1e-9)


def test_bin_cube_single_iline_grid(tmp_path):
    """End-to-end binning of a one-iline survey (the degenerate grid that
    used to crash at t.inverse() with a singular matrix)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.pipeline.binning import (BinningGeometry,
                                                              bin_cube)

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=8, ns=32, seed=1,
                 x0=10.0, y0=4.0, heading=(0, 1), spacing=5.0)
    geom = BinningGeometry(spacing=20.0, extent=(0.0, 20.0, 0.0, 40.0))
    cube = bin_cube(str(survey), geom)
    amp = np.asarray(cube["amp"])
    fold = np.asarray(cube["fold"])
    assert amp.shape[:2] == (1, 2)
    assert fold.sum() == 8 and np.isfinite(amp).all()


def test_coords_to_ilxl_rotated():
    angle = 30.0
    base = Affine().rotate_around(-angle, origin=(0.0, 0.0))
    corners_unrot = points_from_extent((0, 100, 0, 50))
    rot = Affine().rotate_around(angle, origin=(0.0, 0.0))
    t, n_il, n_xl = coords_to_ilxl_transform(
        corner_points=corners_unrot, spacing=10.0, base_transform=base
    )
    # a rotated-world point lands on the same grid node as its unrotated twin
    p_world = rot.transform([5.0, 5.0])
    np.testing.assert_allclose(t.transform(p_world), [1.0, 1.0], atol=1e-9)


# --------------------------- binning ----------------------------------------
@pytest.fixture
def grid():
    t, n_il, n_xl = coords_to_ilxl_transform(extent=(0, 40, 0, 20), spacing=10.0)
    return t, n_il, n_xl  # 4 x 2 grid


def test_assign_bins(grid):
    t, n_il, n_xl = grid
    x = np.array([5.0, 15.0, 35.0, 100.0])
    y = np.array([5.0, 15.0, 15.0, 5.0])
    il, xl, valid = bn.assign_bins(x, y, t, n_il, n_xl)
    np.testing.assert_array_equal(il[:3], [1, 2, 4])
    np.testing.assert_array_equal(xl[:3], [1, 2, 2])
    assert not valid[3]
    assert valid[:3].all()


def test_fold_and_average(grid):
    t, n_il, n_xl = grid
    n_bins = n_il * n_xl
    # three traces in bin 0, one in bin 5
    ids = np.array([0, 0, 0, 5])
    traces = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [10.0, 20.0]], np.float32)
    fold = np.asarray(bn.fold_map(ids, n_bins))
    assert fold[0] == 3 and fold[5] == 1 and fold.sum() == 4
    out = np.asarray(bn.stack_average(traces, ids, n_bins))
    np.testing.assert_allclose(out[0], [3.0, 4.0])
    np.testing.assert_allclose(out[5], [10.0, 20.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])  # empty bin -> zeros


def test_stack_median():
    ids = np.array([0, 0, 0, 2])
    traces = np.array([[1.0], [100.0], [3.0], [7.0]], np.float32)
    out = np.asarray(bn.stack_traces(traces, ids, 3, method="median"))
    np.testing.assert_allclose(out[0], [3.0])
    np.testing.assert_allclose(out[1], [0.0])
    np.testing.assert_allclose(out[2], [7.0])


def test_stack_nearest():
    ids = np.array([0, 0, 1])
    dist = np.array([5.0, 1.0, 2.0])
    traces = np.array([[1.0], [2.0], [3.0]], np.float32)
    out = np.asarray(bn.stack_traces(traces, ids, 2, method="nearest", dist=dist))
    np.testing.assert_allclose(out[0], [2.0])  # closest trace wins
    np.testing.assert_allclose(out[1], [3.0])


def test_stack_idw():
    ids = np.array([0, 0])
    dist = np.array([1.0, 3.0])
    traces = np.array([[0.0], [4.0]], np.float32)
    out = np.asarray(bn.stack_traces(traces, ids, 1, method="idw", dist=dist))
    w = np.array([1.0, 1 / 3.0])
    expected = (w * np.array([0.0, 4.0])).sum() / w.sum()
    np.testing.assert_allclose(out[0], [expected], rtol=1e-5)


def test_pad_traces_to_global_twt():
    traces = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    delrt = np.array([0.0, 2.0])  # second trace starts 2 samples later (dt=1)
    out = np.asarray(bn.pad_traces_to_global_twt(traces, delrt, twt0=0.0, dt=1.0, n_samples_out=6))
    np.testing.assert_allclose(out[0], [1, 2, 3, 0, 0, 0])
    np.testing.assert_allclose(out[1], [0, 0, 4, 5, 6, 0])


def test_pad_traces_edge_windows():
    """Negative offsets (trace starts before the window) truncate the head;
    offsets past the window end drop the trace; partial tail overlap keeps
    only the in-window samples. Pinned after the numpy rewrite of the pad."""
    traces = np.array([[1.0, 2.0, 3.0]] * 4, np.float32)
    delrt = np.array([-2.0, 5.0, 4.0, -9.0])  # dt=1, twt0=0, window 6
    out = np.asarray(bn.pad_traces_to_global_twt(traces, delrt, twt0=0.0, dt=1.0, n_samples_out=6))
    np.testing.assert_allclose(out[0], [3, 0, 0, 0, 0, 0])  # head truncated
    np.testing.assert_allclose(out[1], [0, 0, 0, 0, 0, 1])  # tail clipped
    np.testing.assert_allclose(out[2], [0, 0, 0, 0, 1, 2])
    np.testing.assert_allclose(out[3], [0, 0, 0, 0, 0, 0])  # fully before window

    # reference loop implementation agreement on random offsets
    rng = np.random.default_rng(3)
    tr = rng.normal(size=(40, 7)).astype(np.float32)
    dl = rng.integers(-8, 12, 40).astype(np.float64)
    got = np.asarray(bn.pad_traces_to_global_twt(tr, dl, twt0=0.0, dt=1.0, n_samples_out=10))
    want = np.zeros((40, 10), np.float32)
    for i in range(40):
        for t in range(10):
            s = t - int(dl[i])
            if 0 <= s < 7:
                want[i, t] = tr[i, s]
    np.testing.assert_array_equal(got, want)


def test_end_to_end_binning(grid):
    """Scatter 200 random traces; check average stack against a loop."""
    t, n_il, n_xl = grid
    rng = np.random.default_rng(71)
    x = rng.uniform(0, 40, 200)
    y = rng.uniform(0, 20, 200)
    traces = rng.normal(size=(200, 16)).astype(np.float32)
    il, xl, valid = bn.assign_bins(x, y, t, n_il, n_xl)
    ids = bn.bin_index(il[valid], xl[valid], n_xl)
    n_bins = n_il * n_xl
    out = np.asarray(bn.stack_average(traces[valid], ids, n_bins))
    fold = np.asarray(bn.fold_map(ids, n_bins))
    for b in range(n_bins):
        sel = traces[valid][ids == b]
        assert fold[b] == len(sel)
        if len(sel):
            np.testing.assert_allclose(out[b], sel.mean(axis=0), rtol=1e-4, atol=1e-5)


def test_region_grid_indexing():
    """Nested region: cube indices live on the master grid with steps."""
    from pseudo_3d_interpolation_tpu.pipeline.binning import BinningGeometry

    geom = BinningGeometry(
        spacing=20.0,                      # coarse cube bins
        extent=(40.0, 120.0, 20.0, 60.0),  # sub-area
        region_extent=(0.0, 200.0, 0.0, 100.0),
        region_spacing=10.0,               # fine master grid
    )
    t, il_idx, xl_idx = geom.transforms()
    # master grid: 20 x 10 lines; cube sub-range with step 2
    assert il_idx[0] >= 4 and il_idx[-1] <= 13
    assert np.all(np.diff(il_idx) == 2)
    assert np.all(np.diff(xl_idx) == 2)
    # a trace at a master-grid node inside the cube snaps to a listed line
    from pseudo_3d_interpolation_tpu.ops import binning as bnops

    x = np.array([65.0])  # master il = (65-5)/10+1 = 7
    y = np.array([35.0])
    pi, px, valid = bnops.assign_bins_indexed(x, y, t, il_idx, xl_idx)
    assert valid[0]
    assert il_idx[pi[0]] in (6, 7, 8)


def test_assign_bins_indexed_matches_simple():
    """With step-1 indices the indexed path equals the simple path."""
    from pseudo_3d_interpolation_tpu.ops.affine import coords_to_ilxl_transform

    t, n_il, n_xl = coords_to_ilxl_transform(extent=(0, 40, 0, 20), spacing=10.0)
    rng = np.random.default_rng(140)
    x = rng.uniform(0, 40, 100)
    y = rng.uniform(0, 20, 100)
    il, xl, v1 = bn.assign_bins(x, y, t, n_il, n_xl)
    pi, px, v2 = bn.assign_bins_indexed(x, y, t, np.arange(1, n_il + 1),
                                        np.arange(1, n_xl + 1))
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(il[v1], pi[v2] + 1)
    np.testing.assert_array_equal(xl[v1], px[v2] + 1)


def test_bin_cube_nearest_streaming_semantics(tmp_path):
    """The streaming nearest path must keep exactly the trace closest to
    each bin center, across files and trace blocks (it replaced the
    hold-all-traces path; reference nearest stacking
    cube_binning_3D.py:1128-1149)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile
    from pseudo_3d_interpolation_tpu.pipeline.binning import (BinningGeometry,
                                                              bin_cube)

    survey = tmp_path / "survey"
    survey.mkdir()
    # two parallel lines in the SAME iline column of the 20 m grid (bin
    # centers at x=10): line B (x=12, 2 m off-center) always beats
    # line A (x=4, 6 m off-center)
    make_profile(str(survey / "lineA_UTM.sgy"), ntr=8, ns=32, seed=1,
                 x0=4.0, y0=4.0, heading=(0, 1), spacing=5.0,
                 times_start="2023-05-01T10:00:00")
    make_profile(str(survey / "lineB_UTM.sgy"), ntr=8, ns=32, seed=2,
                 x0=12.0, y0=4.0, heading=(0, 1), spacing=5.0,
                 times_start="2023-05-01T11:00:00")
    geom = BinningGeometry(spacing=20.0, extent=(0.0, 40.0, 0.0, 40.0),
                           stacking_method="nearest")
    cube = bin_cube(str(survey), geom, trace_block=3)  # force block splits
    with SegyFile(str(survey / "lineB_UTM.sgy")) as f:
        data_b = f.trace_data()
    amp = np.asarray(cube["amp"])
    fold = np.asarray(cube["fold"])
    assert amp.shape[:2] == (2, 2)
    assert fold[1].sum() == 0  # il column at x=30 sees no traces
    # line B ys are 4,9,...,39; nearest to bin center y=10 is the y=9
    # trace (index 1), nearest to y=30 is the y=29 trace (index 5)
    np.testing.assert_allclose(amp[0, 0, :32], data_b[1], rtol=1e-5)
    np.testing.assert_allclose(amp[0, 1, :32], data_b[5], rtol=1e-5)


def test_bin_cube_idw_f32_weight_arithmetic(tmp_path):
    """The streaming IDW accumulation multiplies each trace by its weight
    cast to float32 FIRST (same arithmetic as the pre-segment-sum
    np.add.at path, and no block-sized float64 temporary): the cube must
    equal a mirror built with f32 weights bit for bit."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile
    from pseudo_3d_interpolation_tpu.pipeline.binning import (BinningGeometry,
                                                              bin_cube)

    survey = tmp_path / "survey"
    survey.mkdir()
    # one line 2 m off the il bin-center column: 8 traces at (12, 4+5k);
    # ns even and delrt constant, so global-TWT padding is the identity
    make_profile(str(survey / "lineA_UTM.sgy"), ntr=8, ns=128, seed=7,
                 x0=12.0, y0=4.0, heading=(0, 1), spacing=5.0)
    geom = BinningGeometry(spacing=20.0, extent=(0.0, 20.0, 0.0, 40.0),
                           stacking_method="idw", idw_power=1.0)
    cube = bin_cube(str(survey), geom)
    amp = np.asarray(cube["amp"])
    assert amp.shape[:2] == (1, 2)

    with SegyFile(str(survey / "lineA_UTM.sgy")) as f:
        data = f.trace_data()
    ys = 4.0 + 5.0 * np.arange(8)
    for xl, yc in ((0, 10.0), (1, 30.0)):
        rows = np.flatnonzero((ys >= 20.0 * xl) & (ys < 20.0 * (xl + 1)))
        d = np.hypot(12.0 - 10.0, ys[rows] - yc)
        w = 1.0 / (d**1.0 + 1e-10)                      # float64, as computed
        wf = w.astype(np.float32)                       # cast BEFORE multiply
        num = np.add.reduceat(data[rows] * wf[:, None], [0], axis=0)[0]
        den = np.float32(np.sum(w))                     # accumulated in f64
        np.testing.assert_array_equal(amp[0, xl], num / den)


def test_assign_bins_indexed_local_step_tolerance():
    """Nested-region index lists change step along the list: validity must
    use the LOCAL step, not the first two entries' (traces in the coarser
    region were silently dropped)."""
    from pseudo_3d_interpolation_tpu.ops.affine import Affine

    t = Affine()  # identity: coords ARE fractional line numbers
    il = [1, 3, 5, 9, 13]
    # 10.8 is 1.8 from line 9 — inside half the local step (4/2=2), but
    # outside half the first step (2/2=1)
    pi, px, ok = __import__("pseudo_3d_interpolation_tpu.ops.binning",
                            fromlist=["x"]).assign_bins_indexed(
        [10.8], [1.0], t, il, [1, 2, 3])
    assert ok[0] and il[pi[0]] == 9
    # descending lists are refused, not silently mis-assigned
    import pytest

    with pytest.raises(ValueError, match="ascending"):
        __import__("pseudo_3d_interpolation_tpu.ops.binning",
                   fromlist=["x"]).assign_bins_indexed(
            [1.0], [1.0], t, [5, 3, 1], [1, 2])


def test_cube_crs_attrs_stamped(tmp_path):
    """BinningGeometry.crs stamps the reference's CRS/bin metadata into the
    cube attrs (cube_binning_3D.py:1184-1199: spatial_ref, epsg,
    measurement_system, bin_units, bin_size)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile

    from pseudo_3d_interpolation_tpu.pipeline.binning import (BinningGeometry,
                                                              bin_cube)

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=8, ns=32, seed=1,
                 x0=10.0, y0=4.0, heading=(0, 1), spacing=5.0)
    geom = BinningGeometry(spacing=20.0, extent=(0.0, 20.0, 0.0, 40.0),
                           crs="EPSG:32633")
    cube = bin_cube(str(survey), geom)
    assert cube.attrs["spatial_ref"] == "EPSG:32633"
    assert cube.attrs["epsg"] == 32633
    assert cube.attrs["measurement_system"] == "m"
    assert cube.attrs["bin_size"] == 20.0
    # geographic CRS -> degrees; anisotropic bins -> per-axis sizes
    g2 = BinningGeometry(spacing=(10.0, 5.0), extent=(0, 1, 0, 1), crs=4326)
    a2 = g2.crs_attrs()
    assert a2["measurement_system"] == "deg"
    assert a2["bin_size_iline"] == 10.0 and a2["bin_size_xline"] == 5.0
    # a bogus spec fails loudly at geometry time, not at write time
    import pytest

    with pytest.raises(ValueError):
        BinningGeometry(spacing=1.0, extent=(0, 1, 0, 1),
                        crs="EPSG:999999").crs_attrs()


def test_spatial_ref_cli_resolution(tmp_path):
    """--spatial-ref accepts a YAML file whose body is the WKT (reference
    --params_spatial_ref), an @file, or a direct spec."""
    import yaml

    from pseudo_3d_interpolation_tpu.cli import _resolve_spatial_ref
    from pseudo_3d_interpolation_tpu.utils.crs import parse_crs

    wkt = ('PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",'
           'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["latitude_of_origin",0],'
           'PARAMETER["central_meridian",15],'
           'PARAMETER["scale_factor",0.9996],'
           'PARAMETER["false_easting",500000],'
           'PARAMETER["false_northing",0],UNIT["metre",1]]')
    y = tmp_path / "crs.yml"
    y.write_text(yaml.safe_dump(wkt))
    got = _resolve_spatial_ref(str(y))
    assert got == wkt and parse_crs(got) is not None
    at = tmp_path / "crs.wkt"
    at.write_text(wkt)
    assert _resolve_spatial_ref(f"@{at}") == wkt
    assert _resolve_spatial_ref("EPSG:32633") == "EPSG:32633"
