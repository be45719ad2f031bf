"""One-config pipeline orchestrator (`p3d run`): declarative step chaining.

Beyond-reference capability test: the reference chains 16 console scripts
by hand; run_pipeline executes a YAML-declared subset in order, flowing
stage-1 outputs through datalists and stage-2 through cube paths.
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pseudo_3d_interpolation_tpu.pipeline.orchestrator import (
    _normalize_steps,
    geometry_from_dict,
    run_pipeline,
)


def test_normalize_steps_forms():
    steps = _normalize_steps([
        {"despike": {"threshold": 5.0}},
        {"step": "static", "mode": "amp"},
        {"delrt_pad": None},
    ])
    assert steps == [("despike", {"threshold": 5.0}),
                     ("static", {"mode": "amp"}),
                     ("delrt-pad", {})]
    with pytest.raises(ValueError, match="unknown step"):
        _normalize_steps([{"frobnicate": {}}])


def test_normalize_steps_required_options():
    # missing required options surface as config-level errors naming the
    # step, not as raw KeyErrors mid-run (ADVICE r2)
    with pytest.raises(ValueError, match="reproject.*src_epsg"):
        _normalize_steps([{"reproject": {"dst_epsg": 32632}}])
    with pytest.raises(ValueError, match="tide.*tide_file"):
        _normalize_steps([{"tide": {}}])
    # both spellings accepted
    _normalize_steps([{"reproject": {"src-epsg": 4326, "dst-epsg": 32632}}])
    _normalize_steps([{"tide": {"tide_file": "x.nc"}}])


def test_geometry_from_dict_bad_spacing_length():
    with pytest.raises(ValueError, match="spacing"):
        geometry_from_dict({"spacing": [10.0, 20.0, 30.0]})


def test_geometry_from_dict_flat_and_yaml(tmp_path):
    g = geometry_from_dict({"spacing": [10.0, 20.0], "extent": [0, 100, 0, 200],
                            "stack": "median"})
    assert g.spacing == (10.0, 20.0) and g.stacking_method == "median"
    y = tmp_path / "geom.yml"
    y.write_text(yaml.safe_dump({
        "bin_size": {"iline": 5.0, "xline": 5.0},
        "extent": [0, 50, 0, 50],
        "rotation": {"angle": 30.0, "center": [1.0, 2.0]},
    }))
    g2 = geometry_from_dict({"geometry_yaml": str(y)})
    assert g2.spacing == (5.0, 5.0) and g2.rotation_angle == 30.0
    assert g2.rotation_center == (1.0, 2.0)


def test_geometry_from_dict_resolves_crs_file_specs(tmp_path):
    """spatial_ref in a pipeline/geometry config accepts the same '@file'
    and .yml WKT indirection as `p3d binning --spatial-ref` (round-3
    review: the orchestrator path bypassed the CLI's resolver)."""
    wkt = tmp_path / "crs.txt"
    wkt.write_text("EPSG:32633\n")
    g = geometry_from_dict({"spacing": 10.0, "extent": [0, 10, 0, 10],
                            "spatial_ref": f"@{wkt}"})
    assert g.crs == "EPSG:32633"
    assert g.crs_attrs()["epsg"] == 32633
    y = tmp_path / "crs.yml"
    y.write_text(yaml.safe_dump({"spatial_ref": "EPSG:25832"}))
    g2 = geometry_from_dict({"spacing": 10.0, "extent": [0, 10, 0, 10],
                             "crs": str(y)})
    assert g2.crs == "EPSG:25832"


def test_run_pipeline_end_to_end(tmp_path):
    """despike -> static -> delrt-pad -> binning -> preprocess -> fft ->
    pocs -> ifft -> postprocess -> cube2segy from ONE config."""
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.io.segy import SegyFile

    survey = tmp_path / "survey"
    survey.mkdir()
    for i in range(6):
        make_profile(str(survey / f"line{i}_UTM.sgy"), ntr=24, ns=64,
                     seed=i, x0=5.0 + i * 10.0, y0=5.0, heading=(0, 1),
                     spacing=10.0,
                     times_start=f"2023-05-01T{10 + i:02d}:00:00")
    cfg = {
        "input": str(survey),
        "workdir": str(tmp_path / "work"),
        "steps": [
            {"despike": {"window": [5, 3], "threshold": 6.0}},
            {"static": {"mode": "amp", "savgol_window": 11}},
            {"delrt-pad": {}},
            {"binning": {"spacing": 10.0, "extent": [0, 60, 0, 240],
                         "stack": "average"}},
            {"preprocess": {"balance": "rms"}},
            {"fft": {}},
            {"pocs": {"params": {"metadata": {
                "transform_kind": "FFT", "version": "fast", "niter": 8,
                "eps": 0.0, "thresh_op": "hard",
                "thresh_model": "exponential", "p_min": 1e-3}},
                "batch": 8}},
            {"ifft": {}},
            {"postprocess": {"agc_win": 0.004}},
            {"cube2segy": {"output": "final.sgy"}},
        ],
    }
    cfg_path = tmp_path / "pipeline.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    final = run_pipeline(str(cfg_path), verbose=0)
    assert final.endswith("final.sgy") and os.path.exists(final)
    with SegyFile(final) as f:
        data = f.trace_data()
        assert np.isfinite(data).all() and np.abs(data).max() > 0
        assert f.n_traces == 6 * 24  # 6 ilines x 24 xlines
    # intermediate artifacts and datalists exist
    work = tmp_path / "work"
    assert (work / "01_despike.txt").exists()
    assert (work / "04_cube.nc").exists()


def test_run_via_cli(tmp_path):
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.cli import main

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=8, ns=32, seed=0)
    cfg = {"input": str(survey), "workdir": str(tmp_path / "w"),
           "steps": [{"despike": {}}]}
    p = tmp_path / "p.yml"
    p.write_text(yaml.safe_dump(cfg))
    assert main(["run", str(p), "-V", "0"]) == 0
    assert (tmp_path / "w" / "01_despike.txt").exists()


def test_run_pipeline_resume(tmp_path):
    """resume=True reuses existing artifacts and re-runs only missing ones."""
    from test_stage1 import make_profile

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=24, ns=64, seed=0)
    cfg = {"input": str(survey), "workdir": str(tmp_path / "w"),
           "steps": [{"despike": {}}, {"static": {"savgol_window": 11}}]}
    run_pipeline(cfg, verbose=0)
    lst = tmp_path / "w" / "01_despike.txt"
    t0 = os.path.getmtime(lst)
    # remove step 2's artifact -> resume skips step 1, re-runs step 2
    os.remove(tmp_path / "w" / "02_static.txt")
    run_pipeline(cfg, verbose=0, resume=True)
    assert os.path.getmtime(lst) == t0          # step 1 not re-run
    assert (tmp_path / "w" / "02_static.txt").exists()


def test_qc_and_checkpointed_pocs_steps(tmp_path):
    """qc side steps write figures without breaking chaining; pocs with
    checkpoint_dir routes to the streaming out-of-core driver."""
    from test_stage1 import make_profile

    survey = tmp_path / "survey"
    survey.mkdir()
    for i in range(4):
        make_profile(str(survey / f"l{i}_UTM.sgy"), ntr=24, ns=64, seed=i,
                     x0=5.0 + i * 10.0, y0=5.0, heading=(0, 1), spacing=10.0,
                     times_start=f"2023-05-01T{10 + i:02d}:00:00")
    cfg = {
        "input": str(survey),
        "workdir": str(tmp_path / "w"),
        "steps": [
            {"binning": {"spacing": 10.0, "extent": [0, 40, 0, 240]}},
            {"qc": {}},
            {"fft": {}},
            {"pocs": {"checkpoint_dir": "ck",
                      "params": {"metadata": {
                          "transform_kind": "FFT", "version": "fast",
                          "niter": 6, "eps": 0.0, "thresh_op": "hard",
                          "thresh_model": "exponential", "p_min": 1e-3}},
                      "batch": 8}},
            {"ifft": {}},
        ],
    }
    final = run_pipeline(cfg, verbose=0)
    assert final.endswith("05_ifft.nc") and os.path.exists(final)
    qc_dir = tmp_path / "w" / "02_qc"
    assert any(p.suffix == ".png" for p in qc_dir.iterdir())
    assert any((tmp_path / "w" / "ck").iterdir())  # checkpoints written


def test_relative_workdir_chaining(tmp_path, monkeypatch):
    """Datalists must chain across steps when workdir is RELATIVE (lines
    are written absolute; relative lines would be re-joined against the
    datalist's directory, doubling the prefix)."""
    from test_stage1 import make_profile

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=24, ns=64, seed=0)
    monkeypatch.chdir(tmp_path)
    cfg = {"input": str(survey), "workdir": "out",
           "steps": [{"despike": {}}, {"static": {"savgol_window": 11}}]}
    run_pipeline(cfg, verbose=0)
    assert (tmp_path / "out" / "02_static.txt").exists()


def test_geometry_yaml_flat_override(tmp_path):
    """Flat step keys override geometry_yaml values instead of being
    silently discarded."""
    y = tmp_path / "g.yml"
    y.write_text(yaml.safe_dump({"spacing": 10.0, "extent": [0, 100, 0, 100],
                                 "stacking_method": "average"}))
    g = geometry_from_dict({"geometry_yaml": str(y), "stack": "median",
                            "twt_limits": [0.0, 2.0]})
    assert g.stacking_method == "median"
    assert g.twt_limits == (0.0, 2.0)
    assert g.extent == (0, 100, 0, 100)  # YAML value preserved


def test_cube2segy_output_name_respected(tmp_path):
    """A user-specified output name is honored even without a .sgy
    extension (it used to be silently replaced by NN_cube.sgy)."""
    from test_stage1 import make_profile

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=24, ns=64, seed=0)
    cfg = {"input": str(survey), "workdir": str(tmp_path / "w"),
           "steps": [
               {"binning": {"spacing": 10.0, "extent": [0, 20, 0, 240]}},
               {"cube2segy": {"output": "final_cube"}},
           ]}
    final = run_pipeline(cfg, verbose=0)
    assert final == str(tmp_path / "w" / "final_cube")
    assert os.path.exists(final)


def test_checkpointed_pocs_default_params(tmp_path):
    """pocs with checkpoint_dir but NO params must use the standard default
    config (it used to crash with a bare KeyError('config'))."""
    from test_stage1 import make_profile

    survey = tmp_path / "survey"
    survey.mkdir()
    for i in range(3):
        make_profile(str(survey / f"l{i}_UTM.sgy"), ntr=24, ns=16, seed=i,
                     x0=5.0 + i * 10.0, y0=5.0, heading=(0, 1), spacing=10.0,
                     times_start=f"2023-05-01T{10 + i:02d}:00:00")
    cfg = {"input": str(survey), "workdir": str(tmp_path / "w"),
           "steps": [
               {"binning": {"spacing": 10.0, "extent": [0, 30, 0, 240]}},
               {"fft": {}},
               {"pocs": {"checkpoint_dir": "ck", "batch": 8}},
           ]}
    final = run_pipeline(cfg, verbose=0)
    assert os.path.exists(final)


def test_dash_spelled_options_reach_the_run_loop():
    """_normalize_steps canonicalizes option keys to underscores: the run
    loop pops underscore keys only, so the accepted dash spelling used to
    pass validation and then crash mid-pipeline with a raw KeyError."""
    steps = _normalize_steps(
        [{"reproject": {"src-epsg": 4326, "dst-epsg": 32632}},
         {"tide": {"tide-file": "x.nc", "coords-bytes": [73, 77]}}])
    assert steps[0] == ("reproject", {"src_epsg": 4326, "dst_epsg": 32632})
    assert steps[1] == ("tide", {"tide_file": "x.nc",
                                 "coords_bytes": [73, 77]})


def test_dash_spelled_step_runs_end_to_end(tmp_path):
    """A dash-spelled required option must actually execute, not only
    validate."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile
    from pseudo_3d_interpolation_tpu.pipeline.orchestrator import run_pipeline

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=6, ns=32, seed=1,
                 x0=500000.0, y0=6000000.0, heading=(0, 1), spacing=5.0)
    cfg = {
        "input": str(survey),
        "workdir": str(tmp_path / "work"),
        "steps": [{"reproject": {"src-epsg": 32632, "dst-epsg": 4326}}],
    }
    arts = run_pipeline(cfg)
    assert arts


def test_cli_spacing_overrides_yaml_bin_size(tmp_path):
    """A geometry YAML that spells `bin_size:` must still lose to an
    explicit flat `spacing` override (the YAML's stale-alias key used to
    shadow the canonicalized override after the merge)."""
    import yaml

    from pseudo_3d_interpolation_tpu.pipeline.orchestrator import geometry_from_dict

    y = tmp_path / "geom.yml"
    y.write_text(yaml.safe_dump({"bin_size": 5.0, "extent": [0, 0, 100, 100]}))
    geom = geometry_from_dict({"geometry_yaml": str(y), "spacing": 10.0})
    assert geom.spacing == 10.0
    # and without an override the YAML's alias spelling still applies
    geom2 = geometry_from_dict({"geometry_yaml": str(y)})
    assert geom2.spacing == 5.0
    # direct dict callers may use either spelling too
    assert geometry_from_dict({"bin_size": 7.5}).spacing == 7.5


def test_binning_step_accepts_crs_and_factor_dist(tmp_path):
    """An orchestrator binning step may carry spatial_ref/factor_dist keys
    (they must route into the geometry, not crash bin_cube)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage1 import make_profile

    from pseudo_3d_interpolation_tpu.io.ncio import read_cube
    from pseudo_3d_interpolation_tpu.pipeline.orchestrator import run_pipeline

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "a_UTM.sgy"), ntr=8, ns=32, seed=1,
                 x0=10.0, y0=4.0, heading=(0, 1), spacing=5.0)
    cfg = {
        "input": str(survey),
        "workdir": str(tmp_path / "wk"),
        "steps": [{"binning": {
            "spacing": 20.0, "extent": [0, 20, 0, 40],
            "stack": "idw", "factor_dist": 2.0,
            "spatial_ref": "EPSG:32633"}}],
    }
    out = run_pipeline(cfg)
    cube = read_cube(out)
    assert cube.attrs["epsg"] == 32633
    assert cube.attrs["stacking_method"] == "idw"
