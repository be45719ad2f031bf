"""CLI surface tests: parser coverage, aliases, and a couple of end-to-end
subcommand runs."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.cli import build_parser, main

from test_stage1 import make_profile


ALL_COMMANDS = [
    "merge", "reproject", "delrt-correct", "delrt-pad", "static", "tide",
    "mistie", "despike", "segy2cube", "binning", "preprocess", "fft",
    "pocs", "ifft", "postprocess", "cube2segy", "version",
    "nav", "qc", "warmup", "run",
]


def test_all_subcommands_registered():
    parser = build_parser()
    sub = next(a for a in parser._actions if hasattr(a, "choices") and a.choices)
    for cmd in ALL_COMMANDS:
        assert cmd in sub.choices, cmd


def test_numbered_aliases():
    parser = build_parser()
    sub = next(a for a in parser._actions if hasattr(a, "choices") and a.choices)
    for num, cmd in [(1, "merge"), (10, "binning"), (13, "pocs"), (16, "cube2segy")]:
        assert f"{num:02d}-{cmd}" in sub.choices


def test_version(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert out.strip().count(".") == 2


def test_missing_required_args():
    with pytest.raises(SystemExit):
        main(["binning"])  # missing input/output
    with pytest.raises(SystemExit):
        main(["pocs", "in.nc"])  # missing output


def test_unknown_command():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_despike_and_binning_via_cli(tmp_path, capsys):
    survey = tmp_path / "survey"
    survey.mkdir()
    for k in range(3):
        make_profile(str(survey / f"l{k}_UTM.sgy"), ntr=20, ns=64,
                     x0=5.0 + 10.0 * k, y0=5.0, heading=(0, 1), spacing=10.0,
                     seed=k)
    assert main(["despike", str(survey), "--threshold", "6"]) == 0
    cube = str(tmp_path / "cube.nc")
    assert main(["binning", str(survey), cube,
                 "--extent", "0", "30", "0", "200", "--spacing", "10"]) == 0
    import os

    assert os.path.exists(cube)


def test_fft_pocs_ifft_via_cli(tmp_path):
    import os

    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube

    rng = np.random.default_rng(160)
    amp = rng.normal(size=(8, 8, 32)).astype(np.float32)
    c = Cube(
        coords={"iline": np.arange(1, 9), "xline": np.arange(1, 9),
                "twt": np.arange(32) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"), amp),
                   "fold": (("iline", "xline"), np.ones((8, 8), np.int32))},
    )
    p0 = str(tmp_path / "c.nc")
    write_cube(p0, c)
    p1 = str(tmp_path / "f.nc")
    assert main(["fft", p0, p1]) == 0
    p2 = str(tmp_path / "i.nc")
    assert main(["pocs", p1, p2, "--niter", "5", "--batch", "8"]) == 0
    p3 = str(tmp_path / "t.nc")
    assert main(["ifft", p2, p3]) == 0
    back = read_cube(p3)
    assert any(v not in ("fold",) for v in back.data_vars)
    assert os.path.exists(str(tmp_path / "i_parameter.yml"))
    # the reproducibility dump records EVERY solver field (a hardcoded key
    # list silently dropped later additions like use_pallas)
    import yaml as _yaml

    from pseudo_3d_interpolation_tpu.models import POCSConfig as _PC

    saved = _yaml.safe_load(open(str(tmp_path / "i_parameter.yml")))["metadata"]
    assert set(saved) == {f.name for f in _PC.__dataclass_fields__.values()}
    assert saved["niter"] == 5 and "use_pallas" in saved


def test_nav_and_checkpointed_pocs(tmp_path):
    import os

    survey = tmp_path / "s"
    survey.mkdir()
    for k in range(2):
        make_profile(str(survey / f"n{k}_UTM.sgy"), ntr=10, ns=32,
                     x0=k * 50.0, seed=k)
    gj = str(tmp_path / "nav.geojson")
    assert main(["nav", str(survey), gj]) == 0
    assert os.path.getsize(gj) > 100

    from pseudo_3d_interpolation_tpu.io.ncio import Cube, write_cube

    rng = np.random.default_rng(170)
    c = Cube(
        coords={"iline": np.arange(1, 7), "xline": np.arange(1, 7),
                "twt": np.arange(32) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"),
                           rng.normal(size=(6, 6, 32)).astype(np.float32)),
                   "fold": (("iline", "xline"), np.ones((6, 6), np.int32))},
    )
    p0 = str(tmp_path / "c.nc"); write_cube(p0, c)
    p1 = str(tmp_path / "f.nc"); assert main(["fft", p0, p1]) == 0
    ck = str(tmp_path / "ck")
    p2 = str(tmp_path / "i.nc")
    assert main(["pocs", p1, p2, "--niter", "4", "--batch", "8",
                 "--checkpoint-dir", ck]) == 0
    assert len(os.listdir(ck)) >= 1


def test_qc_subcommand(tmp_path):
    import os

    p = str(tmp_path / "prof_UTM.sgy")
    make_profile(p, ntr=20, ns=64)
    qcdir = str(tmp_path / "qc")
    assert main(["qc", p, "--output-dir", qcdir]) == 0
    files = os.listdir(qcdir)
    assert any("image" in f for f in files) and any("spectrum" in f for f in files)

    from pseudo_3d_interpolation_tpu.io.ncio import Cube, write_cube

    c = Cube(
        coords={"iline": np.arange(1, 5), "xline": np.arange(1, 5),
                "twt": np.arange(16) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"),
                           np.random.default_rng(0).normal(size=(4, 4, 16)).astype(np.float32)),
                   "fold": (("iline", "xline"), np.ones((4, 4), np.int32))},
    )
    cp = str(tmp_path / "cube.nc"); write_cube(cp, c)
    assert main(["qc", cp, "--output-dir", qcdir]) == 0
    assert any("fold" in f for f in os.listdir(qcdir))


def test_preprocess_gain_kv_parsing(tmp_path):
    """--gain key=value pairs incl. a PGC dict parse through YAML."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, write_cube, read_cube

    rng = np.random.default_rng(180)
    c = Cube(
        coords={"iline": np.arange(1, 5), "xline": np.arange(1, 5),
                "twt": np.arange(64) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"),
                           rng.normal(size=(4, 4, 64)).astype(np.float32)),
                   "fold": (("iline", "xline"), np.ones((4, 4), np.int32))},
    )
    p0 = str(tmp_path / "c.nc"); write_cube(p0, c)
    p1 = str(tmp_path / "g.nc")
    assert main(["preprocess", p0, p1, "--gain", "tpow=1.5",
                 "pgc={0.0: 1.0, 0.01: 3.0}"]) == 0
    out = read_cube(p1)
    assert "GAIN" in str(out.attrs["history"])
    assert "tpow=1.5" in str(out.attrs["history"])


def test_warmup_seeds_cache(tmp_path, monkeypatch):
    """p3d warmup compiles the configured solve into the persistent cache
    (VERDICT r2 #7): the cache dir gains entries and a second run is a
    cache hit (much faster compile path, same program)."""
    import os

    from pseudo_3d_interpolation_tpu.cli import main as cli_main
    from pseudo_3d_interpolation_tpu.utils import compcache

    cache = tmp_path / "cache"
    monkeypatch.setenv("P3D_COMPILATION_CACHE", str(cache))
    monkeypatch.setenv("P3D_CACHE_MIN_COMPILE_SECS", "0")
    # the module's idempotency latch is per-dir: a different env dir takes
    # effect without a reset (third review batch); leave any prior state
    assert hasattr(compcache, "_active_dir")
    # drop in-memory executables so the compile (and hence the disk write)
    # actually happens even when earlier tests compiled the same program
    import jax

    jax.clear_caches()
    # the conftest mesh has 8 virtual devices; the resident-driver warmup
    # path under test is the single-chip branch
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    rc = cli_main(["warmup", "--transform", "FFT", "--niter", "3",
                   "--shape", "40", "48", "--batch", "4", "--slices", "10"])
    assert rc == 0
    entries = set(os.listdir(cache)) if cache.exists() else set()
    assert entries, "warmup wrote no cache entries"

    # the production run must be a cache HIT: --slices keyed the resident
    # driver's step() on the full padded cube shape (review round-3 #2), so
    # an identical-config 10-slice production solve adds NO solver entry
    from pseudo_3d_interpolation_tpu.cli import _pocs_config_from_args
    from pseudo_3d_interpolation_tpu.parallel.solver import (
        interpolate_cube_resident,
    )

    jax.clear_caches()
    cfg = _pocs_config_from_args(
        type("A", (), {"params": None, "niter": 3, "transform": "FFT",
                       "no_pallas": False})(), "fast")
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(40, 48)) < 0.5).astype(np.float32)
    data = (rng.normal(size=(10, 40, 48)) * mask).astype(np.complex64)
    interpolate_cube_resident(data, mask, cfg, batch=4)
    after = set(os.listdir(cache))
    new = {f for f in after - entries if "jit_step" in f}
    assert not new, f"production resident step missed the warmed cache: {new}"


def test_postprocess_option_depth_via_cli(tmp_path):
    """Round-3 flag parity: footprint direction/buffers, median smoothing
    with percentile rescale, squared median AGC, cubic upsampling
    (reference cube_postprocessing_3D.py option set)."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube

    rng = np.random.default_rng(161)
    amp = rng.normal(size=(16, 16, 32)).astype(np.float32)
    c = Cube(
        coords={"iline": np.arange(1, 17), "xline": np.arange(1, 17),
                "twt": np.arange(32) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"), amp)},
    )
    p0 = str(tmp_path / "c.nc")
    write_cube(p0, c)
    p1 = str(tmp_path / "post.nc")
    assert main(["postprocess", p0, p1,
                 "--remove-footprint", "--footprint-direction", "iline",
                 "--buffer-center", "0.3", "--buffer-filter", "2",
                 "--smooth", "median", "--smooth-size", "3", "--rescale",
                 "--agc-win", "0.002", "--agc-kind", "median",
                 "--agc-sqrt"]) == 0
    out = read_cube(p1)
    hist = out.attrs.get("history", "")
    assert "FOOTPRINT_REMOVAL" in hist and "SMOOTH(median)" in hist
    assert "AGC(0.002s,median,sqrt)" in hist
    # cubic upsampling doubles both lateral axes
    p2 = str(tmp_path / "up.nc")
    assert main(["postprocess", p0, p2, "--upsample-iline", "2",
                 "--upsample-xline", "2", "--upsample-method", "cubic"]) == 0
    up = read_cube(p2)
    # (n-1)*f + 1 endpoint-preserving refinement (reference line-index law)
    assert up["amp"].shape[:2] == (31, 31)


def test_postprocess_upsample_method_not_discarded(tmp_path):
    """Bare --upsample must not overwrite an explicit --upsample-method
    with its 'linear' const; contradictory values are a usage error
    (round-3 review)."""
    from pseudo_3d_interpolation_tpu.cli import build_parser

    parser = build_parser()
    args = parser.parse_args(["postprocess", "in.nc", "out.nc",
                              "--upsample", "--upsample-method", "cubic"])
    assert args.upsample == "linear" and args.upsample_method == "cubic"
    # the handler resolution itself is exercised via main() on a real cube
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube

    rng = np.random.default_rng(3)
    c = Cube(
        coords={"iline": np.arange(1, 9), "xline": np.arange(1, 5),
                "twt": np.arange(16) * 1e-3},
        data_vars={"amp": (("iline", "xline", "twt"),
                           rng.normal(size=(8, 4, 16)).astype(np.float32))},
        attrs={"bin_size_iline": 10.0, "bin_size_xline": 5.0},
    )
    p0 = str(tmp_path / "c.nc")
    write_cube(p0, c)
    p1 = str(tmp_path / "up.nc")
    assert main(["postprocess", p0, p1, "--upsample",
                 "--upsample-method", "cubic"]) == 0
    assert read_cube(p1)["amp"].shape[:2] == (15, 4)  # cubic auto x2 ilines
    with pytest.raises(SystemExit):
        main(["postprocess", p0, p1, "--upsample", "cubic",
              "--upsample-method", "nearest"])


def test_scalar_coords_usage_error():
    """Non-numeric --scalar-coords/--scalar values exit with an argparse
    usage error instead of a mid-run int() traceback (round-3 review)."""
    from pseudo_3d_interpolation_tpu.cli import build_parser

    parser = build_parser()
    for argv in (["cube2segy", "a.nc", "b.sgy", "--scalar-coords", "ten"],
                 ["cube2segy", "a.nc", "b.sgy", "--scalar-coords", "7"],
                 ["reproject", "a.sgy", "--src-epsg", "4326",
                  "--dst-epsg", "32633", "--scalar", "ten"]):
        with pytest.raises(SystemExit):
            parser.parse_args(argv)
    ok = parser.parse_args(["cube2segy", "a.nc", "b.sgy",
                            "--scalar-coords", "auto"])
    assert ok.scalar_coords == "auto"
    ok = parser.parse_args(["cube2segy", "a.nc", "b.sgy",
                            "--scalar-coords", "-1000"])
    assert ok.scalar_coords == -1000


def test_preprocess_resample_variants_via_cli(tmp_path):
    """--resample-interval/-frequency/-factor compute the output sample
    count like the reference's resampling flag family."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube, write_cube

    rng = np.random.default_rng(162)
    amp = rng.normal(size=(4, 4, 64)).astype(np.float32)
    c = Cube(
        coords={"iline": np.arange(1, 5), "xline": np.arange(1, 5),
                "twt": np.arange(64) * 0.25e-3},  # dt 0.25 ms -> 4 kHz
        data_vars={"amp": (("iline", "xline", "twt"), amp)},
    )
    p0 = str(tmp_path / "c.nc")
    write_cube(p0, c)
    # halve the rate three equivalent ways
    for i, flags in enumerate((["--resample-interval", "0.5"],
                               ["--resample-frequency", "2000"],
                               ["--resample-factor", "2"])):
        out = str(tmp_path / f"r{i}.nc")
        assert main(["preprocess", p0, out] + flags) == 0
        assert read_cube(out)["amp"].shape[-1] == 32
    # polyphase path + no-store-ref-amp
    out = str(tmp_path / "poly.nc")
    assert main(["preprocess", p0, out, "--balance", "rms",
                 "--no-store-ref-amp", "--resample-factor", "2",
                 "--resample-function", "poly"]) == 0
    cube = read_cube(out)
    assert cube["amp"].shape[-1] == 32
    assert "amp_ref" not in cube.data_vars


def test_stage1_batch_selection_flags(tmp_path):
    """--suffix/--filename-suffix/--txt-suffix/--output-dir on stage-1
    steps (the reference's shared batch conventions)."""
    import os

    survey = tmp_path / "survey"
    survey.mkdir()
    make_profile(str(survey / "l0_UTM.sgy"), ntr=20, ns=64, seed=1)
    make_profile(str(survey / "l1_UTM_env.sgy"), ntr=20, ns=64, seed=2)
    outdir = str(tmp_path / "out")
    # only the _env-suffixed file is selected; output suffix overridden
    assert main(["despike", str(survey), "--filename-suffix", "env",
                 "--txt-suffix", "clean", "--output-dir", outdir,
                 "--threshold", "6"]) == 0
    outs = [f for f in os.listdir(outdir) if f.endswith(".sgy")]
    assert outs == ["l1_UTM_env_clean.sgy"]
    # the resolved-args sidecar lands next to the outputs too
    assert any(f.endswith("_p3d_despike_argparse_parameter.yml")
               for f in os.listdir(outdir))


def test_mistie_aux_coords(tmp_path):
    """--coords-origin aux: navigation from .nav sidecars instead of
    headers (reference --coords_origin/--coords_path)."""
    import os

    import pandas as pd

    survey = tmp_path / "survey"
    survey.mkdir()
    pa = str(survey / "A_UTM.sgy")
    pb = str(survey / "B_UTM.sgy")
    # profiles WITHOUT usable header coordinates (all zero -> identical)
    make_profile(pa, ntr=60, seafloor_ms=np.full(60, 42.0), seed=41,
                 x0=0, y0=0, heading=(0, 0), spacing=0)
    make_profile(pb, ntr=60, seafloor_ms=np.full(60, 44.0), seed=42,
                 x0=0, y0=0, heading=(0, 0), spacing=0,
                 times_start="2023-05-01T12:00:00")
    # crossing nav comes from sidecars
    nav = tmp_path / "nav"
    nav.mkdir()
    pd.DataFrame({"tracl": np.arange(1, 61),
                  "x": np.linspace(0, 295, 60), "y": np.full(60, 100.0)}
                 ).to_csv(nav / "A_UTM.nav", index=False)
    pd.DataFrame({"tracl": np.arange(1, 61),
                  "x": np.full(60, 150.0), "y": np.linspace(0, 295, 60)}
                 ).to_csv(nav / "B_UTM.nav", index=False)
    from pseudo_3d_interpolation_tpu.pipeline import stage1

    outs = stage1.mistie_correct(str(survey), min_correlation=0.3,
                                 coords_origin="aux", coords_path=str(nav))
    assert len(outs) == 2
    mst = pd.read_csv(os.path.join(str(survey), "misties.csv"))
    assert len(mst) >= 1  # intersection found via aux nav only


# ------------------- regression tests: CLI review fixes ----------------------
def test_geometry_yaml_cli_flag_overrides(tmp_path):
    """Explicit geometry flags override --geometry-yaml (they used to be
    silently discarded)."""
    import yaml

    from pseudo_3d_interpolation_tpu.cli import _geometry_from_args

    y = tmp_path / "geom.yml"
    y.write_text(yaml.safe_dump({
        "spacing": 10.0, "extent": [0, 100, 0, 100], "stack": "average"}))
    parser = build_parser()
    args = parser.parse_args(["binning", "in", "out.nc",
                              "--geometry-yaml", str(y), "--stack", "median",
                              "--spacing", "5"])
    g = _geometry_from_args(args)
    assert g.stacking_method == "median" and g.spacing == 5.0
    assert g.extent == (0.0, 100.0, 0.0, 100.0)  # YAML keys survive
    # without overrides, YAML wins
    args = parser.parse_args(["binning", "in", "out.nc",
                              "--geometry-yaml", str(y)])
    g = _geometry_from_args(args)
    assert g.stacking_method == "average" and g.spacing == 10.0


def test_pocs_params_cli_flag_overrides(tmp_path):
    """Explicit flags override --params (CLI-overrides-YAML, the repo-wide
    precedence): --no-pallas used to be silently ignored — the documented
    warmup-cache-drift failure mode."""
    import yaml

    from pseudo_3d_interpolation_tpu.cli import _pocs_config_from_args
    from pseudo_3d_interpolation_tpu.pipeline.pocs import config_from_yaml

    y = tmp_path / "pocs.yml"
    y.write_text(yaml.safe_dump({"metadata": {
        "transform_kind": "SHEARLET", "version": "fast", "niter": 50,
        "use_pallas": True, "n_scales": 3}}))
    parser = build_parser()
    args = parser.parse_args(["pocs", "in.nc", "out.nc",
                              "--params", str(y), "--no-pallas",
                              "--niter", "10"])
    cfg, extra = config_from_yaml(_pocs_config_from_args(args, args.version))
    assert cfg.use_pallas is False and cfg.niter == 10
    assert cfg.transform_kind == "SHEARLET" and cfg.version == "fast"
    assert extra.get("n_scales") == 3  # transform kwargs survive the merge
    # without overrides the YAML is authoritative
    args = parser.parse_args(["pocs", "in.nc", "out.nc", "--params", str(y)])
    cfg, _ = config_from_yaml(_pocs_config_from_args(args, args.version))
    assert cfg.use_pallas is True and cfg.niter == 50


def test_qc_all_nan_section_renders(tmp_path):
    """All-NaN sections render with the 1.0 fallback scale instead of
    dividing everything to NaN (NaN is truthy, so `nanmax(...) or 1.0`
    kept NaN)."""
    import warnings

    from pseudo_3d_interpolation_tpu import qc as qclib

    nan_sec = np.full((64, 16), np.nan, np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        fig = qclib.plot_seismic_wiggle(nan_sec, dt=1e-3,
                                        path=str(tmp_path / "w.png"))
    assert (tmp_path / "w.png").exists()


def test_checkpointed_pocs_runtime_csv(tmp_path):
    """--runtime-csv works with --checkpoint-dir (it was silently
    dropped)."""
    import pandas as pd

    from pseudo_3d_interpolation_tpu.io.ncio import Cube
    from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
    from pseudo_3d_interpolation_tpu.pipeline.pocs import (
        interpolate_checkpointed)

    rng = np.random.default_rng(0)
    amp = rng.normal(size=(8, 8, 12)).astype(np.complex64)
    fold = (rng.uniform(size=(8, 8)) > 0.4).astype(np.int32)
    cube = Cube(coords={"iline": np.arange(8), "xline": np.arange(8),
                        "freq_twt": np.arange(12) * 1.0},
                data_vars={"freq_amp": (("iline", "xline", "freq_twt"), amp),
                           "fold": (("iline", "xline"), fold)})
    csv = str(tmp_path / "rt.csv")
    interpolate_checkpointed(cube, POCSConfig(niter=3, p_min=1e-3),
                             str(tmp_path / "ck"), batch=4, runtime_csv=csv)
    rt = pd.read_csv(csv)
    assert {"niterations", "cost"} <= set(rt.columns) and len(rt) == 12


def test_binning_factor_dist_flag(tmp_path):
    """--factor-dist reaches BinningGeometry.idw_power (reference
    --factor_dist), on both the flat and the --geometry-yaml path."""
    import yaml

    from pseudo_3d_interpolation_tpu.cli import _geometry_from_args, build_parser

    ap = build_parser()
    args = ap.parse_args(["binning", "in", "out.nc", "--extent",
                          "0", "0", "100", "100", "--stack", "idw",
                          "--factor-dist", "2.5"])
    assert _geometry_from_args(args).idw_power == 2.5
    y = tmp_path / "g.yml"
    y.write_text(yaml.safe_dump({"extent": [0, 0, 50, 50],
                                 "factor_dist": 3.0, "stack": "idw"}))
    args = ap.parse_args(["binning", "in", "out.nc",
                          "--geometry-yaml", str(y)])
    geom = _geometry_from_args(args)
    assert geom.idw_power == 3.0 and geom.stacking_method == "idw"
    # explicit flag overrides the YAML spelling
    args = ap.parse_args(["binning", "in", "out.nc", "--geometry-yaml",
                          str(y), "--factor-dist", "1.5"])
    assert _geometry_from_args(args).idw_power == 1.5


def test_segy2cube_suffix_filters(tmp_path):
    """segy2cube --suffix/--filename-suffix select directory inputs
    (reference cnv_segy2netcdf.py:22-25)."""
    import numpy as np

    from pseudo_3d_interpolation_tpu.cli import main
    from pseudo_3d_interpolation_tpu.io.segy import write_segy

    d = tmp_path / "in"
    d.mkdir()
    for name in ("l1_despk.segy", "l2_despk.segy", "l3_raw.segy"):
        write_segy(str(d / name), np.zeros((4, 16), np.float32), dt_us=250)
    out = tmp_path / "out"
    rc = main(["segy2cube", str(d), "--output-dir", str(out),
               "--suffix", "segy", "--filename-suffix", "despk"])
    assert rc in (0, None)
    got = sorted(p.name for p in out.glob("*.nc"))
    assert got == ["l1_despk.nc", "l2_despk.nc"]


def test_mistie_coords_text_suffix_filters_sidecars(tmp_path):
    """--coords-text-suffix selects among navigation sidecars by basename
    suffix (reference --coords_text_suffix, mistie_correction_segy.py:67-69):
    decoy .nav files without the suffix must not be read at all."""
    import pandas as pd

    survey = tmp_path / "survey"
    survey.mkdir()
    pa = str(survey / "A_UTM.sgy")
    pb = str(survey / "B_UTM.sgy")
    make_profile(pa, ntr=60, seafloor_ms=np.full(60, 42.0), seed=41,
                 x0=0, y0=0, heading=(0, 0), spacing=0)
    make_profile(pb, ntr=60, seafloor_ms=np.full(60, 44.0), seed=42,
                 x0=0, y0=0, heading=(0, 0), spacing=0,
                 times_start="2023-05-01T12:00:00")
    nav = tmp_path / "nav"
    nav.mkdir()
    pd.DataFrame({"tracl": np.arange(1, 61),
                  "x": np.linspace(0, 295, 60), "y": np.full(60, 100.0)}
                 ).to_csv(nav / "A_UTM_good.nav", index=False)
    pd.DataFrame({"tracl": np.arange(1, 61),
                  "x": np.full(60, 150.0), "y": np.linspace(0, 295, 60)}
                 ).to_csv(nav / "B_UTM_good.nav", index=False)
    # decoys with the wrong schema: reading them would crash the nav join
    (nav / "A_UTM.nav").write_text("garbage,columns\n1,2\n")
    (nav / "B_UTM.nav").write_text("garbage,columns\n1,2\n")
    from pseudo_3d_interpolation_tpu.pipeline import stage1

    outs = stage1.mistie_correct(str(survey), min_correlation=0.3,
                                 coords_origin="aux", coords_path=str(nav),
                                 coords_fnsuffix="good")
    assert len(outs) == 2


def test_cli_reference_doc_in_sync():
    """docs/cli.md is generated from the argparse definitions
    (tools/gen_cli_docs.py); re-rendering through the generator's own
    render() (which pins the terminal width) must reproduce it
    byte-for-byte so the option reference can never drift from the code."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_cli_docs", os.path.join(root, "tools", "gen_cli_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "docs", "cli.md")) as f:
        assert f.read() == mod.render(), (
            "docs/cli.md is stale - re-run: JAX_PLATFORMS=cpu "
            "python tools/gen_cli_docs.py")


def test_args_dump_sidecar_roundtrip(tmp_path):
    """Every subcommand writes its resolved arguments as a YAML sidecar
    next to its outputs (reference despiking_2D_segy.py:528-533); the dump
    round-trips through yaml.safe_load with the resolved values."""
    import glob

    import yaml

    from pseudo_3d_interpolation_tpu.io.ncio import Cube, write_cube

    rng = np.random.default_rng(0)
    il, xl, nt = 6, 5, 32
    amp = rng.normal(size=(il, xl, nt)).astype(np.float32)
    fold = np.ones((il, xl), np.int32)
    src = str(tmp_path / "cube.nc")
    write_cube(src, Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "twt": np.arange(nt) * 0.25e-3},
        data_vars={"amp": (("iline", "xline", "twt"), amp),
                   "fold": (("iline", "xline"), fold)}))
    out = str(tmp_path / "freq.nc")
    rc = main(["fft", src, out, "-V", "1"])
    assert rc == 0
    dumps = glob.glob(str(tmp_path / "*_p3d_fft_argparse_parameter.yml"))
    assert len(dumps) == 1, dumps
    with open(dumps[0]) as f:
        doc = yaml.safe_load(f)
    assert doc["command"] == "fft"
    assert doc["args"]["input"] == src
    assert doc["args"]["output"] == out
    assert doc["args"]["upsampling_factor"] == 1  # resolved default

    # stage-1 commands dump too (via their separate dispatch return path)
    from test_stage1 import make_profile

    prof_dir = tmp_path / "profs"
    prof_dir.mkdir()
    make_profile(str(prof_dir / "a.sgy"), ntr=8, ns=64, delrt_ms=20,
                 seafloor_ms=np.full(8, 10.0), seed=3)
    rc = main(["delrt-pad", str(prof_dir), "-V", "1"])
    assert rc == 0
    dumps = glob.glob(str(prof_dir / "*_p3d_delrt-pad_argparse_parameter.yml"))
    assert len(dumps) == 1

    # failures do NOT leave a sidecar (dump happens after success)
    import pytest as _pytest

    with _pytest.raises(BaseException):
        main(["fft", str(tmp_path / "missing.nc"),
              str(tmp_path / "x.nc"), "-V", "1"])
    assert not glob.glob(str(tmp_path / "*missing*parameter.yml"))
    assert len(glob.glob(str(tmp_path / "*_p3d_fft_argparse_parameter.yml"))) == 1


def test_cli_default_pocs_config_is_fused_kernel_eligible():
    """Regression guard (round-4 review): the CLI's default POCS config
    must satisfy the folded-kernel eligibility gate (models/pocs.py) —
    eps was 1e-16 for three rounds, which silently routed every default
    CLI run onto the XLA path."""
    import argparse

    from pseudo_3d_interpolation_tpu.cli import _pocs_config_from_args

    ns = argparse.Namespace(params=None, niter=None, transform=None,
                            no_pallas=False, pad_to_tile=None, eps=None)
    cfg = _pocs_config_from_args(ns, "fast")
    assert cfg.use_pallas
    assert cfg.eps == 0.0
    assert not cfg.keep_cost_history and not cfg.global_early_stop
    assert cfg.version in ("regular", "fast")
    # same check for the pipeline driver's default config
    import inspect

    from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate

    default_cfg = inspect.signature(interpolate).parameters["config"].default
    assert default_cfg.eps == 0.0 and default_cfg.version in ("regular", "fast")
    assert default_cfg.use_pallas  # without it the eligibility gate is moot
