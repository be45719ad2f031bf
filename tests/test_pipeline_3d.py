"""End-to-end 3D-stage chain test: profiles -> binning -> FFT -> POCS ->
IFFT, quality-checked against dense synthetic truth (BASELINE config 2 at
test scale)."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.io.ncio import Cube, read_cube
from pseudo_3d_interpolation_tpu.io.segy import write_segy
from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
from pseudo_3d_interpolation_tpu.ops import metrics
from pseudo_3d_interpolation_tpu.pipeline import binning as pbin
from pseudo_3d_interpolation_tpu.pipeline.fft import apply_fft
from pseudo_3d_interpolation_tpu.pipeline.ifft import apply_ifft
from pseudo_3d_interpolation_tpu.pipeline.pocs import config_from_yaml, interpolate


def dense_truth(n_il=24, n_xl=20, ns=64, dt=0.25e-3):
    """Smooth dipping-reflector cube: band-limited wavelets at dipping TWTs."""
    il = np.arange(n_il)[:, None]
    xl = np.arange(n_xl)[None, :]
    t = np.arange(ns) * dt
    cube = np.zeros((n_il, n_xl, ns), np.float32)
    for t0, amp, f0 in [(8e-3, 1.0, 300.0), (1.9e-2, -0.7, 250.0), (4.2e-2, 0.5, 200.0)]:
        tt = t0 + 2e-4 * (il / n_il) + 1.5e-4 * (xl / n_xl)  # dipping plane
        arg = (t[None, None, :] - tt[..., None]) * f0
        cube += amp * np.exp(-(arg**2) * 8).astype(np.float32) * np.cos(
            2 * np.pi * arg
        ).astype(np.float32)
    return cube, t


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    """Write an irregular ~60% subset of ilines as 2D SEG-Y profiles.

    Irregular decimation is the POCS use case — regular decimation creates
    coherent aliases that sparsity thresholding cannot separate."""
    d = tmp_path_factory.mktemp("survey")
    truth, twt = dense_truth()
    n_il, n_xl, ns = truth.shape
    dt_us = 250
    spacing = 10.0
    rng = np.random.default_rng(123)
    acquired = sorted(set([0, n_il - 1]) | set(
        int(i) for i in rng.choice(n_il, size=int(n_il * 0.6), replace=False)
    ))
    for i in acquired:
        x = np.full(n_xl, 5.0 + i * spacing)
        y = 5.0 + np.arange(n_xl) * spacing
        write_segy(
            str(d / f"profile_{i:02d}_UTM.sgy"),
            truth[i],
            headers={
                "SourceX": np.rint(x * 100).astype(np.int64),
                "SourceY": np.rint(y * 100).astype(np.int64),
                "SourceGroupScalar": -100,
                "CoordinateUnits": 1,
                "DelayRecordingTime": 0,
            },
            fmt=5,
            dt_us=dt_us,
        )
    return str(d), truth, twt, np.asarray(acquired)


def test_full_chain(survey, tmp_path):
    d, truth, twt, acquired = survey
    n_il, n_xl, ns = truth.shape
    missing = np.setdiff1d(np.arange(n_il), acquired)

    geom = pbin.BinningGeometry(
        spacing=10.0, extent=(0.0, n_il * 10.0, 0.0, n_xl * 10.0),
        stacking_method="average",
    )
    cube = pbin.bin_cube(d, geom, out_path=str(tmp_path / "cube.nc"))
    assert cube["amp"].shape == (n_il, n_xl, ns)
    fold = cube["fold"]
    assert fold[acquired].min() >= 1 and fold[missing].max() == 0
    # binned values match the truth on acquired lines
    np.testing.assert_allclose(cube["amp"][acquired], truth[acquired], atol=1e-5)

    freq = apply_fft(cube, out_path=str(tmp_path / "freq.nc"))
    assert freq["freq_amp"].dtype == np.complex64
    assert freq["freq_amp"].shape == (n_il, n_xl, ns // 2 + 1)

    cfg = POCSConfig(niter=40, thresh_op="hard", thresh_model="exponential",
                     p_min="adaptive", version="fast", alpha=0.75, eps=1e-16)
    interp = interpolate(freq, cfg, batch=8, out_path=str(tmp_path / "interp.nc"),
                         runtime_csv=str(tmp_path / "runtimes.csv"))
    assert "freq_amp_interp" in interp.data_vars

    back = apply_ifft(interp, var="freq_amp_interp", out_path=str(tmp_path / "out.nc"))
    rec = back["freq_amp_interp"] if "freq_amp_interp" in back.data_vars else back["amp"]

    snr_sparse = float(metrics.snr(truth, np.asarray(cube["amp"])))
    snr_rec = float(metrics.snr(truth, np.asarray(rec)))
    assert snr_rec > snr_sparse + 8, (snr_sparse, snr_rec)
    assert snr_rec > 10, snr_rec

    # artifacts on disk
    out = read_cube(str(tmp_path / "out.nc"))
    assert "POCS" in str(out.attrs.get("history", ""))
    import pandas as pd

    rt = pd.read_csv(str(tmp_path / "runtimes.csv"))
    assert {"niterations", "cost"} <= set(rt.columns)
    assert len(rt) == ns // 2 + 1


def test_yaml_config_compat(tmp_path):
    """Reference-style POCS YAML (incl. dask keys) loads into POCSConfig."""
    import yaml

    p = str(tmp_path / "pocs.yml")
    with open(p, "w") as f:
        yaml.safe_dump({
            "dim": "freq_twt",
            "batch_chunk": 50,
            "n_workers": 12,
            "processes": True,
            "threads_per_worker": 1,
            "memory_limit": "2.5GB",
            "output_runtime_results": True,
            "metadata": {
                "transform_kind": "FFT", "version": "fast", "niter": 50,
                "eps": 1.0e-16, "thresh_op": "hard",
                "thresh_model": "exponential", "alpha": 0.75,
                "p_max": 0.99, "p_min": "adaptive",
                "sqrt_decay": False, "decay_kind": "values",
            },
        }, f)
    cfg, extra = config_from_yaml(p)
    assert cfg.niter == 50 and cfg.version == "fast" and cfg.p_min == "adaptive"
    assert cfg.transform_kind == "FFT" and cfg.alpha == 0.75


def test_checkpointed_interpolation_resumes(survey, tmp_path):
    """Checkpointed POCS writes batch files; a second run resumes from them
    and produces identical output."""
    from pseudo_3d_interpolation_tpu.pipeline import binning as pbin2
    from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate_checkpointed
    import os

    d, truth, twt, acquired = survey
    n_il, n_xl, ns = truth.shape
    geom = pbin2.BinningGeometry(spacing=10.0,
                                 extent=(0.0, n_il * 10.0, 0.0, n_xl * 10.0))
    cube = pbin2.bin_cube(d, geom)
    freq = apply_fft(cube)
    cfg = POCSConfig(niter=10, p_min=1e-3, version="fast")
    ckdir = str(tmp_path / "ck")
    out1 = interpolate_checkpointed(freq, cfg, ckdir, batch=16)
    files = sorted(f for f in os.listdir(ckdir) if f.startswith("slices_"))
    assert len(files) >= 2
    assert os.path.exists(os.path.join(ckdir, "checkpoint_meta.json"))
    # delete nothing; rerun resumes fully from checkpoints (no recompute) —
    # PROVE it by making the solver explode: a rerun that silently
    # recomputed any batch would call it
    from pseudo_3d_interpolation_tpu.parallel import solver as psolver

    def _boom(*a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("resume recomputed a batch despite checkpoints")

    import unittest.mock as mock

    with mock.patch.object(psolver, "interpolate_cube", _boom):
        # negative control: with a checkpoint missing the spy MUST fire
        victim = os.path.join(ckdir, files[0])
        os.rename(victim, victim + ".bak")
        with pytest.raises(AssertionError, match="recomputed"):
            interpolate_checkpointed(freq, cfg, ckdir, batch=16)
        os.rename(victim + ".bak", victim)
        out2 = interpolate_checkpointed(freq, cfg, ckdir, batch=16)
    np.testing.assert_allclose(
        np.asarray(out1["freq_amp_interp"]), np.asarray(out2["freq_amp_interp"]),
        rtol=1e-6,
    )


def test_checkpoint_dir_refuses_config_drift(survey, tmp_path):
    """Resuming into a checkpoint_dir written under a DIFFERENT config must
    refuse loudly — filename-only reuse would silently merge results from
    two configs into one output cube."""
    from pseudo_3d_interpolation_tpu.pipeline import binning as pbin2
    from pseudo_3d_interpolation_tpu.pipeline.pocs import (
        interpolate_checkpointed)

    d, truth, twt, acquired = survey
    n_il, n_xl, ns = truth.shape
    geom = pbin2.BinningGeometry(spacing=10.0,
                                 extent=(0.0, n_il * 10.0, 0.0, n_xl * 10.0))
    cube = pbin2.bin_cube(d, geom)
    freq = apply_fft(cube)
    ckdir = str(tmp_path / "ck")
    interpolate_checkpointed(freq, POCSConfig(niter=4, p_min=1e-3), ckdir,
                             batch=16)
    with pytest.raises(ValueError, match="different run"):
        interpolate_checkpointed(freq, POCSConfig(niter=6, p_min=1e-3),
                                 ckdir, batch=16)
    # unchanged config still resumes
    interpolate_checkpointed(freq, POCSConfig(niter=4, p_min=1e-3), ckdir,
                             batch=16)


def test_checkpointed_tail_slab_keeps_program_shape(survey, tmp_path):
    """The tail slab is padded to the full batch before the inner driver:
    a short tail would compile a SECOND full XLA program (minutes for
    directional bases)."""
    from pseudo_3d_interpolation_tpu.parallel import solver as psolver
    from pseudo_3d_interpolation_tpu.pipeline import binning as pbin2
    from pseudo_3d_interpolation_tpu.pipeline.pocs import (
        interpolate_checkpointed)

    d, truth, twt, acquired = survey
    n_il, n_xl, ns = truth.shape
    geom = pbin2.BinningGeometry(spacing=10.0,
                                 extent=(0.0, n_il * 10.0, 0.0, n_xl * 10.0))
    cube = pbin2.bin_cube(d, geom)
    freq = apply_fft(cube)
    f_total = freq.data_vars["freq_amp"][1].shape[-1]
    batch = 16
    assert f_total % batch != 0, "fixture must exercise a short tail"
    shapes = []
    real_ic = psolver.interpolate_cube

    def spy(moved, *a, **k):
        shapes.append(moved.shape[0])
        return real_ic(moved, *a, **k)

    import unittest.mock as mock

    with mock.patch.object(psolver, "interpolate_cube", spy):
        out = interpolate_checkpointed(freq, POCSConfig(niter=4, p_min=1e-3),
                                       str(tmp_path / "ck"), batch=batch)
    assert shapes and set(shapes) == {batch}
    # trimmed result matches the cube length, not the padded batch grid
    assert np.asarray(out["freq_amp_interp"]).shape[-1] == f_total


def test_yaml_config_rejects_unknown_metadata_keys(tmp_path):
    """A typo like 'nscales' (for n_scales) must fail loudly instead of
    silently running the solver with default quality levers — every entry
    point filters extras through the transform-kwargs whitelist."""
    import pytest
    import yaml

    p = str(tmp_path / "pocs.yml")
    with open(p, "w") as f:
        yaml.safe_dump({"metadata": {
            "transform_kind": "SHEARLET", "niter": 5, "nscales": 4}}, f)
    with pytest.raises(ValueError, match="nscales"):
        config_from_yaml(p)
    # the correctly spelled option and reference-schema keys still load
    with open(p, "w") as f:
        yaml.safe_dump({"dim": "freq_twt", "var": "freq_env",
                        "apply_filter": "gauss", "batch_chunk": 20,
                        "metadata": {"transform_kind": "SHEARLET",
                                     "niter": 5, "n_scales": 4,
                                     "verbose": False}}, f)
    cfg, extra = config_from_yaml(p)
    assert cfg.transform_kind == "SHEARLET" and extra["n_scales"] == 4


def test_production_precision_defaults():
    """Driver-level precision defaults are the measured production mix
    (docs/perf.md round 4b + addendum); explicit options override per key."""
    from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
    from pseudo_3d_interpolation_tpu.pipeline.pocs import _production_transform

    t, _ = _production_transform(POCSConfig(transform_kind="SHEARLET"), {})
    assert t.precision == "high" and t.box_precision is None
    t, _ = _production_transform(POCSConfig(transform_kind="CURVELET"), {})
    assert t.precision == "high" and t.box_precision == "highest"
    t, _ = _production_transform(POCSConfig(transform_kind="FFT"), {})
    assert t.precision == "high"
    # explicit YAML options win per key
    t, _ = _production_transform(
        POCSConfig(transform_kind="CURVELET"),
        {"precision": "highest", "box_precision": "high"})
    assert t.precision == "highest" and t.box_precision == "high"
    # an explicit UNIFORM precision request suppresses the driver mix —
    # box_precision must not be silently injected on top
    t, _ = _production_transform(
        POCSConfig(transform_kind="CURVELET"), {"precision": "high"})
    assert t.precision == "high" and t.box_precision is None
