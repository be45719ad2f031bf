"""Solver-path routing: one decision function, logged by the drivers.

``models.pocs.solver_route`` IS the dispatch decision of
``pocs_interpolate`` (not a parallel re-implementation), so these tests pin
(a) the documented config -> path routing table (docs/workflow.md,
"Solver path routing"), (b) the
first-failure reasons, (c) dispatch consistency via kernel spies, and
(d) the driver log line — the round-4 eps incident (default CLI runs
silently ineligible for the fused kernel, ~30% lost) is the regression
class this guards against.
"""

import dataclasses

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.models.pocs import (POCSConfig,
                                                     describe_route,
                                                     pocs_interpolate,
                                                     solver_route)
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex

# the production default the CLI resolves when no YAML is given
# (cli.py::_pocs_config) — pallas_interpret added so the CPU test suite
# passes the backend gate the way a real TPU run would
CLI_DEFAULT = POCSConfig(
    niter=8, thresh_op="hard", thresh_model="exponential",
    p_min=1e-3, version="fast", alpha=0.75, eps=0.0,
    transform_kind="FFT", use_pallas=True, pallas_interpret=True,
)

S = (4, 128, 128)  # eligible batch shape
M = (128, 128)


# The documented routing table (docs/workflow.md "Solver path routing")
# — each
# row here must match the docs and the dispatch. Format:
# (config override dict, shape, expected route, expected basis,
#  substring expected in the reason)
ROUTING_TABLE = [
    ({}, S, "fused-folded", "fft", ""),
    ({"transform_kind": "DCT"}, S, "fused-folded", "dct", ""),
    ({"transform_kind": "WAVELET"}, S, "fused-folded", "wavelet", ""),
    ({"version": "regular"}, S, "fused-folded", "fft", ""),
    ({"thresh_op": "soft"}, S, "fused-folded", "fft", ""),
    ({"thresh_op": "garotte"}, S, "fused-folded", "fft", ""),
    # folded-only conditions: FFT drops to the per-iteration kernel,
    # DCT/WAVELET to the XLA scan
    ({"eps": 1e-9}, S, "fused-periter", "fft", "eps"),
    ({"keep_cost_history": True}, S, "fused-periter", "fft",
     "keep_cost_history"),
    ({"global_early_stop": True}, S, "fused-periter", "fft",
     "global_early_stop"),
    ({"version": "adaptive"}, S, "fused-periter", "fft", "version"),
    ({"transform_kind": "DCT", "eps": 1e-9}, S, "xla-scan", "dct", "eps"),
    ({"transform_kind": "WAVELET", "keep_cost_history": True}, S,
     "xla-scan", "wavelet", "keep_cost_history"),
    # kernel-ineligible configs: XLA scan with the first failed gate
    ({"thresh_op": "hard-percentile"}, S, "xla-scan", "fft", "threshold"),
    ({"thresh_op": "soft-percentile", "decay_kind": "factors"}, S,
     "xla-scan", "fft", "threshold"),
    ({}, (4, 100, 100), "xla-scan", "fft", "not both %128"),
    ({}, (2, 3, 128, 128), "xla-scan", "fft", "batch must be 1-D"),
    ({"use_pallas": False}, S, "xla-scan", "", "use_pallas=False"),
    # directional bases: streamed-subband scan (per-group kernel decisions
    # live in ops/shearlet.py)
    ({"transform_kind": "SHEARLET"}, S, "streamed-subband", "", ""),
    ({"transform_kind": "CURVELET"}, S, "streamed-subband", "", ""),
    ({"transform_kind": "SHEARLET", "thresh_op": "hard-percentile"}, S,
     "streamed-subband", "", "threshold"),
    ({"transform_kind": "SHEARLET"}, (4, 100, 100), "streamed-subband", "",
     "not both %128"),
]


@pytest.mark.parametrize("over,shape,route,basis,reason_sub", ROUTING_TABLE)
def test_routing_table(over, shape, route, basis, reason_sub):
    cfg = dataclasses.replace(CLI_DEFAULT, **over)
    rt = solver_route(shape, shape[-2:], cfg)
    assert rt.route == route, rt
    assert rt.basis == basis, rt
    if reason_sub:
        assert reason_sub in rt.reason, rt
    else:
        assert rt.reason == "", rt


def test_backend_gate_reason():
    """On this CPU suite, a compiled (non-interpret) run must fall back
    with a reason naming the backend — not crash in Mosaic lowering."""
    cfg = dataclasses.replace(CLI_DEFAULT, pallas_interpret=False)
    rt = solver_route(S, M, cfg)
    assert rt.route == "xla-scan"
    assert "Mosaic" in rt.reason
    rt_dir = solver_route(S, M, dataclasses.replace(
        cfg, transform_kind="SHEARLET"))
    assert rt_dir.route == "streamed-subband"
    assert "Mosaic" in rt_dir.reason


def test_broadcastable_mask_reason():
    cfg = CLI_DEFAULT
    rt = solver_route(S, (1, 128), cfg)
    assert rt.route == "xla-scan" and "mask" in rt.reason


def test_wavelet_cascade_reason():
    # 640 at level 3: deepest block 160 is not 128-lane alignable
    cfg = dataclasses.replace(CLI_DEFAULT, transform_kind="WAVELET",
                              pallas_interpret=False)
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform

    tr = get_transform("WAVELET", level=3)
    rt = solver_route((2, 640, 640), (640, 640), cfg, tr)
    assert rt.route == "xla-scan"


def test_dispatch_matches_route(monkeypatch):
    """The route is the dispatch: spy on the folded kernel and check it
    fires exactly when solver_route says 'fused-folded'."""
    import pseudo_3d_interpolation_tpu.models.pocs as pocs_mod
    from pseudo_3d_interpolation_tpu.ops import pallas as pallas_pkg

    calls = []
    real = pallas_pkg.pocs_solve_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_pkg, "pocs_solve_fused", spy)
    # pocs_interpolate imports the symbol from the package at call time
    rng = np.random.default_rng(0)
    x = rng.normal(size=S).astype(np.float32)
    z = from_complex(x)
    mask = np.ones(M, np.float32)

    folded_cfg = dataclasses.replace(CLI_DEFAULT, niter=2)
    assert solver_route(S, M, folded_cfg).route == "fused-folded"
    pocs_interpolate(z, mask, config=folded_cfg)
    assert calls, "folded route must dispatch the folded kernel"

    calls.clear()
    scan_cfg = dataclasses.replace(folded_cfg, keep_cost_history=True)
    assert solver_route(S, M, scan_cfg).route == "fused-periter"
    pocs_interpolate(z, mask, config=scan_cfg)
    assert not calls, "per-iter route must not dispatch the folded kernel"


def test_driver_logs_route(capsys, tmp_path):
    """The pipeline driver prints the solver path line."""
    from pseudo_3d_interpolation_tpu.io.ncio import Cube
    from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate

    rng = np.random.default_rng(1)
    il, xl, f = 16, 16, 3
    data = rng.normal(size=(il, xl, f)).astype(np.float32)
    fold = np.ones((il, xl), np.float32)
    cube = Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "freq": np.arange(f, dtype=np.float32)},
        data_vars={"amp": (("iline", "xline", "freq"), data),
                   "fold": (("iline", "xline"), fold)},
    )
    cfg = dataclasses.replace(CLI_DEFAULT, niter=2, use_pallas=False)
    interpolate(cube, cfg, verbose=1)
    out = capsys.readouterr().out
    assert "solver path: xla-scan" in out
    assert "use_pallas=False" in out


def test_describe_route_strings():
    rt = solver_route(S, M, CLI_DEFAULT)
    assert describe_route(rt) == "fused-folded[fft]"
    rt2 = solver_route(S, M, dataclasses.replace(CLI_DEFAULT, eps=1e-9))
    assert describe_route(rt2).startswith("fused-periter[fft] — ")


def test_profile_dir_produces_trace(tmp_path):
    """`p3d pocs --profile-dir` analog: pipeline interpolate(profile_dir=...)
    writes a jax.profiler trace directory — the TPU-equivalent of the
    reference's dask performance_report HTML
    (cube_POCS_interpolation_3D.py:378-383)."""
    import os

    from pseudo_3d_interpolation_tpu.io.ncio import Cube
    from pseudo_3d_interpolation_tpu.pipeline.pocs import interpolate

    rng = np.random.default_rng(2)
    il, xl, f = 16, 16, 2
    cube = Cube(
        coords={"iline": np.arange(il), "xline": np.arange(xl),
                "freq": np.arange(f, dtype=np.float32)},
        data_vars={"amp": (("iline", "xline", "freq"),
                           rng.normal(size=(il, xl, f)).astype(np.float32)),
                   "fold": (("iline", "xline"), np.ones((il, xl),
                                                        np.float32))},
    )
    prof = tmp_path / "trace"
    cfg = dataclasses.replace(CLI_DEFAULT, niter=2, use_pallas=False)
    interpolate(cube, cfg, profile_dir=str(prof))
    files = [os.path.join(r, fn) for r, _, fns in os.walk(prof) for fn in fns]
    assert files, "profile_dir must contain trace artifacts"
    assert any("trace" in fn or fn.endswith((".pb", ".json.gz", ".xplane.pb"))
               for fn in files), files
