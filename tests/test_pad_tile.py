"""pad_to_tile: spatial %128 padding so arbitrary survey grids ride the
fused Pallas kernels (utils/pad.pad_slices_to_tile + the cube drivers).

The reference bins to whatever grid the geometry yields and numpy FFTs
any size (cube_POCS_interpolation_3D.py); the fused kernels here require
%128 sides, so the drivers optionally pad with an observed-zero frame
and crop after.
"""

import dataclasses

import numpy as np

from pseudo_3d_interpolation_tpu.models import POCSConfig
from pseudo_3d_interpolation_tpu.parallel import interpolate_cube, make_mesh
from pseudo_3d_interpolation_tpu.parallel.solver import interpolate_cube_resident
from pseudo_3d_interpolation_tpu.utils.pad import pad_slices_to_tile


def _snr(rec, truth):
    err = np.linalg.norm(rec - truth)
    return 20.0 * np.log10(np.linalg.norm(truth) / max(err, 1e-30))


def _problem(f, h, w, frac=0.5, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    truth = np.zeros((f, h, w), np.complex64)
    for i in range(f):
        for _ in range(4):
            fy, fx = rng.integers(1, 7, size=2)
            ph = rng.uniform(0, 2 * np.pi)
            truth[i] += np.exp(
                2j * np.pi * (fy * yy / h + fx * xx / w) + 1j * ph
            ).astype(np.complex64)
    keep = rng.uniform(size=w) < frac  # decimate whole traces, like bins
    mask = np.broadcast_to(keep[None, :], (h, w)).astype(np.float32)
    return truth, mask


def test_pad_slices_to_tile_helper():
    data = np.arange(2 * 60 * 45, dtype=np.complex64).reshape(2, 60, 45)
    mask = np.ones((60, 45), np.float32) * 0.5
    padded, mask_p, (h, w) = pad_slices_to_tile(data, mask, multiple=128)
    assert padded.shape == (2, 128, 128) and mask_p.shape == (128, 128)
    assert (h, w) == (60, 45)
    np.testing.assert_array_equal(padded[:, :60, :45], data)
    # frame: zero amplitude, mask 1 (observed zeros, NOT missing traces)
    assert np.all(padded[:, 60:, :] == 0) and np.all(padded[:, :, 45:] == 0)
    assert np.all(mask_p[60:, :] == 1.0) and np.all(mask_p[:, 45:] == 1.0)
    np.testing.assert_array_equal(mask_p[:60, :45], mask)
    # aligned input: exact no-op (identical objects, no copy)
    d2 = np.zeros((1, 128, 256), np.complex64)
    m2 = np.ones((128, 256), np.float32)
    p2, mp2, hw2 = pad_slices_to_tile(d2, m2, multiple=128)
    assert p2 is d2 and mp2 is m2 and hw2 == (128, 256)


def test_interpolate_cube_pad_to_tile_round_trip():
    """Sharded cube driver: padded solve returns the ORIGINAL shape and
    still reconstructs (observed-zero frame doesn't poison the slice)."""
    truth, mask = _problem(f=8, h=60, w=45)
    obs = truth * mask
    cfg = POCSConfig(niter=20, p_min=1e-3, version="fast", alpha=0.75,
                     pad_to_tile=True)
    rec, n_it, cost = interpolate_cube(obs, mask, cfg, mesh=make_mesh(),
                                       batch=8)
    assert rec.shape == truth.shape and n_it.shape == (8,)
    assert np.isfinite(rec).all()
    # reconstruction beats the sparse input and is decent in absolute
    # terms (padding spreads the plane waves across bins — spectral
    # leakage — so exact equality with the unpadded solve is NOT expected
    # and the absolute bar sits below the integer-frequency ideal)
    assert _snr(rec, truth) > _snr(obs, truth) + 4.0
    assert _snr(rec, truth) > 8.0


def test_interpolate_cube_resident_pad_to_tile():
    truth, mask = _problem(f=3, h=60, w=45, seed=9)
    obs = truth * mask
    cfg = POCSConfig(niter=8, p_min=1e-3, version="fast", alpha=0.75,
                     pad_to_tile=True)
    rec, n_it, cost = interpolate_cube_resident(obs, mask, cfg, batch=3)
    assert rec.shape == truth.shape and n_it.shape == (3,)
    assert _snr(rec, truth) > _snr(obs, truth) + 3.0


def test_pad_to_tile_enables_fused_kernel(monkeypatch):
    """The point of the feature: a non-%128 grid (fused-kernel gate fails)
    rides the folded Pallas solve once padded. Spied at the call site."""
    from pseudo_3d_interpolation_tpu.ops import pallas as pallas_pkg

    calls = []
    real = pallas_pkg.pocs_solve_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_pkg, "pocs_solve_fused", spy)

    truth, mask = _problem(f=2, h=72, w=40, seed=5)
    obs = truth * mask
    base = POCSConfig(niter=12, p_min=1e-3, version="fast", alpha=0.75,
                      eps=0.0, use_pallas=True, pallas_interpret=True)

    # gate check: 72x40 is NOT kernel-eligible, 128x128 is
    from pseudo_3d_interpolation_tpu.ops.pallas import pallas_supported
    assert not pallas_supported((2, 72, 40), interpret=True)
    assert pallas_supported((2, 128, 128), interpret=True)

    interpolate_cube_resident(obs, mask, base, batch=2)
    assert not calls, "unpadded 72x40 must fall back to the XLA path"

    rec, _, _ = interpolate_cube_resident(
        obs, mask, dataclasses.replace(base, pad_to_tile=True), batch=2)
    assert calls, "padded solve must take the fused Pallas kernel"
    assert rec.shape == truth.shape
    assert _snr(rec, truth) > _snr(obs, truth) + 2.0


def test_pad_to_tile_config_plumbing(tmp_path):
    """YAML and CLI both reach POCSConfig.pad_to_tile."""
    from pseudo_3d_interpolation_tpu.pipeline.pocs import config_from_yaml

    cfg, _ = config_from_yaml({"metadata": {"niter": 5, "pad_to_tile": True}})
    assert cfg.pad_to_tile is True and cfg.niter == 5

    import argparse

    from pseudo_3d_interpolation_tpu.cli import _pocs_config_from_args

    ns = argparse.Namespace(params=None, niter=None, transform=None,
                            no_pallas=False, pad_to_tile=True)
    cfg2 = _pocs_config_from_args(ns, "fast")
    assert cfg2.pad_to_tile is True
    # and the flag merges into a --params YAML config too
    yml = tmp_path / "p.yml"
    yml.write_text("metadata:\n  niter: 7\n")
    ns2 = argparse.Namespace(params=str(yml), niter=None, transform=None,
                             no_pallas=False, pad_to_tile=True)
    cfg3, _ = config_from_yaml(_pocs_config_from_args(ns2, "fast"))
    assert cfg3.pad_to_tile is True and cfg3.niter == 7


def test_auto_pad_policy_rules():
    """None = auto: engage only where the measured policy says the padded
    kernel wins (pad-area <= 1.3, kernel-capable config)."""
    from pseudo_3d_interpolation_tpu.utils.pad import (
        auto_pad_to_tile, pad_area_ratio)

    # pad_to_tile default None; pallas_interpret=True passes the backend
    # gate on this CPU suite the way a real TPU run would
    base = POCSConfig(use_pallas=True, eps=0.0, pallas_interpret=True)
    assert abs(pad_area_ratio(500, 380) - (512 * 384) / (500 * 380)) < 1e-12
    # backend gate: on a non-TPU backend without interpret, the kernel
    # can't run, so auto-padding would be a pure loss — policy declines
    assert not auto_pad_to_tile(
        dataclasses.replace(base, pallas_interpret=False), 500, 380)
    assert auto_pad_to_tile(base, 500, 380)          # 1.03x — wins 1.66x
    assert auto_pad_to_tile(base, 120, 120)          # 1.14x — wins
    assert not auto_pad_to_tile(base, 72, 40)        # 5.69x — loses
    assert not auto_pad_to_tile(base, 300, 200)      # 1.64x — wash
    assert not auto_pad_to_tile(base, 512, 384)      # aligned: no-op
    assert not auto_pad_to_tile(
        dataclasses.replace(base, use_pallas=False), 500, 380)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, transform_kind="SHEARLET"), 500, 380)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, thresh_op="energy"), 500, 380)
    # the folded kernel only engages at eps==0 / no history / no global
    # stop / regular|fast — padding without the kernel is a pure loss
    assert not auto_pad_to_tile(
        dataclasses.replace(base, eps=1e-9), 500, 380)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, global_early_stop=True), 500, 380)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, keep_cost_history=True), 500, 380)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, version="adaptive"), 500, 380)
    # explicit overrides beat the policy in both directions
    assert auto_pad_to_tile(
        dataclasses.replace(base, pad_to_tile=True), 72, 40)
    assert not auto_pad_to_tile(
        dataclasses.replace(base, pad_to_tile=False), 500, 380)


def test_auto_pad_engages_fused_kernel_by_default(monkeypatch):
    """A raw non-%128 grid inside the measured win region rides the fused
    kernel BY DEFAULT (no flag), cropped back to the original shape."""
    from pseudo_3d_interpolation_tpu.ops import pallas as pallas_pkg

    calls = []
    real = pallas_pkg.pocs_solve_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pallas_pkg, "pocs_solve_fused", spy)
    truth, mask = _problem(f=2, h=120, w=120, seed=11)  # pad area 1.14x
    obs = truth * mask
    cfg = POCSConfig(niter=10, p_min=1e-3, version="fast", alpha=0.75,
                     eps=0.0, use_pallas=True, pallas_interpret=True)
    assert cfg.pad_to_tile is None
    rec, _, _ = interpolate_cube_resident(obs, mask, cfg, batch=2)
    assert calls, "auto policy must engage the padded fused kernel"
    assert rec.shape == truth.shape
    assert _snr(rec, truth) > _snr(obs, truth) + 2.0
