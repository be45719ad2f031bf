"""Sharding tests on the 8-device virtual CPU mesh: sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate_numpy
from pseudo_3d_interpolation_tpu.ops import cplx
from pseudo_3d_interpolation_tpu.parallel import (
    interpolate_cube,
    make_mesh,
    pocs_interpolate_sharded,
)

from test_pocs import random_mask, synthetic_slice


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device():
    slices = np.stack([synthetic_slice(seed=s) for s in range(16)])
    mask = random_mask(frac=0.5, seed=4)
    cfg = POCSConfig(niter=12, p_min=1e-3, version="fast")
    mesh = make_mesh()
    res = pocs_interpolate_sharded(cplx.from_complex(slices * mask), mask, mesh=mesh, config=cfg)
    rec_sharded = cplx.to_complex(res.data)
    rec_single, n_single, _ = pocs_interpolate_numpy(slices * mask, mask, cfg)
    np.testing.assert_allclose(rec_sharded, rec_single, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.n_iterations), n_single)


def test_sharded_rejects_indivisible_batch():
    import pytest

    slices = np.stack([synthetic_slice(seed=s) for s in range(3)])
    mask = random_mask()
    with pytest.raises(ValueError, match="divisible"):
        pocs_interpolate_sharded(cplx.from_complex(slices), mask, mesh=make_mesh())


def test_interpolate_cube_chunks_and_pads():
    """Cube driver: odd slice count forces padding; zero pad slices are free."""
    f = 19
    slices = np.stack([synthetic_slice(seed=s) for s in range(f)])
    mask = random_mask(frac=0.6, seed=5)
    cfg = POCSConfig(niter=8, p_min=1e-3)
    calls = []
    rec, n_it, cost = interpolate_cube(
        slices * mask, mask, cfg, mesh=make_mesh(), batch=8,
        progress=lambda done, total: calls.append((done, total)),
    )
    assert rec.shape == slices.shape
    assert n_it.shape == (f,)
    assert calls[-1] == (f, f)
    # chunked result must equal one-shot result
    rec1, n1, _ = pocs_interpolate_numpy(slices * mask, mask, cfg)
    np.testing.assert_allclose(rec, rec1, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(n_it, n1)


def test_interpolate_cube_real_input():
    f = 8
    slices = np.stack([synthetic_slice(seed=s, complex_=False) for s in range(f)])
    mask = random_mask(frac=0.6, seed=6)
    rec, _, _ = interpolate_cube(slices * mask, mask, POCSConfig(niter=8, p_min=1e-3),
                                 mesh=make_mesh(), batch=8)
    assert rec.dtype == np.float32


def test_reshard_axis_all_to_all():
    """Device-side layout swap between trace-parallel and slice-parallel
    shardings (replaces the reference's on-disk transpose)."""
    import jax
    from pseudo_3d_interpolation_tpu.parallel.mesh import reshard_axis

    mesh = make_mesh()
    x = np.arange(8 * 16 * 4, dtype=np.float32).reshape(8, 16, 4)
    a = reshard_axis(x, mesh, axis=0)  # sharded over leading (slice) axis
    assert a.sharding.spec[0] == "slices"
    b = reshard_axis(a, mesh, axis=1)  # all_to_all to trace-parallel
    assert b.sharding.spec[1] == "slices" and b.sharding.spec[0] is None
    np.testing.assert_array_equal(np.asarray(b), x)
    # computation composes across the reshard
    y = jax.jit(jnp.sum)(b)
    assert float(y) == x.sum()


def test_2d_mesh_slices_by_space():
    """Slice-DP x spatial sharding (2-D mesh) matches single-device —
    XLA partitions the DFT matmuls and inserts the collectives."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
    from pseudo_3d_interpolation_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    obs = np.stack([synthetic_slice(seed=s) for s in range(8)])
    mask = random_mask(frac=0.5, seed=20)
    obs = obs * mask
    cfg = POCSConfig(niter=10, p_min=1e-3, version="fast")
    sh = NamedSharding(mesh, P("slices", "space", None))
    z = cplx.Cplx(jax.device_put(jnp.asarray(obs.real), sh),
                  jax.device_put(jnp.asarray(obs.imag), sh))
    m = jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P("space", None)))
    res = jax.jit(lambda z, m: pocs_interpolate(z, m, config=cfg))(z, m)
    rec = np.asarray(res.data.re) + 1j * np.asarray(res.data.im)
    rec1, _, _ = pocs_interpolate_numpy(obs, mask, cfg)
    np.testing.assert_allclose(rec, rec1, rtol=1e-3, atol=1e-4)


def test_scanned_whole_cube_solver_matches_batched():
    """pocs_interpolate_scanned (one dispatch, lax.scan over batches) must
    equal per-batch dispatches — the remote-device production path where
    per-launch latency dominates (docs/perf.md round 2)."""
    from pseudo_3d_interpolation_tpu.parallel.solver import (
        interpolate_cube, pocs_interpolate_scanned)

    rng = np.random.default_rng(3)
    F, n = 16, 64
    truth = (rng.normal(size=(F, n, n)) + 1j * rng.normal(size=(F, n, n))
             ).astype(np.complex64)
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    obs = truth * mask
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx, from_complex
    from pseudo_3d_interpolation_tpu.parallel import make_mesh

    cfg = POCSConfig(niter=6, p_min=1e-3, version="fast", eps=0.0)
    tr = get_transform("FFT")
    rec_b, ni_b, cost_b = interpolate_cube(obs, mask, cfg, transform=tr, batch=8)
    z = from_complex(obs)
    rec_s, ni_s, cost_s = jax.jit(
        lambda z_, m: pocs_interpolate_scanned(z_, m, tr, cfg, batch=8)
    )(z, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(rec_s.re), rec_b.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec_s.im), rec_b.imag, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ni_s), ni_b)
    # sharded too: the scanned program partitions the batch axis
    mesh = make_mesh(4)
    sh = NamedSharding(mesh, P(None))
    zd = Cplx(jax.device_put(z.re, NamedSharding(mesh, P(None, None, None))),
              jax.device_put(z.im, NamedSharding(mesh, P(None, None, None))))
    rec_sh, _, _ = jax.jit(
        lambda z_, m: pocs_interpolate_scanned(z_, m, tr, cfg, batch=8)
    )(zd, jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(rec_sh.re), rec_b.real, atol=1e-5)


def test_sharded_curvelet_solver():
    """The sharded cube solver works with the CURVELET basis (per-wedge
    thresholds ride axis -3 like shearlets; slices shard over the mesh)."""
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.ops import metrics

    rng = np.random.default_rng(9)
    F, n = 8, 64
    truth = (rng.normal(size=(F, n, n)) + 1j * rng.normal(size=(F, n, n))
             ).astype(np.complex64)
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.6).astype(np.float32)[None, :], (n, n)))
    obs = truth * mask
    cfg = POCSConfig(niter=8, p_min=1e-3, version="fast", eps=0.0,
                     transform_kind="CURVELET")
    rec, n_it, cost = interpolate_cube(
        obs, mask, cfg, transform=get_transform("CURVELET"), batch=8)
    assert rec.shape == obs.shape and np.isfinite(rec).all()
    # a solve actually happened: gaps were filled
    gaps = np.abs(rec[:, mask == 0])
    assert gaps.size and np.median(gaps) > 0


def test_resident_driver_matches_host_chunked():
    """interpolate_cube_resident (one upload, donated per-batch launches)
    must produce exactly the host-chunked driver's outputs + telemetry."""
    from pseudo_3d_interpolation_tpu.parallel.solver import (
        interpolate_cube_resident)

    rng = np.random.default_rng(11)
    F, n = 10, 64  # non-multiple of batch: exercises padding
    truth = (rng.normal(size=(F, n, n)) + 1j * rng.normal(size=(F, n, n))
             ).astype(np.complex64)
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    obs = truth * mask
    cfg = POCSConfig(niter=6, p_min=1e-3, version="fast", eps=0.0)
    rec_h, it_h, c_h = interpolate_cube(obs, mask, cfg, batch=8)
    rec_r, it_r, c_r = interpolate_cube_resident(obs, mask, cfg, batch=4)
    np.testing.assert_allclose(rec_r, rec_h, atol=1e-5)
    np.testing.assert_array_equal(it_r, it_h)
    np.testing.assert_allclose(c_r, c_h, rtol=1e-5)
