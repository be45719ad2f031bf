"""Solver tests: trajectory parity vs an independent numpy POCS, plus
decimate-then-reconstruct quality (the metric the reference's paper uses).
"""

import dataclasses

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.models import (
    DCTTransform,
    POCSConfig,
    pocs_interpolate_numpy,
)
from pseudo_3d_interpolation_tpu.ops import metrics


def synthetic_slice(h=64, w=64, seed=0, complex_=True):
    """Plane-wave superposition: sparse in the Fourier basis, seismic-like."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    data = np.zeros((h, w), np.complex128)
    for _ in range(6):
        fy, fx = rng.integers(1, 8, size=2)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.5, 2.0)
        data += amp * np.exp(2j * np.pi * (fy * y / h + fx * x / w) + 1j * phase)
    if not complex_:
        return np.ascontiguousarray(data.real.astype(np.float32))
    return data.astype(np.complex64)


def random_mask(h=64, w=64, frac=0.5, seed=1):
    rng = np.random.default_rng(seed)
    # decimate whole "traces" (columns), like missing bins in a cube
    keep = rng.uniform(size=w) < frac
    return np.broadcast_to(keep[None, :], (h, w)).astype(np.float32)


def numpy_pocs_regular(x, mask, niter, p_max, p_min, thresh_op="hard", alpha=1.0, eps=1e-9):
    """Independent mirror of the reference POCS loop (FFT basis, exponential
    decay, magnitude thresholds), written directly from the published
    algorithm for golden comparison."""
    X0 = np.fft.fft2(x)
    amax = np.abs(X0).max()
    tau_max, tau_min = p_max * amax, p_min * amax
    m = np.arange(niter) / (niter - 1)
    tau = tau_max * np.exp(np.log(tau_min / tau_max) * m)

    x_old = x.copy()
    costs = []
    for i in range(niter):
        X = np.fft.fft2(x_old)
        if thresh_op == "hard":
            X = np.where(np.abs(X) < tau[i], 0, X)
        else:
            mag = np.abs(X)
            X = X * np.clip(1 - tau[i] / np.where(mag == 0, 1, mag), 0, None)
        x_inv = np.fft.ifft2(X)
        x_inv = x_inv * (1 - alpha * mask) + alpha * x
        cost = np.sum(np.abs(x_inv) - np.abs(x_old)) ** 2 / np.sum(np.abs(x_inv)) ** 2
        costs.append(cost)
        x_old = x_inv
        if i > 2 and cost < eps:
            break
    return x_inv, i + 1, costs


@pytest.mark.parametrize("thresh_op", ["hard", "soft"])
def test_regular_pocs_matches_numpy_mirror(thresh_op):
    x = synthetic_slice()
    mask = random_mask()
    xs = x * mask
    niter = 15
    cfg = POCSConfig(
        niter=niter, thresh_op=thresh_op, thresh_model="exponential",
        p_max=0.99, p_min=1e-3, version="regular", eps=0.0,
    )
    got, n_it, cost = pocs_interpolate_numpy(xs, mask, cfg)
    expected, n_ref, costs_ref = numpy_pocs_regular(xs, mask, niter, 0.99, 1e-3, thresh_op, eps=0.0)
    assert int(n_it) == n_ref == niter
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got / scale, expected / scale, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(float(cost), costs_ref[-1], rtol=2e-2, atol=1e-8)


def test_early_stop_freezes_lanes():
    x = synthetic_slice()
    mask = random_mask()
    cfg = POCSConfig(niter=30, p_min=1e-3, eps=1e-2, version="regular")
    _, n_it, _ = pocs_interpolate_numpy(x * mask, mask, cfg)
    _, n_ref, _ = numpy_pocs_regular(x * mask, mask, 30, 0.99, 1e-3, eps=1e-2)
    assert int(n_it) == n_ref < 30


def test_zero_input_short_circuit():
    mask = random_mask()
    z = np.zeros((64, 64), np.complex64)
    out, n_it, cost = pocs_interpolate_numpy(z, mask, POCSConfig(niter=10))
    assert int(n_it) == 0
    assert float(cost) == 0.0
    np.testing.assert_array_equal(out, z)


def test_reconstruction_snr_fft():
    """Decimate-then-reconstruct: SNR must improve dramatically vs the
    sparse input (reference quality harness, SURVEY.md §4)."""
    x = synthetic_slice()
    mask = random_mask(frac=0.5)
    xs = x * mask
    cfg = POCSConfig(niter=50, thresh_op="hard", thresh_model="exponential",
                     p_min="adaptive", version="fast", alpha=0.75)
    rec, n_it, _ = pocs_interpolate_numpy(xs, mask, cfg)
    snr_in = float(metrics.snr(np.abs(x), np.abs(xs)))
    snr_out = float(metrics.snr(np.abs(x), np.abs(rec)))
    assert snr_out > snr_in + 10, (snr_in, snr_out)
    assert snr_out > 20


def test_fast_accelerates_early_convergence():
    """True Nesterov FPOCS (unlike the reference's inert momentum — see
    models/pocs.py) must converge faster than regular POCS at small
    iteration budgets, and still reach high quality at larger ones."""
    x = synthetic_slice()
    mask = random_mask(frac=0.4, seed=3)
    xs = x * mask
    for niter in (8, 12, 16):
        base = POCSConfig(niter=niter, p_min=1e-4, version="regular", alpha=1.0)
        rec_r, _, _ = pocs_interpolate_numpy(xs, mask, base)
        rec_f, _, _ = pocs_interpolate_numpy(xs, mask, dataclasses.replace(base, version="fast"))
        snr_r = float(metrics.snr(np.abs(x), np.abs(rec_r)))
        snr_f = float(metrics.snr(np.abs(x), np.abs(rec_f)))
        assert snr_f > snr_r, (niter, snr_r, snr_f)
    rec_f, _, _ = pocs_interpolate_numpy(
        xs, mask, POCSConfig(niter=25, p_min=1e-4, version="fast", alpha=1.0)
    )
    assert float(metrics.snr(np.abs(x), np.abs(rec_f))) > 30


def test_adaptive_version_runs():
    x = synthetic_slice()
    mask = random_mask()
    cfg = POCSConfig(niter=20, version="adaptive", alpha=0.75, p_min=1e-3)
    rec, n_it, cost = pocs_interpolate_numpy(x * mask, mask, cfg)
    assert np.isfinite(np.abs(rec)).all()
    assert float(metrics.snr(np.abs(x), np.abs(rec))) > 10


def test_batched_matches_single():
    slices = np.stack([synthetic_slice(seed=s) for s in range(3)])
    mask = random_mask(frac=0.6, seed=2)
    cfg = POCSConfig(niter=10, p_min=1e-3)
    rec_b, n_b, cost_b = pocs_interpolate_numpy(slices * mask, mask, cfg)
    assert rec_b.shape == slices.shape and n_b.shape == (3,)
    for b in range(3):
        rec_s, n_s, _ = pocs_interpolate_numpy(slices[b] * mask, mask, cfg)
        np.testing.assert_allclose(rec_b[b], rec_s, rtol=1e-3, atol=1e-4)
        assert n_b[b] == n_s


def test_real_input_returns_real():
    x = synthetic_slice(complex_=False)
    mask = random_mask()
    rec, _, _ = pocs_interpolate_numpy(x * mask, mask, POCSConfig(niter=15, p_min=1e-3))
    assert not np.iscomplexobj(rec)
    assert float(metrics.snr(x, rec)) > 10


def test_dct_transform_runs():
    x = synthetic_slice(complex_=False)
    mask = random_mask(frac=0.6)
    cfg = POCSConfig(niter=40, transform_kind="DCT", p_min=1e-3, version="fast")
    rec, _, _ = pocs_interpolate_numpy(x * mask, mask, cfg, transform=DCTTransform())
    assert float(metrics.snr(x, rec)) > float(metrics.snr(x, x * mask))


@pytest.mark.parametrize("model", ["linear", "exponential-2", "data-driven",
                                   "inverse_proportional"])
def test_solver_all_decay_models(model):
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=9)
    cfg = POCSConfig(niter=20, thresh_model=model, p_min=1e-3, version="fast")
    rec, n_it, cost = pocs_interpolate_numpy(x * mask, mask, cfg)
    assert np.isfinite(np.abs(rec)).all(), model
    snr = float(metrics.snr(np.abs(x), np.abs(rec)))
    assert snr > 5, (model, snr)


@pytest.mark.parametrize("op", ["garrote", "soft-percentile", "hard-percentile"])
def test_solver_threshold_ops(op):
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=10)
    kind = "factors" if op.endswith("percentile") else "values"
    p_max, p_min = (99.9, 60.0) if kind == "factors" else (0.99, 1e-3)
    cfg = POCSConfig(niter=25, thresh_op=op, decay_kind=kind,
                     p_max=p_max, p_min=p_min, version="regular")
    rec, n_it, _ = pocs_interpolate_numpy(x * mask, mask, cfg)
    assert np.isfinite(np.abs(rec)).all(), op
    assert float(metrics.snr(np.abs(x), np.abs(rec))) > 3, op


def test_solver_sqrt_decay():
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=11)
    cfg = POCSConfig(niter=15, sqrt_decay=True, p_min=1e-3)
    rec, _, _ = pocs_interpolate_numpy(x * mask, mask, cfg)
    assert np.isfinite(np.abs(rec)).all()


def test_cost_history():
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=12)
    from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
    from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
    import jax

    cfg = POCSConfig(niter=12, p_min=1e-3, keep_cost_history=True)
    res = jax.jit(lambda z, m: pocs_interpolate(z, m, config=cfg))(
        from_complex(x * mask), mask)
    hist = np.asarray(res.cost_history)
    assert hist.shape == (12,)
    assert np.isfinite(hist).all()
    # cost decreases over iterations (roughly monotone at the end)
    assert hist[-1] < hist[1]


def test_global_early_stop_matches_scan():
    """while_loop early-stop variant == fixed-scan results (same eps)."""
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=13)
    obs = x * mask
    base = POCSConfig(niter=40, p_min=1e-3, eps=1e-6, version="regular")
    rec_a, n_a, c_a = pocs_interpolate_numpy(obs, mask, base)
    ges = dataclasses.replace(base, global_early_stop=True)
    rec_b, n_b, c_b = pocs_interpolate_numpy(obs, mask, ges)
    assert n_a == n_b
    assert n_a < 40  # early stop actually triggered
    np.testing.assert_allclose(rec_a, rec_b, rtol=1e-5, atol=1e-6)


def test_broadcastable_mask_keeps_xla_path_with_pallas():
    """A merely-broadcastable 2-D mask (1, W) must NOT be routed into the
    fused kernels (they read a full (H, W) mask block — out-of-bounds NaN,
    review round-3); the solve must match the XLA path exactly."""
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(5)
    n, b = 128, 2
    x = rng.standard_normal((b, n, n)).astype(np.float32)
    mask_row = (rng.random((1, n)) < 0.5).astype(np.float32)  # kills columns
    z = Cplx(jnp.asarray(x * mask_row), jnp.zeros((b, n, n), jnp.float32))
    base = dict(niter=5, eps=0.0, alpha=0.75, p_min=1e-4)
    ref = pocs_interpolate(z, jnp.asarray(mask_row), None,
                           POCSConfig(**base))
    got = pocs_interpolate(z, jnp.asarray(mask_row), None,
                           POCSConfig(**base, use_pallas=True,
                                      pallas_interpret=True))
    assert np.isfinite(np.asarray(got.data.re)).all()
    np.testing.assert_allclose(np.asarray(got.data.re),
                               np.asarray(ref.data.re), atol=1e-6)


def test_garotte_alias_rides_fused_kernel():
    """'garotte' (threshold_pair's accepted alias) must reach the fused
    kernel as 'garrote', matching the canonical spelling's output."""
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(6)
    n, b = 128, 2
    x = rng.standard_normal((b, n, n)).astype(np.float32)
    mask = (rng.random((n, n)) < 0.5).astype(np.float32)
    z = Cplx(jnp.asarray(x * mask), jnp.zeros((b, n, n), jnp.float32))
    outs = []
    for op in ("garrote", "garotte"):
        cfg = POCSConfig(niter=5, eps=0.0, alpha=0.75, p_min=1e-4,
                         thresh_op=op, use_pallas=True,
                         pallas_interpret=True)
        outs.append(np.asarray(
            pocs_interpolate(z, jnp.asarray(mask), None, cfg).data.re))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_empty_cube_returns_empty():
    from pseudo_3d_interpolation_tpu.models import POCSConfig
    from pseudo_3d_interpolation_tpu.parallel.solver import (
        interpolate_cube, interpolate_cube_resident)

    mask = np.ones((16, 16), np.float32)
    for fn in (interpolate_cube, interpolate_cube_resident):
        rec, it, cost = fn(np.zeros((0, 16, 16), np.complex64), mask,
                           POCSConfig(niter=3))
        assert rec.shape == (0, 16, 16) and it.shape == (0,) and cost.shape == (0,)


def test_cplx_rejects_native_complex_operands():
    """A native complex operand silently dropped the cross terms (wrong
    math) and leaked complex dtype into the (re, im) pair representation
    (opaque UNIMPLEMENTED on the TPU backend) — refuse loudly."""
    import jax.numpy as jnp
    import pytest

    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx, from_complex

    z = Cplx(jnp.ones(4), jnp.full(4, 2.0))
    for op in (lambda: z * (1 + 1j), lambda: z + 1j, lambda: z - (2 + 0j),
               lambda: z * jnp.asarray([1 + 1j] * 4)):
        with pytest.raises(TypeError, match="from_complex"):
            op()
    # the documented wrapper works and real scalars stay fine
    w = z * from_complex(np.full(4, 1 + 1j, np.complex64))
    np.testing.assert_allclose(np.asarray(w.re), -1.0)
    np.testing.assert_allclose(np.asarray(w.im), 3.0)
    np.testing.assert_allclose(np.asarray((z * 2.0).re), 2.0)
