"""Curvelet frame tests: tight-frame exactness, CurveLab structure laws
(parabolic angle doubling, wavelet finest ring), plan equivalence, and
curvelet-basis POCS reconstruction.

reference parity: cube_POCS_interpolation_3D.py:277-286 / functions/
POCS.py:530-607 drive POCS through curvelops→CurveLab FDCT; here the frame
is the TPU-native undecimated wrapping-geometry equivalent (ops/curvelet.py).
"""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import cplx, curvelet as cv, metrics
from pseudo_3d_interpolation_tpu.ops import shearlet as sh
from pseudo_3d_interpolation_tpu.models import (
    POCSConfig,
    CurveletTransform,
    get_transform,
    pocs_interpolate_numpy,
)

from test_pocs import random_mask, synthetic_slice


def test_scale_and_angle_laws():
    # CurveLab default scale count: ceil(log2(min shape) - 3)
    assert cv.default_nbscales(64, 64) == 3
    assert cv.default_nbscales(512, 512) == 6
    # parabolic scaling: wedge count doubles every OTHER ring
    assert cv.ring_angles(6, 16) == [16, 16, 32, 32, 0]  # 0 = wavelet finest
    assert cv.ring_angles(6, 16, allcurvelets=True) == [16, 16, 32, 32, 64]
    # lowpass + n/2 symmetrized wedge pairs per ring (+ isotropic finest)
    assert cv.n_subbands(6, 16) == 1 + 8 + 8 + 16 + 16 + 1
    with pytest.raises(ValueError):
        cv.ring_angles(4, nbangles_coarse=6)  # must be a multiple of 4


@pytest.mark.parametrize("shape,kw", [
    ((64, 64), {}),
    ((64, 32), {}),
    ((64, 64), {"allcurvelets": True}),
    ((128, 128), {"nbscales": 5, "nbangles_coarse": 8}),
])
def test_tight_frame_normalization(shape, kw):
    psi = cv.curvelet_spectra(*shape, **kw)
    total = np.sum(psi.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_roundtrip_exact():
    rng = np.random.default_rng(70)
    shape = (64, 64)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
    z = cplx.from_complex(x)
    tr = CurveletTransform()
    coeffs = tr.forward(z)
    assert coeffs.shape == (cv.n_subbands(3),) + shape
    back = cplx.to_complex(tr.inverse(coeffs))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_planned_transform_matches_full():
    """The support-cropped plan must reproduce the full (uncropped) frame
    transform exactly; the plan format is shared with the shearlet basis."""
    rng = np.random.default_rng(71)
    for shape in [(64, 64), (128, 128), (256, 256)]:
        z = cplx.from_complex(
            (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64))
        psi = cv.curvelet_spectra(*shape)
        plan = cv.curvelet_plan(*shape)
        perm = plan.perm
        assert sorted(perm.tolist()) == list(range(psi.shape[0]))
        full = sh.shearlet_transform(z, psi)
        full_p = cplx.Cplx(np.asarray(full.re)[..., perm, :, :],
                           np.asarray(full.im)[..., perm, :, :])
        planned = sh.shearlet_transform_planned(z, plan)
        np.testing.assert_allclose(np.asarray(planned.re), np.asarray(full_p.re),
                                   atol=1e-4)
        mod = cplx.Cplx(planned.re * 0.7, planned.im * 0.7)
        inv = np.argsort(perm)
        inv_full = sh.inverse_shearlet_transform(
            cplx.Cplx(np.asarray(mod.re)[..., inv, :, :],
                      np.asarray(mod.im)[..., inv, :, :]), psi)
        inv_planned = sh.inverse_shearlet_transform_planned(mod, plan)
        np.testing.assert_allclose(np.asarray(inv_planned.re),
                                   np.asarray(inv_full.re), atol=1e-4)


def test_directional_selectivity():
    """A plane wave concentrates in few wedges of its ring (needs a shape
    large enough for two angular rings)."""
    h = w = 128
    y, x = np.mgrid[0:h, 0:w]
    img = np.cos(2 * np.pi * 24 * y / h).astype(np.float32)
    z = cplx.Cplx(img, np.zeros_like(img))
    coeffs = CurveletTransform().forward(z)
    energy = np.asarray(coeffs.abs2()).sum(axis=(-2, -1))
    frac_top2 = np.sort(energy)[::-1][:2].sum() / energy.sum()
    assert frac_top2 > 0.8, frac_top2


def test_real_input_real_coefficients():
    """ω -> −ω symmetric spectra ⇒ (nearly) real coefficients for real input
    (the wedge pairs at θ and θ+π are merged, CurveLab real-transform)."""
    rng = np.random.default_rng(72)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    z = cplx.Cplx(x, np.zeros_like(x))
    coeffs = CurveletTransform().forward(z)
    ratio = float(np.abs(np.asarray(coeffs.im)).max()
                  / np.abs(np.asarray(coeffs.re)).max())
    assert ratio < 1e-2, ratio


def test_registry_and_adaptive_rejection():
    tr = get_transform("CURVELET", nbangles_coarse=8)
    assert tr.nbangles_coarse == 8
    coeffs = tr.forward(cplx.Cplx(np.zeros((64, 64), np.float32),
                                  np.zeros((64, 64), np.float32)))
    with pytest.raises(ValueError, match="shearlet-specific"):
        tr.decay(coeffs, "exponential", 10, 0.99, "adaptive", "values")


def test_curvelet_pocs_reconstruction():
    """Curvelet-basis POCS on a 50%-decimated complex slice (reference
    TRANSFORM_KIND='CURVELET', cube_POCS_interpolation_3D.py:277-286)."""
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=8)
    obs = x * mask
    # niter=40: the adaptive-restart FPOCS trades a little mid-schedule
    # aggressiveness for robust tail convergence, so it wants the slightly
    # longer decay schedule to clear the same +5 dB bar (it stops itself
    # at ~25 effective iterations)
    cfg = POCSConfig(niter=40, thresh_op="hard", thresh_model="exponential",
                     version="fast", alpha=0.75, transform_kind="CURVELET")
    rec, n_it, _ = pocs_interpolate_numpy(obs, mask, cfg,
                                          transform=CurveletTransform())
    snr_in = float(metrics.snr(np.abs(x), np.abs(obs)))
    snr_out = float(metrics.snr(np.abs(x), np.abs(rec)))
    assert snr_out > snr_in + 5, (snr_in, snr_out)


@pytest.mark.parametrize("shape", [(96, 60), (65, 65), (48, 96)])
def test_odd_shapes_tight_and_roundtrip(shape):
    """Non-power-of-two and odd grids: the frame stays exactly tight and
    the planned roundtrip reconstructs (boxes are ceil'd; the coverage
    normalization guards any discretization hole)."""
    rng = np.random.default_rng(2)
    psi = cv.curvelet_spectra(*shape)
    total = np.sum(psi.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)
    plan = cv.curvelet_plan(*shape)
    z = cplx.from_complex(
        (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64))
    back = sh.inverse_shearlet_transform_planned(
        sh.shearlet_transform_planned(z, plan), plan)
    np.testing.assert_allclose(np.asarray(back.re), np.asarray(z.re), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.im), np.asarray(z.im), atol=1e-5)


@pytest.mark.parametrize("op", ["hard", "soft", "garrote"])
def test_fused_kernel_matches_streamed_on_curvelet_plan(op):
    """The fused Pallas subband kernel (ops/pallas/subband.py) consumes
    curvelet plans through the shared plan format — numerics must equal the
    XLA streamed path for the curvelet group/box structure too."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 256
    z = cplx.Cplx(
        jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)))
    plan = cv.curvelet_plan(n, n)
    L = sum(g.psi.shape[0] for g in plan)
    tau = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, L)).astype(np.float32))
    a = sh.pocs_subband_apply(z, plan, tau, op)
    b = sh.pocs_subband_apply(z, plan, tau, op, use_pallas=True,
                              pallas_interpret=True)
    scale = float(jnp.max(jnp.abs(a.re))) or 1.0
    d = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
    assert d / scale < 3e-6, d


# ---------------------------------------------------------------------------
# Decimated (wrapped) coefficient representation (VERDICT r4 #7)
# ---------------------------------------------------------------------------
def test_decimated_perfect_reconstruction():
    from pseudo_3d_interpolation_tpu.ops import curvelet as cv
    from pseudo_3d_interpolation_tpu.ops.cplx import from_complex

    h = w = 128
    lay = cv.decimated_layout(h, w)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, h, w))
         + 1j * rng.normal(size=(2, h, w))).astype(np.complex64)
    z = from_complex(x)
    import jax

    prec = jax.lax.Precision.HIGHEST
    co = cv.decimated_forward(z, lay, prec)
    # per-band wrapped grids, all smaller than or equal to the slice
    assert all(c.re.shape[-2] <= h and c.re.shape[-1] <= w for c in co)
    back = cv.decimated_inverse(co, lay, h, w, prec)
    np.testing.assert_allclose(np.asarray(back.re), x.real, atol=2e-5)
    np.testing.assert_allclose(np.asarray(back.im), x.imag, atol=2e-5)


def test_decimated_storage_parity():
    """The wrapped grids deliver the CurveLab-like storage cut: >= 2.5x
    fewer coefficient elements at 512^2 (measured 2.8x; 3.6x at 1024^2)."""
    from pseudo_3d_interpolation_tpu.ops import curvelet as cv

    dec, und = cv.decimated_coeff_elements(512, 512)
    assert und / dec >= 2.5, (dec, und)


def test_decimated_pocs_solve_quality():
    """POCS through the decimated representation (generic XLA branch)
    reconstructs about as well as the undecimated frame (same recipe as
    test_curvelet_pocs_reconstruction)."""
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=8)
    obs = x * mask
    cfg = POCSConfig(niter=40, thresh_op="hard", thresh_model="exponential",
                     version="fast", alpha=0.75, transform_kind="CURVELET")
    snr_in = float(metrics.snr(np.abs(x), np.abs(obs)))
    outs = {}
    for decimated in (False, True):
        tr = get_transform("CURVELET", decimated=decimated)
        rec, _, _ = pocs_interpolate_numpy(obs, mask, cfg, transform=tr)
        outs[decimated] = float(metrics.snr(np.abs(x), np.abs(rec)))
    assert outs[True] > snr_in + 5, (snr_in, outs)
    assert outs[True] > outs[False] - 3.0, outs


def test_decimated_yaml_and_routing():
    import dataclasses

    from pseudo_3d_interpolation_tpu.models.pocs import solver_route
    from pseudo_3d_interpolation_tpu.models.transforms import (
        DecimatedCurveletTransform, get_transform)
    from pseudo_3d_interpolation_tpu.pipeline.pocs import config_from_yaml

    cfg, extra = config_from_yaml({"metadata": {
        "transform_kind": "CURVELET", "decimated": True, "niter": 5,
        "p_min": 1e-3}})
    assert extra["decimated"] is True
    tr = get_transform("CURVELET", decimated=True)
    assert isinstance(tr, DecimatedCurveletTransform)
    cfg = dataclasses.replace(cfg, use_pallas=True, pallas_interpret=True)
    rt = solver_route((2, 128, 128), (128, 128), cfg, tr)
    assert rt.route == "xla-scan" and "no fused kernel" in rt.reason


def test_decimated_data_driven_decay_raises():
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.ops.cplx import from_complex

    tr = get_transform("CURVELET", decimated=True)
    z = from_complex(np.zeros((1, 64, 64), np.complex64))
    co = tr.forward(z)
    with pytest.raises(ValueError, match="data-driven"):
        tr.decay(co, "data-driven", 5, 0.99, 1e-3, "values")


def test_decimated_precision_contract():
    """box_precision is meaningless for the decimated variant (every band
    is a wrapped grid) and the production HIGH injection must not reach it
    — the support-cropped stage class measured a real 0.5 dB loss at HIGH
    (docs/perf.md round 4b)."""
    from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.pipeline.pocs import (
        _production_transform)

    with pytest.raises(ValueError, match="box_precision"):
        get_transform("CURVELET", decimated=True, box_precision="highest")
    cfg = POCSConfig(transform_kind="CURVELET")
    tr, _ = _production_transform(cfg, {"decimated": True})
    assert tr.precision == "highest"  # keeps its own f32 default
    tr2, _ = _production_transform(cfg, {})
    assert tr2.precision == "high"  # stacked frame keeps the round-4b mix
    assert tr2.box_precision == "highest"
