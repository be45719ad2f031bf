"""Shearlet system tests: tight-frame exactness, subband structure,
shearlet-basis POCS reconstruction."""

import jax.numpy as jnp
import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import cplx, metrics, shearlet as sh
from pseudo_3d_interpolation_tpu.models import POCSConfig, ShearletTransform, pocs_interpolate_numpy

from test_pocs import random_mask, synthetic_slice


def test_subband_count_and_scales():
    assert sh.default_scales(64, 64) == 3
    assert sh.default_scales(512, 512) == 4
    assert sh.n_subbands(3) == 1 + 4 + 8 + 16
    psi = sh.shearlet_spectra(64, 64)
    assert psi.shape == (29, 64, 64)


def test_tight_frame_normalization():
    psi = sh.shearlet_spectra(64, 64)
    total = np.sum(psi.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_rectangular_shape():
    psi = sh.shearlet_spectra(64, 32)
    total = np.sum(psi.astype(np.float64) ** 2, axis=0)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


@pytest.mark.parametrize("shape", [(64, 64), (64, 32)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(60)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
    psi = sh.shearlet_spectra(*shape)
    z = cplx.from_complex(x)
    coeffs = sh.shearlet_transform(z, psi)
    assert coeffs.shape == (psi.shape[0],) + shape
    back = cplx.to_complex(sh.inverse_shearlet_transform(coeffs, psi))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_real_input_real_coefficients():
    rng = np.random.default_rng(61)
    x = rng.normal(size=(64, 64)).astype(np.float32)
    psi = sh.shearlet_spectra(64, 64)
    z = cplx.Cplx(x, np.zeros_like(x))
    coeffs = sh.shearlet_transform(z, psi)
    # real-symmetric spectra -> (nearly) real coefficients for real input
    ratio = float(np.abs(np.asarray(coeffs.im)).max() / np.abs(np.asarray(coeffs.re)).max())
    assert ratio < 1e-2, ratio


def test_directional_selectivity():
    """A horizontal plane wave concentrates in few directional subbands."""
    h = w = 64
    y, x = np.mgrid[0:h, 0:w]
    img = np.cos(2 * np.pi * 12 * y / h).astype(np.float32)  # variation along rows
    psi = sh.shearlet_spectra(h, w)
    z = cplx.Cplx(img, np.zeros_like(img))
    coeffs = sh.shearlet_transform(z, psi)
    energy = np.asarray(coeffs.abs2()).sum(axis=(-2, -1))
    frac_top2 = np.sort(energy)[::-1][:2].sum() / energy.sum()
    assert frac_top2 > 0.8, frac_top2


def test_batched_transform():
    rng = np.random.default_rng(62)
    x = rng.normal(size=(5, 64, 64)).astype(np.float32)
    psi = sh.shearlet_spectra(64, 64)
    z = cplx.Cplx(x, np.zeros_like(x))
    coeffs = sh.shearlet_transform(z, psi)
    assert coeffs.shape == (5, 29, 64, 64)
    back = np.asarray(sh.inverse_shearlet_transform(coeffs, psi).re)
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_shearlet_pocs_reconstruction():
    """Shearlet-basis POCS on a 50%-decimated complex slice with adaptive
    p_min (the production basis of BASELINE config 5)."""
    x = synthetic_slice()
    mask = random_mask(frac=0.5, seed=8)
    obs = x * mask
    cfg = POCSConfig(niter=30, thresh_op="hard", thresh_model="exponential",
                     p_min="adaptive", version="fast", alpha=0.75,
                     transform_kind="SHEARLET")
    rec, n_it, _ = pocs_interpolate_numpy(obs, mask, cfg, transform=ShearletTransform())
    snr_in = float(metrics.snr(np.abs(x), np.abs(obs)))
    snr_out = float(metrics.snr(np.abs(x), np.abs(rec)))
    assert snr_out > snr_in + 6, (snr_in, snr_out)


def test_planned_transform_matches_full():
    """The support-cropped plan must reproduce the full transform exactly
    (it is the same math with per-scale DFTs restricted to the frequency
    boxes/supports where each Psi lives); ``plan.perm`` maps planned
    subband positions to canonical FFST order and must stay within each
    scale block (adaptive tau_min indexes scales by position)."""
    rng = np.random.default_rng(5)
    for shape in [(64, 64), (64, 32), (256, 256)]:
        z = cplx.from_complex(
            (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64))
        psi = sh.shearlet_spectra(*shape)
        plan = sh.shearlet_plan(*shape)
        perm = plan.perm
        assert sorted(perm.tolist()) == list(range(psi.shape[0]))
        # scale blocks: [lowpass, 4, 8, 16, ...] — perm must not cross them
        counts = [1] + [2 ** (j + 2) for j in range(sh.default_scales(*shape))]
        edges = np.cumsum([0] + counts)
        for a, b in zip(edges[:-1], edges[1:]):
            assert sorted(perm[a:b].tolist()) == list(range(a, b))
        full = sh.shearlet_transform(z, psi)
        full = cplx.Cplx(np.asarray(full.re)[..., perm, :, :],
                         np.asarray(full.im)[..., perm, :, :])
        planned = sh.shearlet_transform_planned(z, plan)
        np.testing.assert_allclose(np.asarray(planned.re), np.asarray(full.re),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(planned.im), np.asarray(full.im),
                                   atol=1e-4)
        # inverse path: threshold-like modification, then both inverses agree
        mod = cplx.Cplx(planned.re * 0.7, planned.im * 0.7)
        inv_full = sh.inverse_shearlet_transform(
            cplx.Cplx(np.asarray(mod.re)[..., np.argsort(perm), :, :],
                      np.asarray(mod.im)[..., np.argsort(perm), :, :]), psi)
        inv_planned = sh.inverse_shearlet_transform_planned(mod, plan)
        np.testing.assert_allclose(np.asarray(inv_planned.re),
                                   np.asarray(inv_full.re), atol=1e-4)
        np.testing.assert_allclose(np.asarray(inv_planned.im),
                                   np.asarray(inv_full.im), atol=1e-4)


def test_planned_roundtrip_tight_frame():
    """x == inverse(forward(x)) through the planned path (Parseval frame)."""
    rng = np.random.default_rng(6)
    z = cplx.from_complex(
        (rng.normal(size=(2, 64, 64)) + 1j * rng.normal(size=(2, 64, 64))
         ).astype(np.complex64))
    plan = sh.shearlet_plan(64, 64)
    back = sh.inverse_shearlet_transform_planned(
        sh.shearlet_transform_planned(z, plan), plan)
    np.testing.assert_allclose(np.asarray(back.re), np.asarray(z.re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(back.im), np.asarray(z.im), atol=2e-5)


class TestStreamedSubbandApply:
    """pocs_subband_apply == inverse(threshold(forward(z))) exactly — the
    streamed POCS hot path (no (B,L,H,W) HBM stack) must be numerically
    interchangeable with the planned transform pair."""

    def _check(self, plan_fn, n, seed=0, tol=2e-6):
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh
        from pseudo_3d_interpolation_tpu.ops import threshold as th
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(seed)
        z = Cplx(jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)),
                 jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)))
        plan = plan_fn(n)
        c = sh.shearlet_transform_planned(z, plan)
        L = c.shape[-3]
        tau = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, L)).astype(np.float32))
        for op in ("hard", "soft", "garrote"):
            a = sh.inverse_shearlet_transform_planned(
                th.threshold_pair(c, tau[..., None, None], kind=op), plan)
            # stream_min_side=1 forces the lax.scan branch for EVERY group
            b = sh.pocs_subband_apply(z, plan, tau, op, stream_min_side=1)
            scale = float(jnp.max(jnp.abs(a.re))) or 1.0
            d = float(jnp.max(jnp.abs(a.re - b.re))
                      + jnp.max(jnp.abs(a.im - b.im)))
            assert d / scale < tol, (op, d, scale)
            # default threshold: mixed batched/streamed routing
            b2 = sh.pocs_subband_apply(z, plan, tau, op)
            d2 = float(jnp.max(jnp.abs(a.re - b2.re))
                       + jnp.max(jnp.abs(a.im - b2.im)))
            assert d2 / scale < tol, (op, d2, scale)

    def test_shearlet_streamed_matches_phased(self):
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh

        self._check(lambda n: sh.shearlet_plan(n, n), 64)

    def test_curvelet_streamed_matches_phased(self):
        from pseudo_3d_interpolation_tpu.ops import curvelet as cv

        self._check(lambda n: cv.curvelet_plan(n, n), 96, seed=1)

    def test_solver_uses_streamed_update_same_result(self):
        """pocs_interpolate with SHEARLET: streamed branch vs forcing the
        generic forward/threshold/inverse branch gives the same solve."""
        from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
        from pseudo_3d_interpolation_tpu.models.transforms import ShearletTransform
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(2)
        n = 32
        truth = rng.normal(size=(2, n, n)).astype(np.float32)
        mask = (rng.uniform(size=(n, n)) < 0.6).astype(np.float32)
        z = Cplx(jnp.asarray(truth * mask), jnp.zeros((2, n, n), jnp.float32))
        cfg = POCSConfig(niter=8, p_min=1e-3, version="fast", eps=0.0)
        tr = ShearletTransform()

        class _Phased:
            """Delegates everything but hides apply_threshold so the solver
            takes the generic forward/threshold/inverse branch."""

            def __init__(self, inner):
                self._t = inner
                self.kind = inner.kind

            def forward(self, z):
                return self._t.forward(z)

            def inverse(self, c):
                return self._t.inverse(c)

            def decay(self, *a, **k):
                return self._t.decay(*a, **k)

            def threshold(self, c, t, op):
                return self._t.threshold(c, t, op)

        r1 = pocs_interpolate(z, mask, tr, cfg)
        r2 = pocs_interpolate(z, mask, _Phased(ShearletTransform()), cfg)
        np.testing.assert_allclose(np.asarray(r1.data.re),
                                   np.asarray(r2.data.re), atol=2e-5)


class TestPallasSubbandKernel:
    """The fused subband kernel (ops/pallas/subband.py, permuted spectral
    layout) must match the XLA streamed path exactly (interpret mode)."""

    def test_permuted_fft_roundtrip_and_gather(self):
        from pseudo_3d_interpolation_tpu.ops import dft
        from pseudo_3d_interpolation_tpu.ops.cplx import from_complex, to_complex

        rng = np.random.default_rng(0)
        for h, w in ((256, 256), (256, 100)):
            z = from_complex((rng.normal(size=(2, h, w))
                              + 1j * rng.normal(size=(2, h, w))
                              ).astype(np.complex64))
            Xp = dft.fft2_permuted(z)
            X = to_complex(dft.fft2(z))
            gathered = X[:, dft.radix_perm(h)][:, :, dft.radix_perm(w)]
            if dft.fast_split(h) and dft.fast_split(w):
                # both axes ride _fft1_fast_axis in both functions — the
                # graphs are identical up to output ordering, so the gather
                # is bit-equal
                np.testing.assert_array_equal(np.asarray(to_complex(Xp)),
                                              gathered)
            else:
                # a no-split axis runs fft2_permuted's dense arm, which uses
                # the Gauss 3-dot form (hot-path-only; fft2's dense arm keeps
                # the exact 4-dot form for the reference-parity surface) —
                # equal to a few f32 ulps per dot, not bitwise
                np.testing.assert_allclose(np.asarray(to_complex(Xp)),
                                           gathered, rtol=5e-4, atol=1e-3)
            back = to_complex(dft.ifft2_from_permuted(Xp))
            np.testing.assert_allclose(np.asarray(back),
                                       np.asarray(to_complex(z)), atol=1e-5)

    @pytest.mark.parametrize("shape", [(128, 256), (128, 128)])
    def test_kernel_natural_layout_matches_streamed(self, shape):
        """Rectangular slices (and squares without a fast split) run the
        dense natural-order kernel variant — same numerics as the XLA
        streamed path."""
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
        from pseudo_3d_interpolation_tpu.ops.pallas.subband import (
            subband_layout,
        )

        assert subband_layout(shape) == "natural"
        rng = np.random.default_rng(3)
        h, w = shape
        z = Cplx(jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32)),
                 jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32)))
        plan = sh.shearlet_plan(h, w)
        L = sh.n_subbands(sh.default_scales(h, w))
        tau = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, L)).astype(np.float32))
        a = sh.pocs_subband_apply(z, plan, tau, "hard")
        b = sh.pocs_subband_apply(z, plan, tau, "hard", use_pallas=True,
                                  pallas_interpret=True)
        scale = float(jnp.max(jnp.abs(a.re))) or 1.0
        d = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
        assert d / scale < 3e-6, d

    def test_box_groups_ride_the_fused_kernel(self, monkeypatch):
        """The support-cropped groups take box_group_update_fused (not the
        XLA spatial path) on aligned shapes — and the result still matches
        the XLA streamed apply."""
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
        from pseudo_3d_interpolation_tpu.ops.pallas import subband as sb

        calls = []
        real = sb.box_group_update_fused

        def spy(*a, **k):
            calls.append(a[0].re.shape)
            return real(*a, **k)

        monkeypatch.setattr(sb, "box_group_update_fused", spy)
        # seed 1 == test_kernel_matches_streamed's draw: no coefficient
        # magnitude sits within f32 rounding of its tau, so the hard
        # threshold can't flip between the kernel's mag² >= tau² test and
        # the XLA path's sqrt(mag²) >= tau (seed 7 hits such a flip)
        rng = np.random.default_rng(1)
        n = 256
        z = Cplx(jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)),
                 jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)))
        plan = sh.shearlet_plan(n, n)
        n_boxes = sum(1 for g in plan
                      if g.idx_h is not None
                      and not (len(g.idx_h) * 4 >= n and len(g.idx_w) * 4 >= n))
        assert n_boxes >= 2  # the 16- and 40-side groups at 256²
        L = sh.n_subbands(sh.default_scales(n, n))
        tau = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, L)).astype(np.float32))
        a = sh.pocs_subband_apply(z, plan, tau, "hard")
        b = sh.pocs_subband_apply(z, plan, tau, "hard", use_pallas=True,
                                  pallas_interpret=True)
        assert len(calls) == n_boxes, calls
        scale = float(jnp.max(jnp.abs(a.re))) or 1.0
        d = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
        assert d / scale < 3e-6, d

    @pytest.mark.parametrize("op", ["hard", "soft", "garrote"])
    def test_kernel_matches_streamed(self, op):
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(1)
        n = 256
        z = Cplx(jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)),
                 jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)))
        plan = sh.shearlet_plan(n, n)
        L = sh.n_subbands(sh.default_scales(n, n))
        tau = jnp.asarray(rng.uniform(0.1, 1.0, size=(2, L)).astype(np.float32))
        a = sh.pocs_subband_apply(z, plan, tau, op)
        b = sh.pocs_subband_apply(z, plan, tau, op, use_pallas=True,
                                  pallas_interpret=True)
        scale = float(jnp.max(jnp.abs(a.re))) or 1.0
        d = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
        assert d / scale < 3e-6, d

    def test_solver_pallas_flag_matches_xla(self):
        """pocs_interpolate(SHEARLET, use_pallas=True) == use_pallas=False."""
        import dataclasses

        from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
        from pseudo_3d_interpolation_tpu.models.transforms import ShearletTransform
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(2)
        n = 256
        truth = rng.normal(size=(1, n, n)).astype(np.float32)
        mask = (rng.uniform(size=(n, n)) < 0.6).astype(np.float32)
        z = Cplx(jnp.asarray(truth * mask), jnp.zeros((1, n, n), jnp.float32))
        cfg = POCSConfig(niter=4, p_min=1e-3, version="fast", eps=0.0)
        tr = ShearletTransform()
        r1 = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
        r2 = pocs_interpolate(z, jnp.asarray(mask), tr,
                              dataclasses.replace(cfg, use_pallas=True,
                                                  pallas_interpret=True))
        # hard-threshold flips near tau amplify f32 rounding over the
        # iterations (the two paths build different-but-equivalent Gauss
        # product graphs): agreement is elementwise-tight except for a
        # handful of boundary-flip coefficients, which stay bounded
        d = np.abs(np.asarray(r1.data.re) - np.asarray(r2.data.re))
        assert (d > 3e-4).mean() < 2e-3, f"{(d > 3e-4).mean():%} outliers"
        assert d.max() < 5e-3, f"max diff {d.max()}"
        # with a CONTINUOUS threshold the paths agree tightly everywhere
        cfg_s = dataclasses.replace(cfg, thresh_op="soft")
        s1 = pocs_interpolate(z, jnp.asarray(mask), tr, cfg_s)
        s2 = pocs_interpolate(z, jnp.asarray(mask), tr,
                              dataclasses.replace(cfg_s, use_pallas=True,
                                                  pallas_interpret=True))
        np.testing.assert_allclose(np.asarray(s1.data.re),
                                   np.asarray(s2.data.re), atol=3e-4)


def test_plan_sizes_where_finest_scale_reaches_the_corner():
    """Grids with 2*4**n_scales + 1 < min(h, w) (640/768 at default scales,
    or any reduced n_scales) previously crashed plan construction — the
    finest Meyer window is flat-topped to the grid corner, so its group
    must be full-size like curvelet_plan's finest ring (review round-3)."""
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.ops import shearlet as sh
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

    for n, ns in [(640, None), (512, 3)]:
        plan = sh.shearlet_plan(n, n, n_scales=ns)
        assert plan[-1].idx_h is None  # finest group is full-size
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 640, 640)).astype(np.float32)
    z = Cplx(jnp.asarray(x), jnp.zeros((1, 640, 640), jnp.float32))
    plan = sh.shearlet_plan(640, 640)
    r = sh.inverse_shearlet_transform_planned(
        sh.shearlet_transform_planned(z, plan), plan)
    np.testing.assert_allclose(np.asarray(r.re), x, atol=1e-4)


class TestReviewRegressions:
    def test_garotte_alias_reaches_apply_threshold_canonical(self):
        """POCSConfig(thresh_op='garotte') must hand the CANONICAL spelling
        to apply_threshold — the raw alias silently disabled the fused
        subband kernel (subband_supported checks _KERNEL_THRESH_OPS)."""
        from pseudo_3d_interpolation_tpu.models import (POCSConfig,
                                                        pocs_interpolate)
        from pseudo_3d_interpolation_tpu.models.transforms import (
            ShearletTransform)
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(5)
        n = 32
        mask = (rng.uniform(size=(n, n)) < 0.6).astype(np.float32)
        z = Cplx(jnp.asarray(rng.normal(size=(1, n, n)).astype(np.float32)),
                 jnp.zeros((1, n, n), jnp.float32))
        seen = []

        class _Spy(ShearletTransform):
            def apply_threshold(self, z, tau, op, **kw):
                seen.append(op)
                return super().apply_threshold(z, tau, op, **kw)

        cfg = POCSConfig(niter=2, thresh_op="garotte", p_min=1e-3, eps=0.0)
        r_alias = pocs_interpolate(z, mask, _Spy(), cfg)
        assert seen and all(op == "garrote" for op in seen)
        r_canon = pocs_interpolate(
            z, mask, ShearletTransform(),
            POCSConfig(niter=2, thresh_op="garrote", p_min=1e-3, eps=0.0))
        np.testing.assert_array_equal(np.asarray(r_alias.data.re),
                                      np.asarray(r_canon.data.re))

    def test_resident_budget_expansion_tracks_decay_config(self):
        """_transform_subbands returns the constant streamed budget ONLY
        when decay_from_input really streams; data-driven / non-'values'
        configs fall back to the full (B, L, H, W) forward and must budget
        L subbands."""
        from pseudo_3d_interpolation_tpu.models.pocs import POCSConfig
        from pseudo_3d_interpolation_tpu.models.transforms import (
            ShearletTransform)
        from pseudo_3d_interpolation_tpu.ops import shearlet as sh
        from pseudo_3d_interpolation_tpu.pipeline.pocs import (
            _transform_subbands)

        tr = ShearletTransform()
        streamed = POCSConfig(thresh_model="exponential")
        full = POCSConfig(thresh_model="data-driven")
        coeffs = POCSConfig(thresh_model="exponential", decay_kind="count")
        L = sh.n_subbands(sh.default_scales(256, 256))
        assert _transform_subbands(tr, (256, 256), streamed) == 8
        assert _transform_subbands(tr, (256, 256), full) == L
        assert _transform_subbands(tr, (256, 256), coeffs) == L
        # config-less callers keep the optimistic constant (legacy surface)
        assert _transform_subbands(tr, (256, 256)) == 8


def test_spatial_io_variant_quality(monkeypatch):
    """Opt-in spatial-I/O subband kernel (P3D_SPATIAL_IO=1, a documented
    negative perf result kept for A/B): mathematically equivalent to the
    spectral-I/O form — exact when no coefficient sits at the hard
    threshold boundary (tau=0), within boundary-flip noise otherwise.
    B=2 exercises the per-slice scratch re-initialization at l==0."""
    import jax

    from pseudo_3d_interpolation_tpu.ops import dft
    from pseudo_3d_interpolation_tpu.ops.pallas.subband import (
        subband_update_fused)

    n = 256  # smallest side with a fast split (the folded-constant path)
    plan = sh.shearlet_plan(n, n)
    psi_full, full_idx, _ = sh._plan_pallas_pack(plan, n, n, "permuted")
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, n, n))
         + 1j * rng.normal(size=(2, n, n))).astype(np.complex64)
    z = cplx.from_complex(x)
    prec = jax.lax.Precision.HIGHEST

    def both(tval):
        tau = jnp.full((2, len(full_idx)), tval, jnp.float32)
        zf = dft.fft2_permuted(z, precision=prec)
        acc = subband_update_fused(zf, psi_full, tau, thresh_op="hard",
                                   precision=prec, interpret=True,
                                   layout="permuted")
        ref = dft.ifft2_from_permuted(acc, precision=prec)
        got = subband_update_fused(z, psi_full, tau, thresh_op="hard",
                                   precision=prec, interpret=True,
                                   layout="permuted", spatial_io=True)
        return got, ref

    got, ref = both(0.0)  # no boundary: f32-exact equivalence, both slices
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(ref.im),
                               atol=5e-5)
    got, ref = both(0.05)  # thresholded: boundary flips only (~1e-3)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(ref.re),
                               atol=1e-2)

    # the env gate in _pocs_subband_apply_pallas routes through the same
    # variant: compare the WHOLE apply (incl. box groups) loosely
    tr_tau = jnp.full((2, sum(g.psi.shape[0] for g in plan)), 0.05,
                      jnp.float32)
    base = sh.pocs_subband_apply(z, plan, tr_tau, "hard", precision=prec,
                                 use_pallas=True, pallas_interpret=True)
    monkeypatch.setenv("P3D_SPATIAL_IO", "1")
    env_on = sh.pocs_subband_apply(z, plan, tr_tau, "hard", precision=prec,
                                   use_pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(env_on.re), np.asarray(base.re),
                               atol=1e-2)
