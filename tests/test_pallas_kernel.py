"""Fused POCS-iteration Pallas kernel vs the plain-ops reference
(interpret mode on CPU; the compiled path runs on real TPU)."""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import cplx, dft, threshold as th
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.ops.pallas import pocs_iteration_fused, pallas_supported


def reference_iteration(x, obs, mask, tau, alpha, op):
    X = dft.fft2(x)
    X = th.threshold_pair(X, tau[:, None, None], kind=op)
    rec = dft.ifft2(X)
    keep = 1.0 - alpha * mask
    return cplx.Cplx(rec.re * keep + alpha * obs.re, rec.im * keep + alpha * obs.im)


@pytest.mark.parametrize("op", ["hard", "soft", "garrote"])
def test_fused_iteration_matches_reference(op):
    rng = np.random.default_rng(110)
    b, n = 3, 128
    x = cplx.Cplx(
        np.asarray(rng.normal(size=(b, n, n)), np.float32),
        np.asarray(rng.normal(size=(b, n, n)), np.float32),
    )
    obs = cplx.Cplx(x.re * 0.5, x.im * 0.5)
    mask = (rng.uniform(size=(n, n)) < 0.5).astype(np.float32)
    X0 = dft.fft2(x)
    tau = 0.3 * np.asarray(X0.abs().max(axis=(-2, -1)))

    got = pocs_iteration_fused(x, obs, mask, tau, alpha=0.75, thresh_op=op,
                               interpret=True)
    expected = reference_iteration(x, obs, mask, np.asarray(tau), 0.75, op)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(expected.re),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(expected.im),
                               rtol=5e-3, atol=5e-3)


def test_supported_shapes():
    # interpret=True: the CPU suite has no Mosaic lowering; shape rules only
    assert pallas_supported((4, 128, 128), interpret=True)
    assert pallas_supported((512, 512), interpret=True)
    assert pallas_supported((4, 128, 256), interpret=True)  # rectangular since round 3
    assert not pallas_supported((100, 100), interpret=True)
    assert not pallas_supported((4, 128, 200), interpret=True)
    # backend gate: an eligible shape is NOT supported for compiled (non-
    # interpret) execution on this CPU backend — it must fall back to XLA
    # instead of crashing in Mosaic lowering (ADVICE r4)
    assert not pallas_supported((4, 128, 128), interpret=False)


@pytest.mark.parametrize("basis", ["FFT", "DCT"])
@pytest.mark.parametrize("version", ["regular", "fast"])
def test_fused_rectangular_matches_xla_scan(basis, version):
    """Rectangular (H != W) slices run the dense per-axis-matrix kernel
    path; numerics must match the XLA scan (both the folded solve and,
    via eps > 0, the per-iteration kernel)."""
    import dataclasses

    from pseudo_3d_interpolation_tpu.models.transforms import DCTTransform

    rng = np.random.default_rng(7)
    h, w, b, niter = 128, 256, 2, 6
    yy, xx = np.mgrid[0:h, 0:w]
    truth = np.zeros((b, h, w), np.complex64)
    for i in range(b):
        for (fy, fx) in ((2, 3), (5, 1)):
            truth[i] += np.exp(2j * np.pi * (fy * yy / h + fx * xx / w))
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=w) < 0.5).astype(np.float32)[None, :], (h, w)))
    z = from_complex(truth * mask)
    tr = DCTTransform() if basis == "DCT" else FFTTransform()
    eps = 1e-12 if (basis == "FFT" and version == "regular") else 0.0
    cfg = POCSConfig(niter=niter, thresh_op="hard",
                     thresh_model="exponential", p_min=1e-3,
                     version=version, alpha=0.75, eps=eps,
                     transform_kind=basis)
    ref = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
    out = pocs_interpolate(z, jnp.asarray(mask), tr,
                           dataclasses.replace(cfg, use_pallas=True,
                                               pallas_interpret=True))
    np.testing.assert_allclose(np.asarray(out.data.re),
                               np.asarray(ref.data.re), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.data.im),
                               np.asarray(ref.data.im), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                               rtol=1e-4, atol=1e-10)


def test_full_solver_with_pallas_path():
    """End-to-end solve with use_pallas (interpret) == XLA path."""
    from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate_numpy

    rng = np.random.default_rng(111)
    y, xg = np.mgrid[0:128, 0:128]
    truth = sum(np.exp(2j * np.pi * ((k + 2) * y / 128 + (k + 1) * xg / 128))
                for k in range(4)).astype(np.complex64)[None]
    mask = (rng.uniform(size=(128, 128)) < 0.5).astype(np.float32)
    obs = truth * mask
    base = POCSConfig(niter=10, p_min=1e-3, version="fast", alpha=0.75)
    rec_x, n_x, c_x = pocs_interpolate_numpy(obs, mask, base)
    import dataclasses

    cfgp = dataclasses.replace(base, use_pallas=True, pallas_interpret=True)
    rec_p, n_p, c_p = pocs_interpolate_numpy(obs, mask, cfgp)
    assert n_p == n_x
    np.testing.assert_allclose(rec_p, rec_x, rtol=5e-3, atol=5e-3)


def test_fused_full_solve_matches_xla_scan():
    """The folded multi-iteration kernel (one launch per slice) must equal
    the XLA scan bit-for-bit in interpret mode, including the final-cost
    telemetry, for both regular and fast versions."""
    import dataclasses

    rng = np.random.default_rng(0)
    n, b, niter = 128, 3, 10
    yy, xx = np.mgrid[0:n, 0:n]
    truth = np.zeros((b, n, n), np.complex64)
    for i in range(b):
        for (fy, fx) in ((2, 3), (5, 1)):
            truth[i] += np.exp(2j * np.pi * (fy * yy / n + fx * xx / n))
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    truth[2] = 0.0  # zero-slice short-circuit covered too
    obs = truth * mask
    z = from_complex(obs)
    tr = FFTTransform()
    for version, op in (("regular", "hard"), ("fast", "hard"),
                        ("fast", "garrote")):
        cfg = POCSConfig(niter=niter, thresh_op=op,
                         thresh_model="exponential", p_min=1e-3,
                         version=version, alpha=0.75, eps=0.0)
        ref = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
        fused_cfg = dataclasses.replace(cfg, use_pallas=True,
                                        pallas_interpret=True)
        out = pocs_interpolate(z, jnp.asarray(mask), tr, fused_cfg)
        np.testing.assert_allclose(np.asarray(out.data.re),
                                   np.asarray(ref.data.re), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.data.im),
                                   np.asarray(ref.data.im), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.cost),
                                   np.asarray(ref.cost), rtol=1e-4, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(out.n_iterations),
                                      np.asarray(ref.n_iterations))


def test_fused_dct_solve_matches_xla_scan():
    """The folded kernel's DCT basis (fr=C, fi=C^T; 4x fewer dots than the
    DFT path) must equal the XLA DCTTransform scan in interpret mode."""
    import dataclasses

    from pseudo_3d_interpolation_tpu.models.transforms import DCTTransform

    rng = np.random.default_rng(1)
    n, b, niter = 128, 2, 8
    yy, xx = np.mgrid[0:n, 0:n]
    truth = np.zeros((b, n, n), np.complex64)
    for i in range(b):
        truth[i] = np.exp(2j * np.pi * (3 * yy / n + (i + 1) * xx / n))
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    obs = truth * mask
    z = from_complex(obs)
    tr = DCTTransform()
    cfg = POCSConfig(niter=niter, thresh_op="hard", thresh_model="exponential",
                     p_min=1e-3, version="fast", alpha=0.75, eps=0.0)
    ref = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
    fused_cfg = dataclasses.replace(cfg, use_pallas=True, pallas_interpret=True)
    out = pocs_interpolate(z, jnp.asarray(mask), tr, fused_cfg)
    np.testing.assert_allclose(np.asarray(out.data.re), np.asarray(ref.data.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.data.im), np.asarray(ref.data.im),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cost), np.asarray(ref.cost),
                               rtol=1e-4, atol=1e-12)


def test_high_precision_runs_in_kernel(monkeypatch):
    """Mosaic has no HIGH (bf16x3) dot lowering, so the folded kernel
    implements the 3-pass decomposition by hand (_make_dot). A HIGH
    transform with use_pallas must (a) actually take the fused path — no
    silent XLA fallback — and (b) reproduce the XLA scan's HIGH solve to
    bf16x3 accuracy."""
    import dataclasses

    import jax

    from pseudo_3d_interpolation_tpu.ops import pallas as pallas_mod

    calls = []
    real = pallas_mod.pocs_solve_fused

    def _spy(*a, **k):
        calls.append(k.get("precision"))
        return real(*a, **k)

    # models/pocs.py imports the symbol from ops.pallas at call time
    monkeypatch.setattr(pallas_mod, "pocs_solve_fused", _spy)

    rng = np.random.default_rng(1)
    n, b, niter = 128, 2, 6
    yy, xx = np.mgrid[0:n, 0:n]
    truth = np.zeros((b, n, n), np.complex64)
    for i in range(b):
        truth[i] = np.exp(2j * np.pi * (3 * yy / n + (i + 1) * xx / n))
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    obs = truth * mask
    z = from_complex(obs)
    tr = FFTTransform(precision="high")
    cfg = POCSConfig(niter=niter, thresh_op="hard", thresh_model="exponential",
                     p_min=1e-3, version="fast", alpha=0.75, eps=0.0)
    ref = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
    out = pocs_interpolate(z, jnp.asarray(mask), tr,
                           dataclasses.replace(cfg, use_pallas=True,
                                               pallas_interpret=True))
    assert calls and calls[0] == jax.lax.Precision.HIGH, \
        "HIGH must engage the folded Pallas path"
    # CPU's XLA HIGH is effectively f32; bf16x3 agrees to ~1e-5 relative
    scale = np.abs(np.asarray(ref.data.re)).max()
    np.testing.assert_allclose(np.asarray(out.data.re), np.asarray(ref.data.re),
                               atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(out.data.im), np.asarray(ref.data.im),
                               atol=5e-4 * scale)


def test_dct_eps_config_stays_correct():
    """A DCT config that misses the folded path (eps > 0) must NOT be
    routed through the FFT-only per-iteration kernel — results must match
    the plain XLA DCT solve."""
    import dataclasses

    from pseudo_3d_interpolation_tpu.models.transforms import DCTTransform

    rng = np.random.default_rng(3)
    n, b = 128, 2
    obs = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
           ).astype(np.complex64)
    mask = np.ascontiguousarray((rng.uniform(size=n) < 0.5).astype(np.float32)[None, :]
                                * np.ones((n, n), np.float32))
    z = from_complex(obs)
    tr = DCTTransform()
    cfg = POCSConfig(niter=5, thresh_op="hard", p_min=1e-3, version="fast",
                     alpha=0.75, eps=1e-12)  # eps>0: folded path disabled
    ref = pocs_interpolate(z, jnp.asarray(mask), tr, cfg)
    out = pocs_interpolate(z, jnp.asarray(mask), tr,
                           dataclasses.replace(cfg, use_pallas=True,
                                               pallas_interpret=True))
    np.testing.assert_allclose(np.asarray(out.data.re), np.asarray(ref.data.re),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.data.im), np.asarray(ref.data.im),
                               atol=1e-6)


class TestInKernelRadixSplit:
    """The folded kernel's Cooley-Tukey split (N = M·R, permuted spectrum)
    must match the dense in-kernel DFT path exactly — the permutation is
    invisible because the only spectral op is the elementwise threshold."""

    def _solve(self, n, b, niter, use_split, precision=None, version="fast",
               thresh="hard", seed=0):
        from pseudo_3d_interpolation_tpu.ops.pallas.pocs_iter import (
            pocs_solve_fused,
        )

        rng = np.random.default_rng(seed)
        obs = from_complex(
            (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
             ).astype(np.complex64))
        mask = ((rng.uniform(size=n) < 0.5).astype(np.float32)[None, :]
                * np.ones((n, n), np.float32))
        decay = np.linspace(2.0, 0.05, niter)[:, None].repeat(b, 1)
        return pocs_solve_fused(obs, mask, decay.astype(np.float32),
                                version=version, thresh_op=thresh,
                                interpret=True, use_split=use_split,
                                precision=precision)

    def test_split_matches_dense_r2(self):
        r1, c1 = self._solve(256, 2, 5, use_split=False)
        r2, c2 = self._solve(256, 2, 5, use_split=True)
        scale = float(jnp.max(jnp.abs(r1.re)))
        np.testing.assert_allclose(np.asarray(r2.re), np.asarray(r1.re),
                                   atol=3e-5 * scale)
        np.testing.assert_allclose(np.asarray(r2.im), np.asarray(r1.im),
                                   atol=3e-5 * scale)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-7)

    def test_split_matches_dense_soft_regular(self):
        r1, _ = self._solve(256, 1, 4, use_split=False, version="regular",
                            thresh="soft", seed=3)
        r2, _ = self._solve(256, 1, 4, use_split=True, version="regular",
                            thresh="soft", seed=3)
        scale = float(jnp.max(jnp.abs(r1.re)))
        np.testing.assert_allclose(np.asarray(r2.re), np.asarray(r1.re),
                                   atol=3e-5 * scale)

    def test_split_engages_only_when_divisible(self):
        from pseudo_3d_interpolation_tpu.ops import dft

        assert dft.fast_split(512) == (128, 4)
        assert dft.fast_split(256) == (128, 2)
        assert dft.fast_split(128) is None  # dense path at the minimum size


class TestFusedWavelet:
    """Matmul-form Mallat cascade in the folded kernel (basis='wavelet')
    vs the XLA conv-cascade WAVELET path — identical solver numerics."""

    @staticmethod
    def _pair(cfg_extra, n=128, b=3, name="db4", seed=7, **cfg_kw):
        import jax.numpy as jnp

        from pseudo_3d_interpolation_tpu.models.transforms import (
            WaveletTransform,
        )
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(seed)
        x = rng.standard_normal((b, n, n)).astype(np.float32)
        mask = (rng.random((n, n)) < 0.5).astype(np.float32)
        z = Cplx(jnp.asarray(x * mask), jnp.zeros((b, n, n), jnp.float32))
        tr = WaveletTransform(wavelet=name).with_shape(z.shape)
        base = dict(niter=10, eps=0.0, alpha=0.75, p_min=1e-4,
                    transform_kind="WAVELET")
        base.update(cfg_kw)
        ref = pocs_interpolate(z, jnp.asarray(mask), tr, POCSConfig(**base))
        fused = pocs_interpolate(
            z, jnp.asarray(mask), tr,
            POCSConfig(**base, use_pallas=True, pallas_interpret=True,
                       **cfg_extra))
        return ref, fused

    def test_dwt_matrix_matches_conv_analysis(self):
        import jax.numpy as jnp

        from pseudo_3d_interpolation_tpu.ops import wavelet as wv

        rng = np.random.default_rng(0)
        for name in ("db4", "coif5", "sym6"):
            m = wv.dwt_matrix(128, name)
            # periodized orthogonal wavelet -> orthogonal matrix
            np.testing.assert_allclose(m @ m.T, np.eye(128), atol=2e-5)
            x = rng.standard_normal(128).astype(np.float32)
            h, g, _, _ = wv.wavelet_filters(name)
            lo = np.asarray(wv._analysis_last(jnp.asarray(x[None]),
                                              jnp.asarray(h)))[0]
            hi = np.asarray(wv._analysis_last(jnp.asarray(x[None]),
                                              jnp.asarray(g)))[0]
            np.testing.assert_allclose(m[:64] @ x, lo, atol=1e-5)
            np.testing.assert_allclose(m[64:] @ x, hi, atol=1e-5)

    @pytest.mark.parametrize("op", ["soft", "garrote"])
    @pytest.mark.parametrize("name", ["db4", "coif5"])
    def test_fused_matches_xla_continuous_ops(self, op, name):
        ref, fused = self._pair({}, name=name, thresh_op=op,
                                version="regular")
        scale = float(np.abs(np.asarray(ref.data.re)).max())
        np.testing.assert_allclose(np.asarray(fused.data.re),
                                   np.asarray(ref.data.re),
                                   atol=5e-6 * scale)
        np.testing.assert_allclose(np.asarray(fused.cost),
                                   np.asarray(ref.cost), rtol=1e-4,
                                   atol=1e-12)
        assert np.all(np.asarray(fused.n_iterations) == 10)

    @pytest.mark.parametrize("version", ["regular", "fast"])
    def test_fused_matches_xla_hard(self, version):
        # the hard threshold's knife-edge keep/kill decisions amplify f32
        # op-reordering between the conv and matmul forms; 'fast' momentum
        # compounds a flipped coefficient, hence the looser bound
        ref, fused = self._pair({}, thresh_op="hard", version=version)
        scale = float(np.abs(np.asarray(ref.data.re)).max())
        tol = 5e-3 if version == "fast" else 5e-4
        np.testing.assert_allclose(np.asarray(fused.data.re),
                                   np.asarray(ref.data.re),
                                   atol=tol * scale)

    def test_padded_or_rectangular_falls_back(self):
        # 120 is not %128: gate must keep the XLA path (still correct)
        ref, fused = self._pair({}, n=120, thresh_op="soft",
                                version="regular")
        np.testing.assert_allclose(np.asarray(fused.data.re),
                                   np.asarray(ref.data.re), atol=1e-6)

    def test_cascade_alignment_gate(self):
        # every in-kernel lane split is (n >> (level-1)) << k, so the gate
        # lives entirely in the deepest block: 640^2 level-3 gives 160 —
        # pallas_supported-shaped (640 % 128 == 0) and >= 128, yet NOT a
        # 128-multiple, so a fused launch would fail Mosaic lowering on TPU
        from pseudo_3d_interpolation_tpu.models.pocs import (
            _wavelet_cascade_aligned,
        )

        assert _wavelet_cascade_aligned(512, 3, interpret=False)   # 128
        assert _wavelet_cascade_aligned(512, 2, interpret=False)   # 256
        assert not _wavelet_cascade_aligned(640, 3, interpret=False)  # 160
        assert not _wavelet_cascade_aligned(512, 4, interpret=False)  # 64
        assert not _wavelet_cascade_aligned(128, 8, interpret=False)  # 0
        # interpret mode lifts the floor to the 8-sublane granule
        assert _wavelet_cascade_aligned(640, 3, interpret=True)
        assert _wavelet_cascade_aligned(128, 3, interpret=True)
        assert not _wavelet_cascade_aligned(20, 2, interpret=True)  # 10


class TestGaussComplexProducts:
    """The Gauss 3-dot complex products (default) must agree with the
    exact 4-dot form (P3D_NO_GAUSS=1) to a few f32 ulps per dot — the
    imaginary-part cancellation (t3 - t1 - t2) is the only new rounding
    source. Both forms run everywhere the equality tests above run; these
    pin the forms against EACH OTHER so a regression in either is named."""

    def _solve(self, monkeypatch, gauss, *, n=256, b=2, niter=5,
               use_split=True, thresh="soft", seed=7):
        from pseudo_3d_interpolation_tpu.ops.pallas.pocs_iter import (
            pocs_solve_fused,
        )

        if gauss:
            monkeypatch.delenv("P3D_NO_GAUSS", raising=False)
        else:
            monkeypatch.setenv("P3D_NO_GAUSS", "1")
        rng = np.random.default_rng(seed)
        obs = from_complex(
            (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
             ).astype(np.complex64))
        mask = ((rng.uniform(size=n) < 0.5).astype(np.float32)[None, :]
                * np.ones((n, n), np.float32))
        decay = np.linspace(2.0, 0.05, niter)[:, None].repeat(b, 1)
        return pocs_solve_fused(obs, mask, decay.astype(np.float32),
                                version="fast", thresh_op=thresh,
                                interpret=True, use_split=use_split)

    @pytest.mark.parametrize("use_split", [True, False])
    def test_solve_gauss_matches_4dot(self, monkeypatch, use_split):
        r1, c1 = self._solve(monkeypatch, gauss=False, use_split=use_split)
        r2, c2 = self._solve(monkeypatch, gauss=True, use_split=use_split)
        scale = float(jnp.max(jnp.abs(r1.re)))
        np.testing.assert_allclose(np.asarray(r2.re), np.asarray(r1.re),
                                   atol=5e-5 * scale)
        np.testing.assert_allclose(np.asarray(r2.im), np.asarray(r1.im),
                                   atol=5e-5 * scale)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                                   atol=1e-6)

    def test_subband_kernel_gauss_matches_4dot(self, monkeypatch):
        from pseudo_3d_interpolation_tpu.ops import dft as dft_mod
        from pseudo_3d_interpolation_tpu.ops.pallas.subband import (
            subband_update_fused,
        )

        rng = np.random.default_rng(11)
        b, n, L = 2, 256, 3
        z = from_complex(
            (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
             ).astype(np.complex64))
        zf = dft_mod.fft2_permuted(z)
        psi = np.asarray(rng.uniform(0.0, 1.0, size=(L, n, n)), np.float32)
        perm = dft_mod.radix_perm(n)
        psi = psi[:, perm][:, :, perm]
        tau = np.asarray(rng.uniform(0.05, 0.2, size=(b, L)), np.float32)

        monkeypatch.setenv("P3D_NO_GAUSS", "1")
        a1 = subband_update_fused(zf, psi, tau, thresh_op="soft",
                                  interpret=True)
        monkeypatch.delenv("P3D_NO_GAUSS")
        a2 = subband_update_fused(zf, psi, tau, thresh_op="soft",
                                  interpret=True)
        scale = float(jnp.max(jnp.abs(a1.re)))
        np.testing.assert_allclose(np.asarray(a2.re), np.asarray(a1.re),
                                   atol=5e-5 * scale)
        np.testing.assert_allclose(np.asarray(a2.im), np.asarray(a1.im),
                                   atol=5e-5 * scale)

    def test_box_kernel_gauss_matches_4dot(self, monkeypatch):
        from pseudo_3d_interpolation_tpu.ops import dft as dft_mod
        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
        from pseudo_3d_interpolation_tpu.ops.pallas.subband import (
            box_group_update_fused,
        )

        rng = np.random.default_rng(13)
        b, sr, sc, lg, nh, nw = 2, 16, 16, 3, 128, 128
        xb = Cplx(np.asarray(rng.normal(size=(b, sr, sc)), np.float32),
                  np.asarray(rng.normal(size=(b, sr, sc)), np.float32))
        psi = np.asarray(rng.uniform(0.0, 1.0, size=(lg, sr, sc)), np.float32)
        tau = np.asarray(rng.uniform(0.05, 0.2, size=(b, lg)), np.float32)
        fr_h, fi_h = dft_mod.dft_matrices(nh)
        idx_h = np.arange(sr)
        idx_w = np.arange(sc)
        ahr = np.ascontiguousarray(fr_h[idx_h])
        ahi = np.ascontiguousarray(fi_h[idx_h])
        awr = np.ascontiguousarray(fr_h[idx_w])
        awi = np.ascontiguousarray(fi_h[idx_w])
        # _box_kernel's operand convention: (ah, aht, aw, awt) pairs
        mats = (ahr, ahi, ahr.T.copy(), ahi.T.copy(),
                awr, awi, awr.T.copy(), awi.T.copy())

        monkeypatch.setenv("P3D_NO_GAUSS", "1")
        m1 = box_group_update_fused(xb, psi, tau, mats, nh, nw,
                                    thresh_op="soft", interpret=True)
        monkeypatch.delenv("P3D_NO_GAUSS")
        m2 = box_group_update_fused(xb, psi, tau, mats, nh, nw,
                                    thresh_op="soft", interpret=True)
        scale = float(jnp.max(jnp.abs(m1.re)))
        np.testing.assert_allclose(np.asarray(m2.re), np.asarray(m1.re),
                                   atol=5e-5 * scale)
        np.testing.assert_allclose(np.asarray(m2.im), np.asarray(m1.im),
                                   atol=5e-5 * scale)
