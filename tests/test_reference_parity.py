"""Permanent reference-parity gate: run the ACTUAL reference implementation.

Imports ``/root/reference/pseudo_3D_interpolation/functions/POCS.py`` (the
upstream code itself, not the repo's numpy mirror) and asserts numerical
agreement of the repo solver with it, cell by cell, across the verdict grid
{hard, soft, garrote} x {linear, exponential, data-driven,
inverse_proportional} x {p_min 1e-5, 'adaptive'} on FFT and DCT.

Cells are split into two classes:

**Tight parity (<= 1e-5 relative)** — wherever the reference's threshold
math is well-defined:
  - real input data (FFT + DCT), every threshold op, linear/exponential;
  - complex input data, hard threshold (robust to the reference's complex
    tau: ``np.less(|X|, tau)`` compares against Re(tau) only).

**Documented deviations (explicit carve-outs)** — where the reference's
un-absed ``x_fwd.max()/.min()/.sort()`` on complex or signed coefficients
produces complex or negative thresholds (numpy lexicographic ordering) and
the repo deliberately uses magnitudes (ops/decay.py module docstring;
reference functions/POCS.py:277-333, 356-362):
  - soft/garrote on complex data: the reference's complex tau enters
    ``1 - tau/|X|`` and phase-rotates every retained coefficient
    (~1e-4 relative); asserted bounded and asserted root cause.
  - data-driven decay: the reference sorts raw (complex/signed) values
    lexicographically; the repo sorts magnitudes. Outputs differ; the gate
    asserts the repo's reconstruction quality is never worse.
  - inverse_proportional: the reference's tau_min is the raw minimum
    (negative/complex); both schedules end at "keep ~everything" so outputs
    agree loosely (<= 5e-3) but not tightly.
  - version='fast': the reference re-aliases x_old = x_inv every iteration
    (POCS.py:629), making its momentum term identically zero. The gate
    PROVES that (ref fast == ref regular bit-identical) and asserts the
    repo's true Nesterov FPOCS converges at least as well.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

# override with P3D_REFERENCE_ROOT when the upstream checkout lives
# elsewhere; the gate skips (visibly, with the path in the reason) when the
# directory is absent
REF_ROOT = os.environ.get("P3D_REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "pseudo_3D_interpolation")),
    reason=f"reference checkout not available at {REF_ROOT} "
           "(set P3D_REFERENCE_ROOT)",
)


@pytest.fixture(scope="module")
def ref_pocs():
    sys.path.insert(0, REF_ROOT)
    try:
        import pseudo_3D_interpolation.functions.POCS as ref
    finally:
        sys.path.remove(REF_ROOT)
    return ref


# --- shared synthetic slice (seeded; DC-dominated like a real f-x-y slice) ---
_H = _W = 64
_NITER = 12


def _data():
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, _H)[:, None]
    s = np.linspace(0, 1, _W)[None, :]
    x = (1.5 + np.sin(2 * np.pi * (3 * t + 2 * s))
         + 0.5 * np.cos(2 * np.pi * (7 * t - 3 * s)))
    x = x + 0.05 * rng.standard_normal((_H, _W))
    mask = (rng.random((_H, _W)) < 0.6).astype(np.float64)
    im = 0.3 * rng.standard_normal((_H, _W))
    return x, x + 1j * im, mask


X_REAL, X_CPLX, MASK = _data()


def _run_ref(ref, x, kind, op, model, p_min, version="regular", niter=_NITER,
             alpha=1.0):
    if kind == "FFT":
        fwd, inv = np.fft.fft2, np.fft.ifft2
    else:
        from scipy.fft import dctn, idctn

        fwd = lambda a: dctn(a, norm="ortho")  # noqa: E731
        inv = lambda a: idctn(a, norm="ortho")  # noqa: E731
    return ref.POCS_algorithm(
        x * MASK, MASK, transform=fwd, itransform=inv, transform_kind=kind,
        niter=niter, thresh_op=op, thresh_model=model, eps=0.0, alpha=alpha,
        p_max=0.99, p_min=p_min, version=version)


def _run_repo(x, kind, op, model, p_min, version="regular", niter=_NITER,
              alpha=1.0):
    from pseudo_3d_interpolation_tpu.models.pocs import (
        POCSConfig, pocs_interpolate_numpy)

    cfg = POCSConfig(niter=niter, thresh_op=op, thresh_model=model, eps=0.0,
                     alpha=alpha, p_max=0.99, p_min=p_min, version=version,
                     transform_kind=kind)
    return pocs_interpolate_numpy(x * MASK, MASK, cfg)[0]


def _rel(a, b):
    return float(np.abs(a - b).max() / np.abs(a).max())


def _snr(rec, truth):
    err = rec - truth
    return 10.0 * np.log10(
        float((np.abs(truth) ** 2).sum()) / float((np.abs(err) ** 2).sum()))


# ---------------------------------------------------------------------------
# Tight parity cells
# ---------------------------------------------------------------------------

TIGHT = (
    [("FFT", "real", op, model, p_min)
     for op in ("hard", "soft", "garrote")
     for model in ("linear", "exponential")
     for p_min in (1e-5, "adaptive")]
    + [("DCT", "real", op, model, p_min)
       for op in ("hard", "soft", "garrote")
       for model in ("linear", "exponential")
       for p_min in (1e-5, "adaptive")]
    + [("FFT", "cplx", "hard", model, p_min)
       for model in ("linear", "exponential")
       for p_min in (1e-5, "adaptive")]
)


@pytest.mark.parametrize("kind,dat,op,model,p_min", TIGHT)
def test_tight_parity(ref_pocs, kind, dat, op, model, p_min):
    x = X_REAL if dat == "real" else X_CPLX
    a = _run_ref(ref_pocs, x, kind, op, model, p_min)
    b = _run_repo(x, kind, op, model, p_min)
    assert _rel(a, b) <= 1e-5, f"{kind}/{dat}/{op}/{model}/{p_min}"


def test_adaptive_version_parity(ref_pocs):
    a = _run_ref(ref_pocs, X_CPLX, "FFT", "hard", "exponential", 1e-5,
                 version="adaptive", alpha=0.75)
    b = _run_repo(X_CPLX, "FFT", "hard", "exponential", 1e-5,
                  version="adaptive", alpha=0.75)
    assert _rel(a, b) <= 1e-5


# ---------------------------------------------------------------------------
# Carved-out deviations (each asserts the deviation AND its bound/quality)
# ---------------------------------------------------------------------------

def test_complex_tau_deviation_soft_garrote(ref_pocs):
    """Reference tau on complex data is complex (lexicographic max) and
    phase-rotates soft/garrote shrinkage; repo tau is the magnitude max.
    Deviation is real but bounded; hard-threshold cells are unaffected
    (tested tightly above)."""
    # root cause: the reference decay itself is complex-valued
    x_fwd = np.fft.fft2(X_CPLX * MASK)
    d = ref_pocs.get_threshold_decay(
        "linear", _NITER, "FFT", 0.99, 1e-5, x_fwd, "values")
    assert np.iscomplexobj(d) and np.abs(d.imag).max() > 0
    for op in ("soft", "garrote"):
        a = _run_ref(ref_pocs, X_CPLX, "FFT", op, "linear", 1e-5)
        b = _run_repo(X_CPLX, "FFT", op, "linear", 1e-5)
        rel = _rel(a, b)
        assert 1e-7 < rel < 5e-3, f"{op}: {rel}"  # deviates, boundedly


@pytest.mark.parametrize("kind,dat,op", [
    ("FFT", "real", "hard"), ("FFT", "cplx", "hard"), ("DCT", "real", "soft"),
])
def test_inverse_proportional_loose_parity(ref_pocs, kind, dat, op):
    """tau_min: reference uses the raw (signed/complex lexicographic) minimum,
    repo the magnitude minimum (~0); both schedules end at keep-everything so
    outputs agree loosely."""
    x = X_REAL if dat == "real" else X_CPLX
    a = _run_ref(ref_pocs, x, kind, op, "inverse_proportional", 1e-5)
    b = _run_repo(x, kind, op, "inverse_proportional", 1e-5)
    assert _rel(a, b) <= 5e-3, f"{kind}/{dat}/{op}"


@pytest.mark.parametrize("kind,dat", [("FFT", "real"), ("FFT", "cplx"),
                                      ("DCT", "real")])
def test_data_driven_quality_not_worse(ref_pocs, kind, dat):
    """data-driven decay: reference samples the lexicographically sorted raw
    coefficient curve, repo the magnitude-sorted curve. Outputs differ by
    design; the repo's reconstruction must be at least as good."""
    x = X_REAL if dat == "real" else X_CPLX
    a = _run_ref(ref_pocs, x, kind, "hard", "data-driven", 1e-5, niter=30)
    b = _run_repo(x, kind, "hard", "data-driven", 1e-5, niter=30)
    snr_ref, snr_repo = _snr(a, x), _snr(b, x)
    assert snr_repo >= snr_ref - 0.1, (snr_ref, snr_repo)


def test_fast_reference_momentum_is_inert(ref_pocs):
    """The reference's FPOCS re-aliases x_old = x_inv at the end of every
    iteration (POCS.py:629), so its momentum term is identically zero:
    reference 'fast' output is BIT-IDENTICAL to reference 'regular'."""
    a_reg = _run_ref(ref_pocs, X_CPLX, "FFT", "hard", "exponential", 1e-5,
                     version="regular")
    a_fast = _run_ref(ref_pocs, X_CPLX, "FFT", "hard", "exponential", 1e-5,
                      version="fast")
    assert np.array_equal(a_reg, a_fast)


def test_fast_repo_momentum_is_real_and_converges(ref_pocs):
    """The repo's 'fast' is true Nesterov extrapolation WITH adaptive
    restart (O'Donoghue & Candès 2015) — documented deviation,
    models/pocs.py. The gate pins both halves of the claim on a clean
    convergent config: (a) strictly faster early convergence than the
    reference's (inert-momentum) fast, (b) no quality loss at the
    converged tail (plain Nesterov without restart plateaus ~6 dB low)."""
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, _H)[:, None]
    s = np.linspace(0, 1, _W)[None, :]
    clean = (np.sin(2 * np.pi * (4 * t + 2 * s))
             + 0.5 * np.cos(2 * np.pi * (2 * t - 5 * s)))
    mask = (rng.random((_H, _W)) < 0.6).astype(np.float64)
    obs = clean * mask

    from pseudo_3d_interpolation_tpu.models.pocs import (
        POCSConfig, pocs_interpolate_numpy)

    def ref_fast(niter):
        return ref_pocs.POCS_algorithm(
            obs, mask, transform=np.fft.fft2, itransform=np.fft.ifft2,
            transform_kind="FFT", niter=niter, thresh_op="hard",
            thresh_model="exponential", eps=0.0, alpha=1.0, p_max=0.99,
            p_min=1e-5, version="fast")

    def repo(niter, version):
        cfg = POCSConfig(niter=niter, thresh_op="hard",
                         thresh_model="exponential", eps=0.0, alpha=1.0,
                         p_max=0.99, p_min=1e-5, version=version,
                         transform_kind="FFT")
        return pocs_interpolate_numpy(obs, mask, cfg)[0]

    # repo fast genuinely accelerates (differs from repo regular)
    assert _rel(repo(40, "regular"), repo(40, "fast")) > 1e-6
    # (a) early acceleration: clearly ahead of the reference at 5 iters
    assert _snr(repo(5, "fast"), clean) >= _snr(ref_fast(5), clean) + 2.0
    # (b) converged tail: at least the reference's quality at 40 iters
    assert _snr(repo(40, "fast"), clean) >= _snr(ref_fast(40), clean) - 0.1
