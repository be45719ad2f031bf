"""Fast discrete curvelet frame (FDCT wrapping geometry) for the CURVELET basis.

replaces: the reference's optional curvelops→CurveLab dependency
(cube_POCS_interpolation_3D.py:277-286, functions/POCS.py:530-607;
CurveLab is C++/FFTW-2.1.5 and flagged optional in the reference's own
README.md:101-104). Round 1 stubbed CURVELET to SHEARLET; this module makes
it a real basis: Meyer-windowed curvelet wedges with CurveLab's *wrapping*
frequency geometry —

- **dyadic concentric-square coronae** (pseudo-radius ``e = max(|ω1|,|ω2|)``,
  ring s supported on ``[c_s/2, 2·c_s]`` with ``c_s = emax·2^{s-R+1}``),
- **parabolic angle law**: ``nbangles_coarse`` wedges at the coarsest
  angular ring, doubling every *other* ring (curvelets: width ≈ length² —
  vs the shearlet frame's doubling every scale),
- CurveLab layout: isotropic lowpass, angular rings, and by default an
  isotropic *wavelet* finest ring (CurveLab ``finest=2``; set
  ``allcurvelets=True`` for wedges at the finest ring too).

Deviation from CurveLab (documented): coefficients keep full H×W spatial
resolution per wedge instead of CurveLab's wrapped/decimated parallelogram
grids — the undecimated variant of the same frame. With the pointwise
Parseval normalization (shared with ops/shearlet.py) the system is an
*exactly tight* frame, so POCS threshold-and-reinsert behaves identically;
only per-coefficient storage differs, which the support-cropped plan
(`build_plan`) keeps affordable on TPU: all but the finest ring's DFTs run
on cropped matmuls.

TPU shape: Psi is a host-precomputed ``(L, H, W)`` f32 constant; forward/
inverse reuse the shearlet planned transforms (one fft2 + per-group cropped
spectral multiplies; all matmul-DFT, batched); subbands live on axis -3.

Subband ordering: index 0 = lowpass, then per angular ring (coarse->fine)
its wedges (horizontal double-cone interior, vertical interior, then the
two diagonal seam wedges), then the finest isotropic ring (when
``allcurvelets=False``).
"""

from __future__ import annotations

import functools

import numpy as np

from .shearlet import (
    _meyer_aux,
    _psi2_hat,
    build_plan,
    symmetrize_and_tighten,
)


def _ring_window(rho, flat_top: bool = False):
    """Meyer corona in the pseudo-radius: support [1/2, 2], peak at 1.

    ``flat_top=True`` extends the window flat (==1) beyond the peak so the
    finest ring covers the grid corner up to Nyquist (same device as the
    shearlet finest scale, shearlet.py:112-118).
    """
    rho = np.abs(rho)
    out = np.zeros_like(rho)
    m1 = (rho >= 0.5) & (rho <= 1.0)
    out[m1] = np.sin(np.pi / 2.0 * _meyer_aux(2.0 * rho[m1] - 1.0))
    if flat_top:
        out[rho > 1.0] = 1.0
    else:
        m2 = (rho > 1.0) & (rho <= 2.0)
        out[m2] = np.cos(np.pi / 2.0 * _meyer_aux(rho[m2] - 1.0))
    return out


def _lowpass_window(rho):
    """Isotropic lowpass: 1 for rho<=1/2, Meyer rolloff to 0 at rho=1."""
    rho = np.abs(rho)
    out = np.zeros_like(rho)
    out[rho <= 0.5] = 1.0
    m = (rho > 0.5) & (rho <= 1.0)
    out[m] = np.cos(np.pi / 2.0 * _meyer_aux(2.0 * rho[m] - 1.0))
    return out


def default_nbscales(h: int, w: int) -> int:
    """CurveLab default scale count: ceil(log2(min(shape)) - 3), >= 2."""
    return max(int(np.ceil(np.log2(min(h, w)) - 3)), 2)


def ring_angles(nbscales: int, nbangles_coarse: int = 16,
                allcurvelets: bool = False) -> list:
    """Wedge count (over the full circle) per ring; 0 = isotropic ring.

    ``nbscales`` counts the lowpass plus ``R = nbscales-1`` coronae.
    Angular rings double their wedge count every other ring (parabolic
    scaling); the finest ring is isotropic unless ``allcurvelets``.
    """
    if nbangles_coarse % 4:
        raise ValueError("nbangles_coarse must be a multiple of 4")
    r = nbscales - 1
    n_ang = r if allcurvelets else r - 1
    out = [nbangles_coarse * 2 ** (s // 2) for s in range(n_ang)]
    if not allcurvelets:
        out.append(0)
    return out


def n_subbands(nbscales: int, nbangles_coarse: int = 16,
               allcurvelets: bool = False) -> int:
    """1 lowpass + n/2 symmetrized wedge pairs per angular ring (+ finest)."""
    return 1 + sum(max(n // 2, 1)
                   for n in ring_angles(nbscales, nbangles_coarse, allcurvelets))


@functools.lru_cache(maxsize=8)
def curvelet_spectra(h: int, w: int, nbscales: int | None = None,
                     nbangles_coarse: int = 16,
                     allcurvelets: bool = False) -> np.ndarray:
    """Precompute the (L, H, W) curvelet spectra (numpy f32, fft layout).

    The stack is normalized pointwise so Σ_l Psi_l² == 1 exactly (tight
    frame). Spectra are real, symmetric under ω -> −ω (wedge pairs at θ and
    θ+π merge — CurveLab's real-transform behavior), and centered on the
    unshifted numpy fft grid.
    """
    if nbscales is None:
        nbscales = default_nbscales(h, w)
    if nbscales < 2:
        raise ValueError("nbscales must be >= 2")
    w1 = np.fft.ifftshift(np.arange(-(h // 2), (h + 1) // 2))[:, None].astype(np.float64)
    w2 = np.fft.ifftshift(np.arange(-(w // 2), (w + 1) // 2))[None, :].astype(np.float64)
    W1 = np.broadcast_to(w1, (h, w))
    W2 = np.broadcast_to(w2, (h, w))
    e = np.maximum(np.abs(W1), np.abs(W2))  # concentric-square pseudo-radius
    emax = float(e.max())

    with np.errstate(divide="ignore", invalid="ignore"):
        t_h = np.where(W1 != 0, W2 / W1, 0.0)  # horizontal double-cone |t|<=1
        t_v = np.where(W2 != 0, W1 / W2, 0.0)  # vertical double-cone
    cone_h = np.abs(W2) <= np.abs(W1)
    cone_v = ~cone_h

    r = nbscales - 1                      # number of coronae
    c = [emax * 2.0 ** (s - r + 1) for s in range(r)]
    angles = ring_angles(nbscales, nbangles_coarse, allcurvelets)

    psis = [_lowpass_window(e / c[0])]

    def _wedges(radial, n_circle):
        """All symmetrized wedges of one ring: n_circle/2 subbands.

        Wedge centers sit ON the frequency axes and diagonals (the FFST
        layout, shearlet.py:122-136) rather than CurveLab's boundary-on-axis
        split, so axis-aligned events — flat seismic reflectors in f-k —
        concentrate in a single wedge. Per double-cone: n-1 interior wedges
        (support fully inside the cone) plus the two diagonal seam wedges
        glued across the cone boundary (ψ2 is even and the continuation of
        t past the seam is 2−t_other, so one formula covers both sides).
        """
        n = n_circle // 4
        delta = 2.0 / n
        out = []
        for t_own, own in ((t_h, cone_h), (t_v, cone_v)):
            for i in range(1, n):
                ti = -1.0 + delta * i
                out.append(np.where(own, radial * _psi2_hat((t_own - ti) / delta), 0.0))
        for sgn in (1.0, -1.0):
            out.append(np.where(cone_h,
                                radial * _psi2_hat((t_h - sgn) / delta),
                                radial * _psi2_hat((t_v - sgn) / delta)))
        return out

    for s in range(r):
        flat = s == r - 1
        radial = _ring_window(e / c[s], flat_top=flat)
        if angles[s] == 0:
            psis.append(radial)           # isotropic (wavelet) ring
        else:
            psis.extend(_wedges(radial, angles[s]))

    psi = np.stack(psis).astype(np.float64)
    expect = n_subbands(nbscales, nbangles_coarse, allcurvelets)
    assert psi.shape[0] == expect, (psi.shape, expect)
    return symmetrize_and_tighten(psi, f"curvelet ({h},{w}) {nbscales} scales")


@functools.lru_cache(maxsize=8)
def curvelet_plan(h: int, w: int, nbscales: int | None = None,
                  nbangles_coarse: int = 16, allcurvelets: bool = False,
                  split_threshold: int | None = None):
    """Support-cropped plan: ring-s spectra vanish outside |ω| <= 2·c_s.

    Consumed by ops.shearlet.shearlet_transform_planned /
    inverse_shearlet_transform_planned (the plan format is shared).
    ``split_threshold`` can re-group large rings into per-wedge
    exact-support groups (see ops.shearlet.build_plan) — off by default:
    measured slower on TPU despite the flop cut (docs/perf.md).
    """
    if nbscales is None:
        nbscales = default_nbscales(h, w)
    psi = curvelet_spectra(h, w, nbscales, nbangles_coarse, allcurvelets)
    r = nbscales - 1
    emax = max(h, w) / 2.0
    angles = ring_angles(nbscales, nbangles_coarse, allcurvelets)
    subbands = [max(n // 2, 1) for n in angles]
    # lowpass shares ring 0's box (its support |e|<=c_0 is inside 2·c_0)
    counts = [1 + subbands[0]] + subbands[1:]
    bounds = [int(np.ceil(2.0 * emax * 2.0 ** (s - r + 1))) for s in range(r)]
    bounds[-1] = None  # finest ring is flat-topped to the corner: full grid
    return build_plan(psi, counts, bounds, split_threshold)


# ---------------------------------------------------------------------------
# Decimated (wrapped) coefficient representation (round 5, VERDICT r4 #7)
#
# CurveLab stores each wedge's coefficients on a wrapped parallelogram grid
# ~the size of the wedge's frequency support (fdct_wrapping); the default
# transform here keeps full H×W resolution per wedge (exactly tight,
# documented deviation — module docstring). This section provides the
# memory-parity variant: each band's coefficients live on its own wrapped
# grid — the band's (padded) frequency-support index boxes become a small
# grid, and the coefficient field is the plain ifft2 ON that grid (this IS
# the "wrapping": frequencies map onto the small grid modulo its size).
#
#   forward:  c_l = ifft2_{sr×sc}( X[rows_l × cols_l] · ψ_l )
#   inverse:  X  += scatter_{rows_l × cols_l}( fft2_{sr×sc}(c_l) · ψ_l )
#
# Perfect reconstruction is EXACT for any index sets (fft∘ifft is the
# identity on the small grid and Σ_l ψ_l² = 1 by symmetrize_and_tighten);
# Parseval holds per band up to the grid-size scale (‖c_l‖² =
# ‖X·ψ_l‖²/(sr·sc)), so threshold-and-reinsert POCS behaves like the
# undecimated frame with per-band thresholds derived from the SAME decay
# law (the decay normalizes by each band's own coefficient maximum).
# Box-group bands reuse the plan's padded box indices; full-resolution
# groups (the isotropic finest ring, the zero-padded-to-full rings) crop
# each band to its exact nonzero row/col support, padded to a multiple of
# 8 with ψ-zero frequencies (values unchanged, TPU-aligned shapes).
# ---------------------------------------------------------------------------


def _pad_index_set(idx: np.ndarray, n: int, mult: int = 8) -> np.ndarray:
    """Extend a frequency index set to a multiple of ``mult`` with indices
    OUTSIDE the set (ψ is zero there, so coefficients are unchanged)."""
    idx = np.asarray(idx, np.int64)
    need = (-len(idx)) % mult
    if need == 0:
        return idx
    free = np.setdiff1d(np.arange(n, dtype=np.int64), idx,
                        assume_unique=False)
    return np.concatenate([idx, free[:need]])


@functools.lru_cache(maxsize=8)
def decimated_layout(h: int, w: int, nbscales: int | None = None,
                     nbangles_coarse: int = 16, allcurvelets: bool = False):
    """Per-band wrapped grids for the plan: list (plan band order) of
    ``(rows, cols, psi_np)`` with ``psi_np`` the (len(rows), len(cols))
    window crop; ``rows``/``cols`` None for bands kept at full resolution
    (support covering ~the whole grid — the flat-topped finest ring)."""
    plan = curvelet_plan(h, w, nbscales, nbangles_coarse, allcurvelets)
    layout = []
    for g in plan:
        lg = g.psi.shape[0]
        if g.idx_h is not None:
            for l in range(lg):
                layout.append((np.asarray(g.idx_h, np.int64),
                               np.asarray(g.idx_w, np.int64),
                               np.asarray(g.psi[l], np.float32)))
            continue
        for l in range(lg):
            nz = np.abs(g.psi[l]) > 0
            rows = np.nonzero(nz.any(axis=1))[0]
            cols = np.nonzero(nz.any(axis=0))[0]
            rows = _pad_index_set(rows, h)
            cols = _pad_index_set(cols, w)
            if len(rows) * len(cols) * 2 >= h * w:
                layout.append((None, None, np.asarray(g.psi[l], np.float32)))
            else:
                layout.append((rows, cols,
                               np.asarray(g.psi[l][np.ix_(rows, cols)],
                                          np.float32)))
    return layout


def decimated_coeff_elements(h: int, w: int, nbscales: int | None = None,
                             nbangles_coarse: int = 16,
                             allcurvelets: bool = False) -> tuple[int, int]:
    """(decimated, undecimated) coefficient element counts per slice."""
    lay = decimated_layout(h, w, nbscales, nbangles_coarse, allcurvelets)
    dec = sum((len(r) * len(c)) if r is not None else h * w
              for r, c, _ in lay)
    return dec, len(lay) * h * w


def decimated_forward(z, layout, precision):
    """Wrapped-coefficient forward: ``z`` (..., H, W) pair -> list of
    per-band (..., sr_l, sc_l) pairs in plan band order."""
    import jax.numpy as jnp

    from . import dft

    zf = dft.fft2(z, precision=precision)
    outs = []
    for rows, cols, psi in layout:
        p = jnp.asarray(psi)
        if rows is None:
            sub_re, sub_im = zf.re, zf.im
        else:
            sub_re = zf.re[..., rows[:, None], cols[None, :]]
            sub_im = zf.im[..., rows[:, None], cols[None, :]]
        prod = type(zf)(sub_re * p, sub_im * p)
        outs.append(dft.ifft2(prod, precision=precision))
    return outs


def decimated_inverse(coeffs, layout, h: int, w: int, precision):
    """Inverse of :func:`decimated_forward` -> (..., H, W) pair."""
    import jax.numpy as jnp

    from . import dft
    from .cplx import Cplx

    batch = coeffs[0].re.shape[:-2]
    acc_re = jnp.zeros(batch + (h, w), coeffs[0].re.dtype)
    acc_im = jnp.zeros(batch + (h, w), coeffs[0].re.dtype)
    for c, (rows, cols, psi) in zip(coeffs, layout):
        p = jnp.asarray(psi)
        v = dft.fft2(c, precision=precision)
        vr, vi = v.re * p, v.im * p
        if rows is None:
            acc_re = acc_re + vr
            acc_im = acc_im + vi
        else:
            acc_re = acc_re.at[..., rows[:, None], cols[None, :]].add(vr)
            acc_im = acc_im.at[..., rows[:, None], cols[None, :]].add(vi)
    return dft.ifft2(Cplx(acc_re, acc_im), precision=precision)
