"""Finite discrete shearlet transform (FFST-style) for the SHEARLET basis.

replaces: the PyShearlets (FFST) dependency of the reference
(cube_POCS_interpolation_3D.py:269-274, functions/POCS.py:526-611): Meyer-
windowed cone-adapted shearlets with precomputed Fourier spectra ``Psi``.
The construction follows Häuser & Steidl's FFST scheme (scaling function +
``ψ1(4^{-j}ω_axis)·ψ2(2^j tan θ + k)`` cone windows with seam subbands
glued across the cones), then **pointwise-normalizes the subband stack into
an exactly tight (Parseval) frame**, so

    x == Σ_l ifft2( fft2(x) · Psi_l · Psi_l )

holds to machine precision regardless of grid discretization details.

TPU shape: Psi is a host-precomputed ``(L, H, W)`` f32 constant; forward =
one fft2 + L spectral multiplies + L ifft2 (all matmul-DFT, batched);
subbands live on a leading axis so the POCS threshold/decay machinery sees
``(..., L, H, W)``.

Subband ordering matches FFST: index 0 = lowpass, then per scale j
(coarse->fine) 2^(j+2) directional subbands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import dft
from .cplx import Cplx


def _meyer_aux(x):
    """Meyer auxiliary polynomial v(x), v(0)=0, v(1)=1, C^3 smooth."""
    x = np.clip(x, 0.0, 1.0)
    return x**4 * (35.0 - 84.0 * x + 70.0 * x**2 - 20.0 * x**3)


def _b_window(w):
    """Meyer bump b(ω): support 1 <= |ω| <= 4."""
    w = np.abs(w)
    out = np.zeros_like(w)
    m1 = (w >= 1) & (w <= 2)
    out[m1] = np.sin(np.pi / 2.0 * _meyer_aux(w[m1] - 1.0))
    m2 = (w > 2) & (w <= 4)
    out[m2] = np.cos(np.pi / 2.0 * _meyer_aux(w[m2] / 2.0 - 1.0))
    return out


def _psi1_hat(w):
    """Radial window: sqrt(b²(2ω) + b²(ω)), support 1/2 <= |ω| <= 4."""
    return np.sqrt(_b_window(2.0 * w) ** 2 + _b_window(w) ** 2)


def _psi2_hat(w):
    """Angular window: sqrt(v(1+ω)) for ω<=0, sqrt(v(1−ω)) for ω>0; support |ω|<=1."""
    out = np.zeros_like(w)
    neg = w <= 0
    out[neg] = np.sqrt(_meyer_aux(1.0 + w[neg]))
    out[~neg] = np.sqrt(_meyer_aux(1.0 - w[~neg]))
    return out


def _phi_hat(w):
    """Scaling window: 1 for |ω|<=1/2, Meyer rolloff to 0 at |ω|=1."""
    w = np.abs(w)
    out = np.zeros_like(w)
    out[w <= 0.5] = 1.0
    m = (w > 0.5) & (w <= 1.0)
    out[m] = np.cos(np.pi / 2.0 * _meyer_aux(2.0 * w[m] - 1.0))
    return out


def n_subbands(n_scales: int) -> int:
    return 1 + sum(2 ** (j + 2) for j in range(n_scales))


def default_scales(h: int, w: int) -> int:
    """Reference scale count: floor(0.5·log2(max(shape))) (POCS.py:21-31)."""
    s = int(np.floor(0.5 * np.log2(max(h, w))))
    return max(s, 1)


@functools.lru_cache(maxsize=8)
def shearlet_spectra(h: int, w: int, n_scales: int | None = None) -> np.ndarray:
    """Precompute the (L, H, W) shearlet spectra (numpy f32, fft layout).

    The stack is normalized pointwise so Σ_l Psi_l² == 1 exactly (tight
    frame). Spectra are real and centered on the unshifted numpy fft grid.
    """
    if n_scales is None:
        n_scales = default_scales(h, w)
    # fftshifted integer frequency grid, then rolled to fft layout at the end
    w1 = np.fft.ifftshift(np.arange(-(h // 2), (h + 1) // 2))[:, None].astype(np.float64)
    w2 = np.fft.ifftshift(np.arange(-(w // 2), (w + 1) // 2))[None, :].astype(np.float64)
    W1 = np.broadcast_to(w1, (h, w))
    W2 = np.broadcast_to(w2, (h, w))

    psis = [ _phi_hat(np.maximum(np.abs(W1), np.abs(W2)) / 1.0) ]  # lowpass, |ω|<=1

    with np.errstate(divide="ignore", invalid="ignore"):
        tan_h = np.where(W1 != 0, W2 / W1, 0.0)  # horizontal cone |ω2|<=|ω1|
        tan_v = np.where(W2 != 0, W1 / W2, 0.0)  # vertical cone

    cone_h = np.abs(W2) <= np.abs(W1)
    cone_v = ~cone_h

    for j in range(n_scales):
        a = 4.0 ** (-j)
        if j == n_scales - 1:
            # finest scale: extend the radial window flat to the grid corner
            # so the plane is covered up to (and including) Nyquist — the
            # standard ψ1 rolls off to zero exactly at 4·4^j, which for
            # power-of-two sizes lands on the Nyquist ring and leaves a hole
            r_h = np.where(np.abs(a * W1) >= 1.0, 1.0, _psi1_hat(a * W1))
            r_v = np.where(np.abs(a * W2) >= 1.0, 1.0, _psi1_hat(a * W2))
        else:
            r_h = _psi1_hat(a * W1)  # radial window on the horizontal cone axis
            r_v = _psi1_hat(a * W2)
        shears = range(-(2**j), 2**j + 1)
        for k in shears:
            ang_h = _psi2_hat((2.0**j) * tan_h + k)
            ang_v = _psi2_hat((2.0**j) * tan_v + k)
            if abs(k) < 2**j:
                # interior shears: separate horizontal and vertical subbands
                psis.append(np.where(cone_h, r_h * ang_h, 0.0))
                psis.append(np.where(cone_v, r_v * ang_v, 0.0))
            elif k == 2**j:
                # seam subbands: glued across the cone boundary (one per sign)
                psis.append(np.where(cone_h, r_h * ang_h, r_v * ang_v))
                psis.append(
                    np.where(cone_h, r_h * _psi2_hat((2.0**j) * tan_h - k),
                             r_v * _psi2_hat((2.0**j) * tan_v - k))
                )

    psi = np.stack(psis).astype(np.float64)
    assert psi.shape[0] == n_subbands(n_scales), (psi.shape, n_subbands(n_scales))

    return symmetrize_and_tighten(psi, f"shearlet ({h},{w}) {n_scales} scales")


def symmetrize_and_tighten(psi: np.ndarray, what: str) -> np.ndarray:
    """Reflect-symmetrize + pointwise Parseval-normalize a window stack.

    Real-coefficient symmetrization: on even grids the self-mapped Nyquist
    row/col (ω = −N/2) flips the shear/angle sign under ω -> −ω, leaving
    directional subbands asymmetric there. Energy-average each band with its
    reflected self so Psi(ω) == Psi(−ω) exactly (FFST's realCoefficients
    behavior); the subsequent pointwise normalization restores exact
    tightness (Σ_l Psi_l² == 1). Shared by the shearlet and curvelet frames.
    """

    def _reflect(p):
        return np.roll(np.roll(p[::-1, ::-1], 1, axis=0), 1, axis=1)

    psi = np.sqrt(0.5 * (psi**2 + np.stack([_reflect(p) for p in psi]) ** 2))

    total = np.sqrt(np.sum(psi**2, axis=0))
    if total.min() <= 1e-6:
        raise RuntimeError(
            f"{what}: window system does not cover the frequency plane "
            f"(min coverage {total.min():.2e})"
        )
    psi = psi / total[None]
    return psi.astype(np.float32)


def shearlet_transform(z: Cplx, psi, precision=dft.Precision.HIGHEST) -> Cplx:
    """Forward transform: (..., H, W) -> (..., L, H, W) subband coefficients."""
    zf = dft.fft2(z, precision=precision)
    p = jnp.asarray(psi)
    prod = Cplx(zf.re[..., None, :, :] * p, zf.im[..., None, :, :] * p)
    return dft.ifft2(prod, precision=precision)


def inverse_shearlet_transform(coeffs: Cplx, psi, precision=dft.Precision.HIGHEST) -> Cplx:
    """Adjoint/inverse (tight frame): sum of re-windowed subband spectra."""
    p = jnp.asarray(psi)
    cf = dft.fft2(coeffs, precision=precision)
    acc = Cplx(jnp.sum(cf.re * p, axis=-3), jnp.sum(cf.im * p, axis=-3))
    return dft.ifft2(acc, precision=precision)


# ---------------------------------------------------------------------------
# Support-cropped transform plan
#
# Scale-j subband spectra are compactly supported: the radial window
# ψ1(4^{-j}ω) vanishes outside |ω| <= 4^{j+1}, so every subband of scale j
# (both cones, plus the lowpass for j=0) lives in a centered frequency box
# of side 2·4^{j+1}+1. Restricting the per-subband DFT matmuls to that box
# is EXACT (the nonlinear threshold happens in the spatial domain; its
# spectrum is re-windowed by the compactly supported Psi before the sum) and
# cuts ~45% of the solver's matmul flops at 512² — only the finest scale
# still pays full-size transforms. The spatial coefficients keep full H×W
# resolution, so thresholds/decays see exactly the FFST coefficient values.
# ---------------------------------------------------------------------------

class _ScaleGroup:
    """Static per-scale plan entry: frequency-box indices + cropped Psi."""

    __slots__ = ("idx_h", "idx_w", "psi", "_psi_dev", "_box_mats")

    def __init__(self, idx_h, idx_w, psi):
        self.idx_h = idx_h  # (sr,) int32 fft-layout row indices, or None=full
        self.idx_w = idx_w
        self.psi = psi      # (Lg, sr, sc) f32
        self._psi_dev = None
        self._box_mats = None

    def psi_device(self):
        """Device copy of the window stack, materialized EAGERLY (outside
        any active trace) so jitted consumers close over an executable
        parameter instead of inlining an HLO constant. A 1024² plan's
        windows total hundreds of MB; inlined they exceed remote-compile
        payload limits (HTTP 413, tools/probe notes in docs/perf.md) and
        bloat every directional program's serialization and compile."""
        if self._psi_dev is None:
            with jax.ensure_compile_time_eval():
                self._psi_dev = jnp.asarray(self.psi)
        return self._psi_dev

    def box_mats_device(self, h: int, w: int):
        """Constant partial-DFT matrices for the fused box kernel
        (ops/pallas/subband.py::box_group_update_fused): A = F[idx] rows
        and their transposes, (ahr, ahi, ahtr, ahti, awr, awi, awtr,
        awti), device-materialized eagerly like :meth:`psi_device`."""
        if self._box_mats is None:
            fhr, fhi = dft.dft_matrices(h)
            fwr, fwi = (fhr, fhi) if w == h else dft.dft_matrices(w)
            ahr = np.ascontiguousarray(fhr[self.idx_h])
            ahi = np.ascontiguousarray(fhi[self.idx_h])
            awr = np.ascontiguousarray(fwr[self.idx_w])
            awi = np.ascontiguousarray(fwi[self.idx_w])
            with jax.ensure_compile_time_eval():
                self._box_mats = tuple(
                    jnp.asarray(a) for a in (
                        ahr, ahi,
                        np.ascontiguousarray(ahr.T),
                        np.ascontiguousarray(ahi.T),
                        awr, awi,
                        np.ascontiguousarray(awr.T),
                        np.ascontiguousarray(awi.T)))
        return self._box_mats


class Plan(tuple):
    """A tuple of _ScaleGroup plus ``perm``: planned subband order.

    The planned transforms emit subbands in plan order (groups
    concatenated); ``perm[i]`` is the canonical (FFST/curvelet) subband
    index at planned position i. Fine-scale splitting only reorders WITHIN
    a scale block, so scale-indexed consumers (adaptive tau_min's
    ``j_of_band``) are unaffected; use ``perm`` to compare against the
    unplanned transform.
    """

    def __new__(cls, groups, perm):
        return super().__new__(cls, groups)

    def __init__(self, groups, perm):
        self.perm = np.asarray(perm, np.int64)


def _box_indices(n: int, bound: int, mult: int = 8) -> np.ndarray:
    """fft-layout indices of frequencies |ω| <= bound, zero-extended so the
    box side is a multiple of ``mult``.

    The mathematical box has the odd side 2·bound+1 (129 at scale 2 of a
    512² plan), which every matmul of the box path must pad to the TPU's
    tile sizes — the scale-2 group IN ISOLATION measures 27% faster when
    explicitly extended to the next multiple of 8 (tools/probe_box.py:
    S=129 1.00x, S=136 0.73x, S=256 1.00x); embedded in the full solve the
    gain shrinks to ~1-2% (XLA overlaps the padding waste with other
    work — tools/probe_subband.py). The extra frequencies sit just above
    +bound where ψ is identically zero, so coefficient values are
    unchanged; only internal shapes grow.
    """
    idx = np.concatenate([np.arange(bound + 1),
                          np.arange(n - bound, n)]).astype(np.int32)
    side = len(idx)
    target = min(-(-side // mult) * mult, n)
    if target > side:
        # free positions start right above +bound (the box covers
        # [0..bound] and [n-bound..n-1])
        idx = np.concatenate([idx, np.arange(bound + 1, bound + 1 + target
                                             - side, dtype=np.int32)])
    return idx


def build_plan(psi: np.ndarray, counts, bounds,
               split_threshold: int | None = None) -> Plan:
    """Group a (L,H,W) window stack into support-cropped plan entries.

    ``counts[g]`` consecutive subbands form group g, whose spectra are all
    zero outside the centered frequency box |ω| <= ``bounds[g]`` (asserted).
    Shared by the shearlet and curvelet frames; consumed by
    ``shearlet_transform_planned`` / ``inverse_shearlet_transform_planned``.

    Fine-scale splitting (``split_threshold=<box side>``; **off by
    default**): a scale group whose box side reaches the threshold is
    re-grouped by each subband's *exact* nonzero row/col support (subbands
    with identical supports stay batched — the ±k shear pairs, whose
    supports coincide after the ω→−ω symmetrization). Fine-scale
    directional subbands are cone-localized — the k=0 horizontal shear at
    512² lives on 450 rows × 65 cols — so this cuts the solve's matmul
    flops to ~0.65× of the box plan's. **Measured on a TPU v5e it LOSES
    ~2.3×** (docs/perf.md): the many small odd-shaped einsums underuse the
    128×128 MXU tiles and the inverse pays ~17 scatter-adds into the
    full-size spectrum accumulator (4× the box plan's inverse time), so
    the batched box plan stays the default. The subband order is recorded
    in ``Plan.perm`` (reordering stays within the scale block; identity
    when splitting is off).
    """
    h, w = psi.shape[-2:]
    groups = []
    perm = []
    l0 = 0
    for cnt, bound in zip(counts, bounds):
        idxs = np.arange(l0, l0 + cnt)
        l0 += cnt
        side = 2 * bound + 1 if bound is not None else min(h, w)
        if split_threshold is not None and side >= split_threshold and cnt > 1:
            keymap = {}
            for l in idxs:
                nz = np.abs(psi[l]) > 0
                rows = np.nonzero(nz.any(axis=1))[0].astype(np.int32)
                cols = np.nonzero(nz.any(axis=0))[0].astype(np.int32)
                key = (rows.tobytes(), cols.tobytes())
                if key not in keymap:
                    keymap[key] = (rows, cols, [])
                keymap[key][2].append(int(l))
            for rows, cols, members in keymap.values():
                perm.extend(members)
                if len(rows) >= h and len(cols) >= w:
                    groups.append(_ScaleGroup(None, None, psi[members]))
                else:
                    sub = np.ascontiguousarray(psi[members][:, rows][:, :, cols])
                    groups.append(_ScaleGroup(rows, cols, sub))
            continue
        perm.extend(idxs.tolist())
        sub = psi[idxs[0] : idxs[-1] + 1]
        if bound is None or side >= min(h, w):
            groups.append(_ScaleGroup(None, None, sub))
            continue
        ih = _box_indices(h, bound)
        iw = _box_indices(w, bound)
        # exactness guard: all energy of this scale lies inside the box
        outside = np.ones((h, w), bool)
        outside[np.ix_(ih, iw)] = False
        leak = np.abs(sub[:, outside]).max() if outside.any() else 0.0
        if leak != 0.0:
            # hard requirement, not an assert (-O would strip it and the
            # cropped plan would silently drop spectral energy)
            raise ValueError(
                f"scale group leaks outside its box: {leak} — the plan's "
                "bound underestimates this scale's support")
        groups.append(_ScaleGroup(ih, iw, np.ascontiguousarray(sub[:, ih][:, :, iw])))
    if l0 != psi.shape[0]:
        raise ValueError(f"plan counts cover {l0} of {psi.shape[0]} subbands")
    return Plan(groups, perm)


@functools.lru_cache(maxsize=8)
def shearlet_plan(h: int, w: int, n_scales: int | None = None,
                  split_threshold: int | None = None):
    """Precompute per-scale support-cropped spectra groups (host, cached)."""
    if n_scales is None:
        n_scales = default_scales(h, w)
    psi = shearlet_spectra(h, w, n_scales)
    counts = [1 + 4] + [2 ** (j + 2) for j in range(1, n_scales)]
    bounds = [4] + [4 ** (j + 1) for j in range(1, n_scales)]
    # the finest radial window is extended FLAT to the grid corner (Meyer
    # cone construction), so its support is the full grid whenever
    # 2*4**n_scales + 1 < min(h, w) — e.g. 640² default scales, or any
    # explicitly reduced n_scales. Same fix as curvelet_plan's finest ring.
    bounds[-1] = None
    return build_plan(psi, counts, bounds, split_threshold)


def _partial_ifft2(v: Cplx, idx_h, idx_w, h: int, w: int, precision) -> Cplx:
    """ifft2 of a spectrum that is zero outside the (idx_h × idx_w) box.

    ``v``: (..., sr, sc) box values -> (..., h, w) spatial, scaled 1/(h·w).
    """
    fhr, fhi = dft.dft_matrices(h)
    fwr, fwi = dft.dft_matrices(w)
    gauss = dft._gauss_enabled()
    # inverse matrix = conj(F)/n: columns restricted to the box indices
    mh_np = (fhr[:, idx_h], -fhi[:, idx_h])
    mw_np = (fwr[:, idx_w], -fwi[:, idx_w])
    mhs = jnp.asarray(mh_np[0] + mh_np[1]) if gauss else None
    mws = jnp.asarray(mw_np[0] + mw_np[1]) if gauss else None
    mhr, mhi = jnp.asarray(mh_np[0]), jnp.asarray(mh_np[1])
    mwr, mwi = jnp.asarray(mw_np[0]), jnp.asarray(mw_np[1])

    def e_l(mm, a):
        return jnp.einsum("hr,...rc->...hc", mm, a, precision=precision)

    def e_r(a, mm):
        return jnp.einsum("...hc,wc->...hw", a, mm, precision=precision)

    yr, yi = dft._cmul_left(e_l, mhr, mhi, mhs, v.re, v.im)
    outr, outi = dft._cmul_right(e_r, yr, yi, mwr, mwi, mws)
    s = 1.0 / (h * w)
    return Cplx(outr * s, outi * s)


def _partial_fft2(x: Cplx, idx_h, idx_w, precision) -> Cplx:
    """fft2 evaluated only at the (idx_h × idx_w) box of output frequencies."""
    h, w = x.shape[-2], x.shape[-1]
    fhr, fhi = dft.dft_matrices(h)
    fwr, fwi = dft.dft_matrices(w)
    gauss = dft._gauss_enabled()
    mhs = jnp.asarray(fhr[idx_h] + fhi[idx_h]) if gauss else None
    mws = jnp.asarray(fwr[idx_w] + fwi[idx_w]) if gauss else None
    mhr = jnp.asarray(fhr[idx_h])   # (sr, H)
    mhi = jnp.asarray(fhi[idx_h])
    mwr = jnp.asarray(fwr[idx_w])   # (sc, W)
    mwi = jnp.asarray(fwi[idx_w])

    def e_l(mm, a):
        return jnp.einsum("rh,...hw->...rw", mm, a, precision=precision)

    def e_r(a, mm):
        return jnp.einsum("...rw,cw->...rc", a, mm, precision=precision)

    yr, yi = dft._cmul_left(e_l, mhr, mhi, mhs, x.re, x.im)
    outr, outi = dft._cmul_right(e_r, yr, yi, mwr, mwi, mws)
    return Cplx(outr, outi)


def shearlet_transform_planned(z: Cplx, plan, precision=dft.Precision.HIGHEST) -> Cplx:
    """Forward transform via the support-cropped plan (== full, cheaper)."""
    h, w = z.shape[-2], z.shape[-1]
    zf = dft.fft2(z, precision=precision)
    outs = []
    for g in plan:
        p = g.psi_device()
        if g.idx_h is None:
            prod = Cplx(zf.re[..., None, :, :] * p, zf.im[..., None, :, :] * p)
            outs.append(dft.ifft2(prod, precision=precision))
        else:
            box = zf[..., g.idx_h[:, None], g.idx_w[None, :]]
            prod = Cplx(box.re[..., None, :, :] * p, box.im[..., None, :, :] * p)
            outs.append(_partial_ifft2(prod, g.idx_h, g.idx_w, h, w, precision))
    return Cplx(jnp.concatenate([o.re for o in outs], axis=-3),
                jnp.concatenate([o.im for o in outs], axis=-3))


def _plan_pallas_pack(plan, h: int, w: int, layout: str = "permuted"):
    """Cached packing of a plan for the fused subband kernel:
    (psi of full-size groups, plan-order indices of those bands,
    [(l0, lg, group)] for box groups). ``layout='permuted'`` stores the
    full-size psi in the radix_perm layout (square fast-split slices);
    ``'natural'`` keeps plan order (rectangular slices). Box groups carry
    no layout-specific positions — they run in the gather-free
    spatial-projection form (:func:`_box_group_spatial`)."""
    attr = f"_pallas_pack_{layout}"
    pack = getattr(plan, attr, None)
    if pack is not None:
        return pack
    if layout == "permuted":
        perm_h, perm_w = dft.radix_perm(h), dft.radix_perm(w)
    full_psi, full_idx, boxes = [], [], []
    l0 = 0
    for g in plan:
        lg = g.psi.shape[0]
        psi = g.psi
        if g.idx_h is not None and (len(g.idx_h) * 4 >= h
                                    and len(g.idx_w) * 4 >= w):
            # big box group (the 136-side scale at 512²): zero-pad psi to
            # full size and run it through the VMEM-resident kernel — its
            # per-subband cost there matches the XLA box path's (equal
            # flops×efficiency trade, tools/probe_subband.py) while
            # removing the (B, lg, H, W) coefficient stack from HBM
            psi = np.zeros((lg, h, w), np.float32)
            psi[:, g.idx_h[:, None], g.idx_w[None, :]] = g.psi
        elif g.idx_h is not None:
            boxes.append((l0, lg, g))
            l0 += lg
            continue
        p = psi if layout == "natural" else psi[:, perm_h][:, :, perm_w]
        full_psi.append(np.ascontiguousarray(p))
        full_idx.extend(range(l0, l0 + lg))
        l0 += lg
    if full_psi:
        # device-materialize EAGERLY (even if this first call happens under
        # an active jit trace): jitted consumers then close over an
        # executable parameter instead of inlining the stack as an HLO
        # constant — at 1024² the full-size windows alone are ~380 MB,
        # which breaks remote-compile payload limits and bloats every
        # directional program (see _ScaleGroup.psi_device)
        with jax.ensure_compile_time_eval():
            psi_full = jnp.asarray(np.concatenate(full_psi))
    else:
        psi_full = None
    pack = (psi_full, np.asarray(full_idx, np.int64), boxes)
    setattr(plan, attr, pack)
    return pack


def _box_group_spatial(y: Cplx, tau_g, g, h: int, w: int, thresh_op: str,
                       precision, stream: bool = False) -> Cplx:
    """One support-cropped group's POCS update in gather-free spatial-
    projection form: the group's contribution to ``ifft2(Σ_l ψ_l·fft2(ĉ_l))``.

    Instead of gathering the group's frequency box out of a precomputed
    spectrum and scatter-adding the result back (2-D gathers with
    scattered indices — measured to dominate the directional iteration on
    the v5e, tools/probe_subband.py), every box access is a dense matmul
    with constant DFT-row matrices: the box spectrum comes from a partial
    fft2 of the SPATIAL iterate, and — since the final inverse is linear —
    the per-subband back-projections collapse to ONE partial ifft2 of the
    psi-weighted summed box. Identical math to the old gather/scatter
    path; golden-pinned against inverse(threshold(forward)) in
    tests/test_shearlet.py.

    ``stream=True`` scans over the group's subbands carrying only the
    (S_h, S_w) summed box (for large boxes whose batched (…, lg, H, W)
    coefficient stack would not fit comfortably in HBM).
    """
    from . import threshold as threshold_ops

    p_stack = g.psi_device()
    xbox = _partial_fft2(y, g.idx_h, g.idx_w, precision)
    if not stream:
        prod = Cplx(xbox.re[..., None, :, :] * p_stack,
                    xbox.im[..., None, :, :] * p_stack)
        c = _partial_ifft2(prod, g.idx_h, g.idx_w, h, w, precision)
        c = threshold_ops.threshold_pair(
            c, tau_g[..., None, None], kind=thresh_op)
        v = _partial_fft2(c, g.idx_h, g.idx_w, precision)
        m_re = jnp.sum(v.re * p_stack, axis=-3)
        m_im = jnp.sum(v.im * p_stack, axis=-3)
    else:
        tau_s = jnp.moveaxis(tau_g, -1, 0)  # (lg, ...) scan-leading
        m0 = jnp.zeros(xbox.re.shape, y.re.dtype)

        def step(carry, xs):
            a_re, a_im = carry
            p, t = xs
            c = _partial_ifft2(Cplx(xbox.re * p, xbox.im * p),
                               g.idx_h, g.idx_w, h, w, precision)
            c = threshold_ops.threshold_pair(
                c, t[..., None, None], kind=thresh_op)
            v = _partial_fft2(c, g.idx_h, g.idx_w, precision)
            return (a_re + v.re * p, a_im + v.im * p), None

        (m_re, m_im), _ = jax.lax.scan(step, (m0, m0), (p_stack, tau_s))
    return _partial_ifft2(Cplx(m_re, m_im), g.idx_h, g.idx_w, h, w, precision)


def _pocs_subband_apply_pallas(z: Cplx, plan, tau, thresh_op: str,
                               precision, interpret: bool,
                               box_precision) -> Cplx:
    """Fused-Pallas pipeline for full-size subbands (ops/pallas/subband.py);
    box groups run in the gather-free spatial-projection form
    (:func:`_box_group_spatial`), so nothing indexes into the kernel's
    (possibly radix-permuted) spectral layout. Numerics == the XLA
    streamed path (pinned in tests/test_shearlet.py)."""
    from .pallas.subband import subband_layout, subband_update_fused

    import os

    h, w = z.shape[-2], z.shape[-1]
    layout = subband_layout(z.shape)
    psi_full, full_idx, boxes = _plan_pallas_pack(plan, h, w, layout)
    tau2 = jnp.asarray(tau)
    if tau2.ndim == 1:
        tau2 = tau2[None]
    # the kernel reads tau_ref[b, l] for every slice b — a shared (1, L)
    # tau must be materialized to (B, L) or b >= 1 reads out of bounds
    tau2 = jnp.broadcast_to(tau2, (z.re.shape[0], tau2.shape[-1]))

    if layout == "permuted" and os.environ.get("P3D_SPATIAL_IO"):
        # round-5 EXPERIMENT (opt-in via P3D_SPATIAL_IO=1): the top-level
        # spectral round trip runs INSIDE the kernel (VMEM-scratch
        # spectrum at l==0, in-kernel inverse at l==L-1) — spatial in,
        # spatial update out. Mathematically equivalent but NOT
        # bit-compatible with the spectral-I/O form: the in-kernel
        # spectrum differs from the XLA one at f32 rounding level, and
        # hard-threshold boundary coefficients can flip (measured ~1e-3
        # output diffs at 256², quality-neutral). Off by default: it
        # measured WORSE at 1024² (solve 108 vs 128 slice-iters/s — the
        # boundary grid steps serialize a full transform Mosaic cannot
        # overlap; docs/perf.md round-5 negative result) and it would
        # weaken the strict kernel-vs-XLA parity gates.
        out = subband_update_fused(
            z, psi_full, tau2[..., jnp.asarray(full_idx)],
            thresh_op=thresh_op, precision=precision, interpret=interpret,
            layout=layout, spatial_io=True)
    else:
        zf = (dft.fft2_permuted(z, precision=precision)
              if layout == "permuted" else dft.fft2(z, precision=precision))
        acc = subband_update_fused(
            zf, psi_full, tau2[..., jnp.asarray(full_idx)],
            thresh_op=thresh_op, precision=precision, interpret=interpret,
            layout=layout)
        inv = dft.ifft2_from_permuted if layout == "permuted" else dft.ifft2
        out = inv(acc, precision=precision)

    from .pallas.subband import box_group_supported, box_group_update_fused

    for l0, lg, g in boxes:
        tau_g = tau2[..., l0:l0 + lg]
        if box_group_supported(len(g.idx_h), len(g.idx_w), h, w, thresh_op,
                               interpret):
            # fused box kernel: the whole per-subband backproject ->
            # threshold -> project round trip VMEM-resident; only the
            # group's (B, sr, sc) box spectrum and its psi-weighted sum
            # touch HBM (same math as _box_group_spatial, pinned in
            # tests/test_shearlet.py)
            xbox = _partial_fft2(z, g.idx_h, g.idx_w, box_precision)
            m = box_group_update_fused(
                xbox, g.psi_device(), tau_g, g.box_mats_device(h, w),
                h, w, thresh_op=thresh_op, precision=box_precision,
                interpret=interpret)
            out = out + _partial_ifft2(m, g.idx_h, g.idx_w, h, w,
                                       box_precision)
        else:
            out = out + _box_group_spatial(z, tau_g, g, h, w,
                                           thresh_op, box_precision)
    return out


def pocs_subband_apply(z: Cplx, plan, tau, thresh_op: str,
                       precision=dft.Precision.HIGHEST,
                       stream_min_side: int = 192,
                       use_pallas: bool = False,
                       pallas_interpret: bool = False,
                       box_precision=None) -> Cplx:
    """inverse(threshold(forward(z))) with large subband groups STREAMED.

    The planned transform pair materializes the full (..., L, H, W)
    coefficient stack in HBM several times per POCS iteration — at 512²
    batch 8 that is ~1 GB per pass, and the directional solve measures
    memory-bound (HIGH ≈ HIGHEST rate, round-3 bench). This fused
    apply computes the same math with the per-iteration peak at one
    (..., H, W) subband: groups whose frequency box side reaches
    ``stream_min_side`` run through a ``lax.scan`` over their subbands
    (carrying only the spectrum accumulator); small groups keep the batched
    einsum path (their stacks are tiny and their matmuls need the batching
    to fill the MXU). Numerics are identical to
    ``inverse_shearlet_transform_planned(threshold(shearlet_transform_planned(z)))``
    — pinned by tests/test_shearlet.py.

    ``tau``: (..., L) per-subband thresholds in plan order (exactly what
    the transform's ``decay`` emits per iteration). ``use_pallas`` routes
    full-size subbands through the fused VMEM-resident kernel
    (ops/pallas/subband.py) when the shape/threshold support it.
    ``box_precision`` (default: ``precision``) sets the matmul precision
    of the support-cropped BOX-group stages only (partial DFTs + box
    round trips) — mixed-precision probe lever for bases whose HIGH-vs-
    HIGHEST quality delta may live in the boxes (docs/perf.md round 4b:
    CURVELET measured a 0.5 dB cube-level drop at uniform HIGH).
    """
    from . import threshold as threshold_ops

    if box_precision is None:
        box_precision = precision

    h, w = z.shape[-2], z.shape[-1]
    if use_pallas and z.re.ndim == 3:
        from .pallas.subband import subband_layout, subband_supported

        if (subband_supported(z.shape, thresh_op, pallas_interpret)
                and _plan_pallas_pack(plan, h, w,
                                      subband_layout(z.shape))[0] is not None):
            return _pocs_subband_apply_pallas(
                z, plan, tau, thresh_op, precision, pallas_interpret,
                box_precision)
    batch = z.shape[:-2]
    zf = dft.fft2(z, precision=precision)
    acc_re = jnp.zeros(batch + (h, w), z.re.dtype)
    acc_im = jnp.zeros(batch + (h, w), z.re.dtype)
    extra = None  # spatial-domain box-group contributions
    l0 = 0
    for g in plan:
        lg = g.psi.shape[0]
        tau_g = tau[..., l0:l0 + lg]
        l0 += lg
        side = min(h, w) if g.idx_h is None else len(g.idx_h)
        if g.idx_h is not None:
            # support-cropped group: gather-free spatial-projection form
            # (streamed over subbands when the box is large enough that
            # the batched (..., lg, H, W) stack would strain HBM);
            # _box_group_spatial fetches its own (cropped) psi — the
            # full-size psi_device() materialization belongs to the
            # full-size branches below only
            contrib = _box_group_spatial(z, tau_g, g, h, w, thresh_op,
                                         box_precision,
                                         stream=side >= stream_min_side)
            extra = contrib if extra is None else extra + contrib
            continue
        p_stack = g.psi_device()
        if side < stream_min_side:
            # small full-size group: batched einsum path
            prod = Cplx(zf.re[..., None, :, :] * p_stack,
                        zf.im[..., None, :, :] * p_stack)
            c = dft.ifft2(prod, precision=precision)
            c = threshold_ops.threshold_pair(
                c, tau_g[..., None, None], kind=thresh_op)
            cf = dft.fft2(c, precision=precision)
            acc_re = acc_re + jnp.sum(cf.re * p_stack, axis=-3)
            acc_im = acc_im + jnp.sum(cf.im * p_stack, axis=-3)
            continue

        # large full-size group: scan over subbands, (..., H, W) working set
        tau_s = jnp.moveaxis(tau_g, -1, 0)  # (lg, ...) scan-leading

        def step_full(carry, xs):
            a_re, a_im = carry
            p, t = xs
            c = dft.ifft2(Cplx(zf.re * p, zf.im * p), precision=precision)
            c = threshold_ops.threshold_pair(
                c, t[..., None, None], kind=thresh_op)
            cf = dft.fft2(c, precision=precision)
            return (a_re + cf.re * p, a_im + cf.im * p), None

        (acc_re, acc_im), _ = jax.lax.scan(
            step_full, (acc_re, acc_im), (p_stack, tau_s))

    out = dft.ifft2(Cplx(acc_re, acc_im), precision=precision)
    if extra is not None:
        out = out + extra
    return out


def subband_stats(z: Cplx, plan, precision=dft.Precision.HIGHEST,
                  stream_min_side: int = 192, box_precision=None):
    """Per-subband (max |c|, Σ|c|²) of the transform of ``z``, STREAMED.

    The decay schedule (exponential/linear + adaptive tau_min) needs only
    these two reductions of the coefficient stack — computing them through
    the planned forward transform materializes (..., L, H, W) in HBM,
    which costs more than a whole POCS iteration per batch at 512². This
    streams the same per-subband reductions at an (..., H, W) working set.
    Returns two ``(..., L)`` arrays in plan order. ``box_precision``
    (default: ``precision``) matches pocs_subband_apply's box-stage
    precision so the tau schedule is derived at the same accuracy the
    apply runs (the full-forward decay FALLBACK for data-driven /
    non-'values' kinds runs uniformly at ``precision`` — documented gap).
    """
    if box_precision is None:
        box_precision = precision
    h, w = z.shape[-2], z.shape[-1]
    zf = dft.fft2(z, precision=precision)
    maxes, sumsqs = [], []
    for g in plan:
        p_stack = g.psi_device()
        side = min(h, w) if g.idx_h is None else len(g.idx_h)

        if g.idx_h is None:
            def coeff_of(p):
                return dft.ifft2(Cplx(zf.re * p, zf.im * p),
                                 precision=precision)
        else:
            box = zf[..., g.idx_h[:, None], g.idx_w[None, :]]

            def coeff_of(p, box=box, g=g):
                return _partial_ifft2(Cplx(box.re * p, box.im * p),
                                      g.idx_h, g.idx_w, h, w, box_precision)

        if side < stream_min_side:
            # small group: batched, (..., Lg, H, W) stack is tiny
            if g.idx_h is None:
                prod = Cplx(zf.re[..., None, :, :] * p_stack,
                            zf.im[..., None, :, :] * p_stack)
                c = dft.ifft2(prod, precision=precision)
            else:
                prod = Cplx(box.re[..., None, :, :] * p_stack,
                            box.im[..., None, :, :] * p_stack)
                c = _partial_ifft2(prod, g.idx_h, g.idx_w, h, w,
                                   box_precision)
            a2 = c.abs2()
            maxes.append(jnp.sqrt(jnp.max(a2, axis=(-2, -1))))
            sumsqs.append(jnp.sum(a2, axis=(-2, -1)))
        else:
            def step(carry, p):
                c = coeff_of(p)
                a2 = c.abs2()
                return carry, (jnp.sqrt(jnp.max(a2, axis=(-2, -1))),
                               jnp.sum(a2, axis=(-2, -1)))

            _, (mx, ss) = jax.lax.scan(step, None, p_stack)
            maxes.append(jnp.moveaxis(mx, 0, -1))
            sumsqs.append(jnp.moveaxis(ss, 0, -1))
    return jnp.concatenate(maxes, -1), jnp.concatenate(sumsqs, -1)


def inverse_shearlet_transform_planned(coeffs: Cplx, plan,
                                       precision=dft.Precision.HIGHEST) -> Cplx:
    """Inverse transform via the support-cropped plan (== full, cheaper)."""
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    batch = coeffs.shape[:-3]
    acc_re = jnp.zeros(batch + (h, w), coeffs.dtype)
    acc_im = jnp.zeros(batch + (h, w), coeffs.dtype)
    l0 = 0
    for g in plan:
        lg = g.psi.shape[0]
        c = coeffs[..., l0 : l0 + lg, :, :]
        l0 += lg
        p = g.psi_device()
        if g.idx_h is None:
            cf = dft.fft2(c, precision=precision)
            acc_re = acc_re + jnp.sum(cf.re * p, axis=-3)
            acc_im = acc_im + jnp.sum(cf.im * p, axis=-3)
        else:
            v = _partial_fft2(c, g.idx_h, g.idx_w, precision)
            sr = jnp.sum(v.re * p, axis=-3)
            si = jnp.sum(v.im * p, axis=-3)
            acc_re = acc_re.at[..., g.idx_h[:, None], g.idx_w[None, :]].add(sr)
            acc_im = acc_im.at[..., g.idx_h[:, None], g.idx_w[None, :]].add(si)
    return dft.ifft2(Cplx(acc_re, acc_im), precision=precision)
