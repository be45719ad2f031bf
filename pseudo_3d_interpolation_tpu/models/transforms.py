"""Sparse-transform protocol for the POCS solver.

The reference drives POCS with closure pairs (np.fft.fft2/ifft2, pywt
wavedec2/waverec2, FFST shearlets, curvelops FDCT — reference:
cube_POCS_interpolation_3D.py:255-286). Here each basis is a small
*static* object with four methods, so one scan-based solver handles any
transform under ``jit`` without Python branching inside the trace:

    forward(z: Cplx)          -> coeffs (pytree)
    inverse(coeffs)           -> Cplx
    decay(coeffs, ...)        -> pytree of per-leaf (niter, *batch) schedules
    threshold(coeffs, t, op)  -> coeffs

Coefficient pytrees carry complex data as ``Cplx`` pairs (TPU has no native
complex support; see ops/cplx.py). Batch axes lead: slices are (..., H, W).

Transform instances are hashable/static so they can be closed over or passed
as ``static_argnums`` to jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..ops import decay as decay_ops
from ..ops import dft
from ..ops import threshold as threshold_ops
from ..ops.cplx import Cplx


def _resolve_precision(p):
    """'highest' | 'high' | 'default' | Precision -> jax.lax.Precision.

    The matmul precision is the framework's speed/quality lever on TPU
    (docs/perf.md): HIGHEST ≈ f32 (6-pass bf16), HIGH = bf16x3 (~1.7x
    faster, solve SNR ~84 dB — cube-SNR neutral), DEFAULT = single-pass
    bf16 (~3x faster, solve SNR ~28 dB).
    """
    import jax

    if isinstance(p, str):
        return {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[p.lower()]
    return p if p is not None else jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class FFTTransform:
    """2D Fourier basis via MXU matmul-DFT (reference FFT kind)."""

    precision: str = "highest"
    kind: str = "FFT"

    def forward(self, z: Cplx) -> Cplx:
        return dft.fft2(z, precision=_resolve_precision(self.precision))

    def inverse(self, coeffs: Cplx) -> Cplx:
        return dft.ifft2(coeffs, precision=_resolve_precision(self.precision))

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        return decay_ops.threshold_decay(
            coeffs.abs(), model, niter, p_max=p_max, p_min=p_min, kind=decay_kind
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        # t: (*batch,) per-slice threshold -> broadcast over the slice
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)


@dataclasses.dataclass(frozen=True)
class DCTTransform:
    """2D orthonormal DCT basis — real, single-matmul, cheapest on TPU.

    Listed as a supported kind by the reference (functions/POCS.py:235). For
    complex slices the DCT acts on re/im independently (it is linear), while
    thresholding acts on the joint magnitude. ``precision`` is the same
    speed/quality lever as the FFT basis (HIGH = bf16x3 ~1.7x faster).
    """

    precision: str = "highest"
    kind: str = "DCT"

    def forward(self, z: Cplx) -> Cplx:
        p = _resolve_precision(self.precision)
        return Cplx(dft.dct2_2d(z.re, precision=p), dft.dct2_2d(z.im, precision=p))

    def inverse(self, coeffs: Cplx) -> Cplx:
        p = _resolve_precision(self.precision)
        return Cplx(dft.idct2_2d(coeffs.re, precision=p),
                    dft.idct2_2d(coeffs.im, precision=p))

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        return decay_ops.threshold_decay(
            coeffs.abs(), model, niter, p_max=p_max, p_min=p_min, kind=decay_kind
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)


@dataclasses.dataclass(frozen=True)
class WaveletTransform:
    """Multilevel 2D DWT basis (reference WAVELET kind, pywt wavedec2/waverec2
    with the coif5 default — here the exactly-generated Daubechies family,
    see ops/wavelet.py). The approximation (lowpass) band is never
    thresholded, matching the reference's exclusion of ``coeffs[0]``
    (functions/POCS.py:524, 585-609)."""

    wavelet: str = "db4"
    level: int | None = None
    kind: str = "WAVELET"
    # original slice shape + padded target when zero-padding is needed; set
    # automatically via with_shape() (the solver calls it)
    crop: tuple | None = None
    target: tuple | None = None
    # matmul precision of the folded Pallas path (the XLA conv path ignores
    # it); None = HIGHEST
    precision: Any = None

    def with_shape(self, shape):
        """Bind to a slice shape: resolves the level and records the padded
        target (a 2**level multiple, at least the filter length), so
        arbitrary (odd, small) cube dimensions work like pywt's ragged
        handling in the reference."""
        import dataclasses as _dc

        from ..ops import wavelet as wv

        h, w = int(shape[-2]), int(shape[-1])
        level = self.level
        if level is None:
            level = min(max(wv.max_level(h, self.wavelet), 1),
                        max(wv.max_level(w, self.wavelet), 1), 3)
        m = 2 ** level
        filt_len = wv.filter_length(self.wavelet)
        # the axis entering the final level is target / 2**(level-1); it must
        # hold the full filter for the periodized convolution to be exact
        min_size = -(-(filt_len * 2 ** (level - 1)) // m) * m
        th = max(-(-h // m) * m, min_size)
        tw = max(-(-w // m) * m, min_size)
        if (th, tw) == (h, w):
            return _dc.replace(self, level=level, crop=None, target=None)
        return _dc.replace(self, level=level, crop=(h, w), target=(th, tw))

    def _pad(self, a):
        if self.target is None:
            return a
        th, tw = self.target
        ph = th - a.shape[-2]
        pw = tw - a.shape[-1]
        return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, ph), (0, pw)])

    def forward(self, z: Cplx):
        from ..ops import wavelet as wv

        re = wv.wavedec2(self._pad(z.re), self.wavelet, self.level)
        im = wv.wavedec2(self._pad(z.im), self.wavelet, self.level)
        out = [Cplx(re[0], im[0])]
        for (rh, rv, rd), (ih, iv, id_) in zip(re[1:], im[1:]):
            out.append((Cplx(rh, ih), Cplx(rv, iv), Cplx(rd, id_)))
        return out

    def inverse(self, coeffs):
        from ..ops import wavelet as wv

        re = [coeffs[0].re] + [tuple(c.re for c in det) for det in coeffs[1:]]
        im = [coeffs[0].im] + [tuple(c.im for c in det) for det in coeffs[1:]]
        out = Cplx(wv.waverec2(re, self.wavelet), wv.waverec2(im, self.wavelet))
        if self.crop is not None:
            h, w = self.crop
            out = Cplx(out.re[..., :h, :w], out.im[..., :h, :w])
        return out

    def decay(self, coeffs, model, niter, p_max, p_min, decay_kind):
        if isinstance(p_min, str):
            raise ValueError(
                "p_min='adaptive' is not defined for the WAVELET transform "
                "(reference functions/POCS.py:321-324)"
            )
        batch_shape = coeffs[0].shape[:-2]
        zero = jnp.zeros((niter,) + batch_shape, jnp.float32)

        def leaf_decay(c):
            return decay_ops.threshold_decay(
                c.abs(), model, niter, p_max=p_max, p_min=p_min, kind=decay_kind
            )

        out = [zero]  # approximation band: threshold 0 == keep everything
        for det in coeffs[1:]:
            out.append(tuple(leaf_decay(c) for c in det))
        return out

    def threshold(self, coeffs, t, op: str):
        out = [coeffs[0]]  # lowpass passes through (t[0] is the zero leaf)
        for det, t_det in zip(coeffs[1:], t[1:]):
            out.append(tuple(
                threshold_ops.threshold_pair(c, tc[..., None, None], kind=op)
                for c, tc in zip(det, t_det)
            ))
        return out


class _SpectralStackMixin:
    """Shared streamed-update surface of the spectral-stack bases
    (SHEARLET/CURVELET): both delegate to the same plan-driven machinery in
    ops/shearlet.py, so the fused POCS update lives here once."""

    def apply_threshold(self, z: Cplx, t, op: str, use_pallas: bool = False,
                        pallas_interpret: bool = False) -> Cplx:
        """Fused inverse(threshold(forward(z))) with streamed subbands —
        same numerics, no (..., L, H, W) HBM materialization (the POCS hot
        path uses this; ops/shearlet.py::pocs_subband_apply).
        ``use_pallas`` engages the fused VMEM-resident subband kernel."""
        from ..ops import shearlet as sh

        bp = getattr(self, "box_precision", None)
        return sh.pocs_subband_apply(
            z, self._plan(z.shape[-2], z.shape[-1]), t, op,
            precision=_resolve_precision(self.precision),
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            box_precision=_resolve_precision(bp) if bp else None)

    def _streamed_stats(self, z: Cplx):
        """Per-subband (max|c|, Σ|c|²) straight from the input slice —
        streamed reductions instead of a materialized forward transform
        (same numbers; the full-stack forward costs more HBM traffic than
        a whole POCS iteration per batch). Returns None when the decay
        model needs the actual coefficients (data-driven / non-'values'
        kinds / inverse-proportional), signalling the generic fallback."""
        from ..ops import shearlet as sh

        bp = getattr(self, "box_precision", None)
        return sh.subband_stats(
            z, self._plan(z.shape[-2], z.shape[-1]),
            precision=_resolve_precision(self.precision),
            box_precision=_resolve_precision(bp) if bp else None)

    @staticmethod
    def _needs_full_forward(model, decay_kind) -> bool:
        return (model == "data-driven" or decay_kind != "values"
                or "inverse" in model)


@dataclasses.dataclass(frozen=True)
class ShearletTransform(_SpectralStackMixin):
    """Cone-adapted Meyer shearlet basis (reference SHEARLET kind via FFST).

    Psi spectra are precomputed per slice shape (ops/shearlet.py) and enter
    jitted code as constants; coefficients carry subbands on axis -3:
    ``(..., L, H, W)``. Thresholds are per-subband (the reference reduces
    over the spatial axes only, POCS.py:255-259, 284-285, 341)."""

    n_scales: int | None = None
    precision: str = "highest"
    # matmul precision for the support-cropped box-group stages only
    # (None = same as `precision`); see ops/shearlet.pocs_subband_apply
    box_precision: str | None = None
    kind: str = "SHEARLET"

    def _plan(self, h, w):
        from ..ops import shearlet as sh

        return sh.shearlet_plan(h, w, self.n_scales)

    def forward(self, z: Cplx) -> Cplx:
        from ..ops import shearlet as sh

        return sh.shearlet_transform_planned(
            z, self._plan(z.shape[-2], z.shape[-1]),
            precision=_resolve_precision(self.precision))

    def inverse(self, coeffs: Cplx) -> Cplx:
        from ..ops import shearlet as sh

        return sh.inverse_shearlet_transform_planned(
            coeffs, self._plan(coeffs.shape[-2], coeffs.shape[-1]),
            precision=_resolve_precision(self.precision))

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        from ..ops import shearlet as sh

        mag = coeffs.abs()  # (..., L, H, W); L acts as a batch axis -> per-subband tau
        tau_min_override = None
        if isinstance(p_min, str) and p_min == "adaptive":
            n_scales = self.n_scales or sh.default_scales(
                coeffs.shape[-2], coeffs.shape[-1]
            )
            # scalar per slice, shared by all subbands (reference POCS.py:302-320)
            tau_min_override = decay_ops.shearlet_adaptive_tau_min(mag, n_scales)[..., None]
            p_min = 1e-3  # placeholder; overridden below
        return decay_ops.threshold_decay(
            mag, model, niter, p_max=p_max, p_min=p_min, kind=decay_kind,
            tau_min_override=tau_min_override,
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        # t: (..., L) per-subband thresholds
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)

    def decay_from_input(self, z: Cplx, model, niter, p_max, p_min,
                         decay_kind):
        """Decay schedule straight from the input slice (streamed stats —
        see :meth:`_SpectralStackMixin._streamed_stats`)."""
        if self._needs_full_forward(model, decay_kind):
            return self.decay(self.forward(z), model, niter, p_max, p_min,
                              decay_kind)
        from ..ops import shearlet as sh

        h, w = z.shape[-2], z.shape[-1]
        amax, sumsq = self._streamed_stats(z)
        tau_max = p_max * amax
        if isinstance(p_min, str):
            if p_min != "adaptive":
                raise ValueError(f"unknown p_min {p_min!r}")
            n_scales = self.n_scales or sh.default_scales(h, w)
            size = amax.shape[-1] * h * w
            norms = jnp.sqrt(sumsq / size)
            tau_min = decay_ops.shearlet_adaptive_tau_min_from_norms(
                norms, n_scales)[..., None]
            tau_min = jnp.broadcast_to(tau_min, tau_max.shape)
        else:
            tau_min = p_min * amax
        return decay_ops.schedule(model, niter, tau_max, tau_min)


@dataclasses.dataclass(frozen=True)
class CurveletTransform(_SpectralStackMixin):
    """Fast discrete curvelet frame (reference CURVELET kind via curvelops→
    CurveLab, cube_POCS_interpolation_3D.py:277-286, POCS.py:530-607).

    Round 1 stubbed this to SHEARLET; ops/curvelet.py now provides the real
    frame: CurveLab wrapping geometry (dyadic concentric-square coronae ×
    parabolic angle doubling, isotropic wavelet finest ring by default) as
    an exactly tight undecimated frame. Subbands ride axis -3 like the
    shearlet basis; thresholds are per-wedge (the reference thresholds
    curvelet coefficients per struct entry, POCS.py:585-607)."""

    nbscales: int | None = None
    nbangles_coarse: int = 16
    allcurvelets: bool = False
    precision: str = "highest"
    # matmul precision for the support-cropped box-group stages only
    # (None = same as `precision`); see ops/shearlet.pocs_subband_apply
    box_precision: str | None = None
    kind: str = "CURVELET"

    def _plan(self, h, w):
        from ..ops import curvelet as cv

        return cv.curvelet_plan(h, w, self.nbscales, self.nbangles_coarse,
                                self.allcurvelets)

    def forward(self, z: Cplx) -> Cplx:
        from ..ops import shearlet as sh

        return sh.shearlet_transform_planned(
            z, self._plan(z.shape[-2], z.shape[-1]),
            precision=_resolve_precision(self.precision))

    def inverse(self, coeffs: Cplx) -> Cplx:
        from ..ops import shearlet as sh

        return sh.inverse_shearlet_transform_planned(
            coeffs, self._plan(coeffs.shape[-2], coeffs.shape[-1]),
            precision=_resolve_precision(self.precision))

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        if isinstance(p_min, str):
            raise ValueError(
                "p_min='adaptive' is shearlet-specific (reference "
                "functions/POCS.py:302-324); use a numeric p_min for CURVELET"
            )
        return decay_ops.threshold_decay(
            coeffs.abs(), model, niter, p_max=p_max, p_min=p_min,
            kind=decay_kind,
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        # t: (..., L) per-wedge thresholds
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)

    def decay_from_input(self, z: Cplx, model, niter, p_max, p_min,
                         decay_kind):
        """Streamed decay derivation (see ShearletTransform); per-wedge
        numeric p_min only — 'adaptive' raises like :meth:`decay`."""
        if isinstance(p_min, str):
            raise ValueError(
                "p_min='adaptive' is shearlet-specific (reference "
                "functions/POCS.py:302-324); use a numeric p_min for CURVELET"
            )
        if self._needs_full_forward(model, decay_kind):
            return self.decay(self.forward(z), model, niter, p_max, p_min,
                              decay_kind)
        amax, _ = self._streamed_stats(z)
        return decay_ops.schedule(model, niter, p_max * amax, p_min * amax)


@dataclasses.dataclass(frozen=True)
class DecimatedCurveletTransform:
    """CurveLab-memory-parity curvelet: wrapped/decimated coefficients.

    The default :class:`CurveletTransform` keeps full H×W resolution per
    wedge (undecimated tight frame — documented deviation from CurveLab's
    fdct_wrapping, whose coefficients live on wrapped grids ~the wedge
    support size; reference cube_POCS_interpolation_3D.py:277-286). This
    variant matches CurveLab's coefficient STORAGE: each band's
    coefficients are the plain ifft2 on its own (padded) support grid —
    2.8× / 3.6× fewer coefficient elements at 512²/1024²
    (ops/curvelet.py decimated section; exact perfect reconstruction).
    Select with ``decimated: true`` in the transform options. Runs the
    generic XLA solve branch (per-band wrapped thresholding is a
    different — CurveLab-conventional — nonlinearity from the undecimated
    full-grid threshold, so the streamed/fused directional paths do not
    apply); intended for coefficient-storage-bound workflows, not peak
    throughput.
    """

    nbscales: int | None = None
    nbangles_coarse: int = 16
    allcurvelets: bool = False
    precision: str = "highest"
    shape: tuple | None = None  # bound by with_shape (the solver calls it)
    kind: str = "CURVELET"
    decimated: bool = True

    def with_shape(self, shape):
        return dataclasses.replace(
            self, shape=(int(shape[-2]), int(shape[-1])))

    def _layout(self, h, w):
        from ..ops import curvelet as cv

        return cv.decimated_layout(h, w, self.nbscales,
                                   self.nbangles_coarse, self.allcurvelets)

    def forward(self, z: Cplx):
        from ..ops import curvelet as cv

        return cv.decimated_forward(
            z, self._layout(z.shape[-2], z.shape[-1]),
            _resolve_precision(self.precision))

    def inverse(self, coeffs):
        from ..ops import curvelet as cv

        if self.shape is None:
            raise ValueError("DecimatedCurveletTransform.inverse needs the "
                             "slice shape — call with_shape first (the "
                             "solver does)")
        h, w = self.shape
        return cv.decimated_inverse(coeffs, self._layout(h, w), h, w,
                                    _resolve_precision(self.precision))

    def threshold(self, coeffs, t, op: str):
        # t: (..., L) per-band thresholds in plan band order
        return [threshold_ops.threshold_pair(c, t[..., l, None, None],
                                             kind=op)
                for l, c in enumerate(coeffs)]

    def decay(self, coeffs, model, niter, p_max, p_min, decay_kind):
        if isinstance(p_min, str):
            raise ValueError(
                "p_min='adaptive' is shearlet-specific (reference "
                "functions/POCS.py:302-324); use a numeric p_min for "
                "CURVELET")
        if model == "data-driven":
            raise ValueError(
                "data-driven decay needs the full coefficient distribution "
                "— unsupported for the decimated curvelet representation; "
                "use the default (undecimated) CURVELET transform")
        # per-band maxima drive the same decay law as the stacked
        # transform; the (1, 1) trailing axes satisfy threshold_decay's
        # (..., H, W) reduction contract
        mags = jnp.stack([c.abs().max(axis=(-2, -1)) for c in coeffs],
                         axis=-1)
        return decay_ops.threshold_decay(
            mags[..., None, None], model, niter, p_max=p_max, p_min=p_min,
            kind=decay_kind)


_REGISTRY = {}


def register_transform(name: str, factory) -> None:
    """Register a transform factory under an (upper-case) kind name."""
    _REGISTRY[name.upper()] = factory


register_transform("FFT", lambda precision="highest", **kw: FFTTransform(precision=precision))
register_transform("DCT", lambda precision="highest", **kw: DCTTransform(precision=precision))
register_transform(
    "WAVELET",
    lambda wavelet="db4", level=None, precision=None, **kw: WaveletTransform(
        wavelet=wavelet, level=level, precision=precision),
)
register_transform(
    "SHEARLET",
    lambda n_scales=None, precision="highest", box_precision=None,
    **kw: ShearletTransform(
        n_scales=n_scales, precision=precision, box_precision=box_precision),
)


def _curvelet_factory(nbscales=None, nbangles_coarse=16, allcurvelets=False,
                      precision="highest", box_precision=None,
                      decimated=False, **kw):
    if decimated:
        if box_precision is not None:
            raise ValueError(
                "box_precision does not apply to decimated=True: EVERY "
                "band is a wrapped/support-cropped grid there — set "
                "'precision' (uniform) instead")
        return DecimatedCurveletTransform(
            nbscales=nbscales, nbangles_coarse=nbangles_coarse,
            allcurvelets=allcurvelets, precision=precision)
    return CurveletTransform(
        nbscales=nbscales, nbangles_coarse=nbangles_coarse,
        allcurvelets=allcurvelets, precision=precision,
        box_precision=box_precision)


register_transform("CURVELET", _curvelet_factory)


# the union of constructor options across all built-in bases: a config may
# carry options for a basis other than the selected one (one YAML reused
# across runs), so factories tolerate THESE via **kw — but anything outside
# the set is a typo (e.g. 'nscales', 'precison') and must fail loudly, not
# silently configure the solver's quality levers to defaults.
# pipeline/pocs.py filters YAML extras with this same tuple.
TRANSFORM_OPTION_KEYS = ("wavelet", "level", "n_scales", "precision",
                         "box_precision",
                         "nbscales", "nbangles_coarse", "allcurvelets",
                         "decimated")


def get_transform(kind: str, **kwargs):
    """Build a transform by reference kind name (FFT/DCT/WAVELET/SHEARLET/CURVELET)."""
    kind = kind.upper()
    if kind not in _REGISTRY:
        raise ValueError(
            f"Unsupported transform {kind!r}; available: {sorted(_REGISTRY)}"
        )
    unknown = set(kwargs) - set(TRANSFORM_OPTION_KEYS)
    if unknown and kind in ("FFT", "DCT", "WAVELET", "SHEARLET", "CURVELET"):
        raise TypeError(
            f"unknown transform option(s) for {kind}: {sorted(unknown)}; "
            f"recognized: {sorted(TRANSFORM_OPTION_KEYS)}")
    return _REGISTRY[kind](**kwargs)
