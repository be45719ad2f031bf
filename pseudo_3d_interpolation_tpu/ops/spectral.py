"""Time <-> frequency transform stage with physical (xrft-style) scaling.

replaces: the xrft-fork usage of the reference's cube FFT/IFFT steps
(cube_apply_FFT.py:240-254, cube_apply_IFFT.py:83-94) with explicit
true-amplitude / true-phase semantics over the matmul-DFT core:

    X(f) = dt · exp(-2πi f t0) · Σ_t x[t] e^{-2πi f t Δ}      (forward)

so spectra are physically scaled (units · s) and phased relative to the real
TWT coordinate origin — making outputs interchangeable regardless of the
trace start time. Inverse exactly undoes the scaling.

Also provides the Hanning-edged frequency window filter and the
"drop filtered frequencies" bookkeeping (store nfft, keep only the passband
bins; reference cube_apply_FFT.py:49-143, 281-287).

Layout: frequency/time on the **last** axis, batched leading axes. For the
cube pipeline the driver transposes (twt, il, xl) blocks accordingly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import dft
from .cplx import Cplx


class Spectrum(NamedTuple):
    """Frequency-domain data + the metadata needed to invert it."""

    data: Cplx  # (..., nbins)
    freqs: np.ndarray  # (nbins,) Hz
    nfft: int  # transform length (after upsampling)
    n_time: int  # original number of time samples
    t0: float  # first TWT value (s)
    dt: float  # sample interval (s)
    real: bool  # rfft (True) or full fft (False)


def forward_fft(
    x,
    twt,
    real: bool = True,
    upsample: int = 1,
    precision=dft.Precision.HIGHEST,
) -> Spectrum:
    """Forward FFT along the last (time) axis with true amplitude+phase.

    ``upsample`` zero-pads the time axis by an integer factor for a finer
    frequency sampling (reference ``--upsampling-factor``). Odd-length time
    axes are truncated by one sample first (reference cube_apply_FFT.py:224-233).
    """
    is_pair = isinstance(x, Cplx)
    if not is_pair:
        x = jnp.asarray(x)
    twt = np.asarray(twt, np.float64)
    n = x.shape[-1]
    if n % 2 != 0:
        x = x[..., : n - 1]
        twt = twt[: n - 1]
        n -= 1
    dt = float(np.mean(np.diff(twt)))
    t0 = float(twt[0])
    if int(upsample) != upsample or int(upsample) < 1:
        raise ValueError(
            f"upsample must be a positive integer factor, got {upsample!r} "
            "(the spectrum length is an integer multiple of the input)")
    nfft = int(upsample) * n

    if real:
        if is_pair:
            raise ValueError("real=True expects a real array, not a Cplx pair")
        spec = dft.rfft1(x, axis=-1, n=nfft, precision=precision)
        freqs = np.fft.rfftfreq(nfft, dt)
    else:
        z = x if is_pair else Cplx(x, jnp.zeros_like(x))
        if nfft != n:
            pad = [(0, 0)] * (z.re.ndim - 1) + [(0, nfft - n)]
            z = Cplx(jnp.pad(z.re, pad), jnp.pad(z.im, pad))
        spec = dft.fft1(z, axis=-1, precision=precision)
        freqs = np.fft.fftfreq(nfft, dt)

    # true amplitude (× dt) and true phase (× e^{-2πi f t0}) in one rotation
    ang = -2.0 * np.pi * freqs * t0
    rot = Cplx(jnp.asarray(np.cos(ang) * dt, jnp.float32),
               jnp.asarray(np.sin(ang) * dt, jnp.float32))
    spec = spec * rot
    return Spectrum(spec, freqs, nfft, n, t0, dt, real)


def inverse_fft(spec: Spectrum, precision=dft.Precision.HIGHEST,
                full_complex: bool = False):
    """Invert :func:`forward_fft`; returns (twt, x) for the upsampled grid.

    Handles spectra whose high-frequency bins were dropped
    (``drop filtered frequencies``): missing bins are zero-padded back to
    ``nfft`` before inversion.

    By default ``x`` is the REAL part — every reference cube variable
    (amp/env) is a real signal, matching cube_apply_IFFT.py. A full-fft
    spectrum built from a genuinely complex time series loses its imaginary
    part under that default; pass ``full_complex=True`` to get the Cplx
    pair back instead.
    """
    freqs = spec.freqs
    ang = 2.0 * np.pi * freqs * spec.t0
    inv_dt = 1.0 / spec.dt
    rot = Cplx(jnp.asarray(np.cos(ang) * inv_dt, jnp.float32),
               jnp.asarray(np.sin(ang) * inv_dt, jnp.float32))
    z = spec.data * rot

    nfft = spec.nfft
    if spec.real:
        nbins_full = nfft // 2 + 1
        missing = nbins_full - z.shape[-1]
        if missing > 0:
            pad = [(0, 0)] * (z.re.ndim - 1) + [(0, missing)]
            z = Cplx(jnp.pad(z.re, pad), jnp.pad(z.im, pad))
        x = dft.irfft1(z, n=nfft, axis=-1, precision=precision)
    else:
        xc = dft.ifft1(z, axis=-1, precision=precision)
        x = xc if full_complex else xc.re

    # time-axis zero-padding (spectrum upsampling) leaves dt unchanged: the
    # inverse returns nfft samples on the original grid, of which the first
    # n_time are the signal (the rest reconstruct the zero pad)
    twt = spec.t0 + np.arange(nfft) * spec.dt
    return twt, x


def inverse_fft_original(spec: Spectrum, precision=dft.Precision.HIGHEST):
    """Like :func:`inverse_fft` but truncated to the original time axis."""
    twt, x = inverse_fft(spec, precision=precision)
    return twt[: spec.n_time], x[..., : spec.n_time]


# ---------------------------------------------------------------------------
# frequency-domain window filter (reference: cube_apply_FFT.py:49-143)
# ---------------------------------------------------------------------------
def _ramp_down(f, fmin, fmax):
    """Hanning-shaped 1->0 taper over [fmin, fmax] as a function of f."""
    t = np.clip((f - fmin) / max(fmax - fmin, 1e-30), 0.0, 1.0)
    w = np.cos(0.5 * np.pi * t) ** 2
    # exact pass/stop values outside the taper band
    return np.where(f <= fmin, 1.0, np.where(f >= fmax, 0.0, w))


def freq_filter_window(freqs, filter_freqs, filter_type: str = "lowpass") -> np.ndarray:
    """Hanning-edged low/high/bandpass window over the frequency coordinate.

    ``filter_freqs`` = [fmin, fmax] (taper band) for low/highpass, or
    [f1, f2, f3, f4] for bandpass. Returns values in [0, 1] to multiply the
    spectrum with. The weight is a function of |frequency| (cos² Hanning
    ramps), so it is correct for any bin ordering — including full-fft
    ``fftfreq`` layouts with negative bins — and preserves Hermitian
    symmetry. (The reference counts bin positions, which assumes ascending
    rfft frequencies; equivalent here on that layout.)
    """
    af = np.abs(np.asarray(freqs, np.float64))
    if filter_type == "lowpass":
        fmin, fmax = min(filter_freqs), max(filter_freqs)
        win = _ramp_down(af, fmin, fmax)
    elif filter_type == "highpass":
        fmin, fmax = min(filter_freqs), max(filter_freqs)
        win = 1.0 - _ramp_down(af, fmin, fmax)
    elif filter_type == "bandpass":
        f1, f2, f3, f4 = sorted(filter_freqs)
        win = (1.0 - _ramp_down(af, f1, f2)) * _ramp_down(af, f3, f4)
    else:
        raise ValueError(f"unknown filter_type {filter_type!r}")
    return win.astype(np.float32)


def apply_freq_filter(spec: Spectrum, filter_freqs, filter_type: str = "lowpass",
                      drop_filtered: bool = False) -> Spectrum:
    """Multiply the spectrum by the window; optionally drop stop-band bins.

    Dropping is only meaningful for lowpass (contiguous passband from DC);
    the original ``nfft`` stays recorded in the Spectrum so
    :func:`inverse_fft` can reconstruct (reference cube_apply_FFT.py:281-287).
    """
    win = freq_filter_window(spec.freqs, filter_freqs, filter_type)
    w = jnp.asarray(win)
    data = Cplx(spec.data.re * w, spec.data.im * w)
    freqs = spec.freqs
    if drop_filtered:
        if filter_type != "lowpass":
            raise ValueError("drop_filtered only supported for lowpass filters")
        if not spec.real:
            raise ValueError(
                "drop_filtered requires the rfft layout (real=True); "
                "full-fft bins are not contiguous in |frequency|"
            )
        fmax = max(filter_freqs)
        keep = int(np.count_nonzero(spec.freqs <= fmax))
        data = Cplx(data.re[..., :keep], data.im[..., :keep])
        freqs = spec.freqs[:keep]
    return Spectrum(data, freqs, spec.nfft, spec.n_time, spec.t0, spec.dt, spec.real)
