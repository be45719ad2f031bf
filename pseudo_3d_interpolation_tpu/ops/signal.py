"""Trace conditioning: gain (Seismic-Unix ``sugain`` semantics), AGC,
balancing, RMS utilities, Hilbert envelope, frequency spectra, resampling.

reference: pseudo_3D_interpolation/functions/signal.py:96-773. TPU re-design
notes:

- Time axis is the **last** axis throughout (batched leading axes); callers
  transpose once at the boundary instead of threading ``axis`` through every
  op. Thin ``axis=`` shims are provided where the reference API exposes them.
- AGC's sliding statistics use convolution (rms/mean) or an unfolded window
  gather (median) instead of numpy stride tricks — both XLA-friendly.
- The Hilbert transform is built from the matmul-DFT pair (ops/dft.py), since
  the TPU backend has no native complex FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import dft
from .cplx import Cplx


# ---------------------------------------------------------------------------
# RMS helpers (reference: functions/signal.py:477-536)
# ---------------------------------------------------------------------------
def rms(x, axis=None):
    """Root-mean-square amplitude over ``axis`` (None = whole array)."""
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.mean(x * x, axis=axis))


def rms_normalization(x, axis=None):
    """Divide by RMS amplitude (zero RMS left unscaled)."""
    x = jnp.asarray(x)
    r = rms(x, axis=axis)
    r = jnp.where(r == 0.0, 1.0, r)
    if axis is not None and x.ndim > 0:
        r = jnp.expand_dims(r, axis=axis)
    return x / r


def calc_reference_amplitude(x, axis=None, scale: str = "rms"):
    """Per-trace reference amplitude, ``rms`` or ``peak``/``max``
    (reference: functions/signal.py:642-669)."""
    x = jnp.asarray(x)
    if scale == "rms":
        ref = rms(x, axis=axis)
    elif scale in ("peak", "max"):
        ref = jnp.max(jnp.abs(x), axis=axis)
    else:
        raise ValueError(f"unknown scale {scale!r}")
    return jnp.where(ref == 0.0, 1.0, ref)


# ---------------------------------------------------------------------------
# AGC (reference: functions/signal.py:300-409)
# ---------------------------------------------------------------------------
def agc_window_samples(win_sec: float, dt: float) -> int:
    """Window length seconds -> odd sample count (reference :300-320)."""
    n = int(win_sec / dt)
    return n + 1 if n % 2 == 0 else n


def _unfold_last_same(x, win: int):
    """(..., T) -> (..., T, win) sliding windows after symmetric zero-pad."""
    npad = win // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(npad, npad)])
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(win)[None, :]
    return xp[..., idx]


def agc(x, win: int, kind: str = "rms", squared: bool = False,
        return_gain: bool = False):
    """Automatic gain control along the last axis.

    ``win`` is in samples (odd; even is bumped +1 like the reference). The
    gain is the centered moving rms/mean/median; zero gain cells pass
    through unscaled.
    """
    x = jnp.asarray(x)
    win = int(win) + 1 if int(win) % 2 == 0 else int(win)
    if kind == "rms":
        # moving mean of x^2 via uniform convolution — O(T·win) VPU work,
        # fused by XLA; equivalent to the reference's stride-trick windows
        kernel = jnp.full((win,), 1.0 / win, x.dtype)
        g = jnp.sqrt(_conv_same(x * x, kernel))
    elif kind == "mean":
        kernel = jnp.full((win,), 1.0 / win, x.dtype)
        g = _conv_same(x, kernel)
    elif kind == "median":
        g = jnp.median(_unfold_last_same(x, win), axis=-1)
    else:
        raise ValueError(f"Unknown AGC kind {kind!r}")
    g = jnp.where(g == 0.0, 1.0, g)
    out = x / g
    if squared:
        out = jnp.sign(out) * out * out
    if return_gain:
        return out, g
    return out


def _conv_same(x, kernel):
    """'same' 1D convolution along the last axis via XLA conv."""
    t = x.shape[-1]
    k = kernel.shape[0]
    xf = x.reshape((-1, 1, t))
    out = jax.lax.conv_general_dilated(
        xf, kernel.reshape((1, 1, k)),
        window_strides=(1,), padding=[(k // 2, k - 1 - k // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Programmed gain control (reference: functions/signal.py:428-474)
# ---------------------------------------------------------------------------
def programmed_gain_control(twt, twt_gain: dict):
    """Linear-interpolated gain curve through {TWT: gain} control points.

    Control points snap to the nearest TWT sample (reference behavior);
    ends extend the first/last gain value. Host-side helper (small 1D).
    """
    twt = np.asarray(twt)
    keys = np.asarray(list(twt_gain.keys()), float)
    order = np.argsort(keys)
    keys, gains = keys[order], np.asarray(list(twt_gain.values()), float)[order]
    idx = np.abs(twt[:, None] - keys[None, :]).argmin(0)
    g = np.full(twt.shape, np.nan, np.float32)
    g[idx] = gains
    if np.isnan(g[0]):
        g[0] = gains[0]
    if np.isnan(g[-1]):
        g[-1] = gains[-1]
    nan = np.isnan(g)
    g[nan] = np.interp(np.nonzero(nan)[0], np.nonzero(~nan)[0], g[~nan])
    return jnp.asarray(g)


# ---------------------------------------------------------------------------
# gain() — sugain port (reference: functions/signal.py:96-299)
# ---------------------------------------------------------------------------
def gain(
    data,
    twt,
    tpow: float = 0.0,
    epow: float = 0.0,
    etpow: float = 1.0,
    ebase: float | None = None,
    gpow: float = 0.0,
    agc_: bool = False,
    agc_win: float = 0.05,
    agc_kind: str = "rms",
    agc_sqrt: bool = False,
    clip=None,
    pclip=None,
    nclip=None,
    qclip=None,
    linear=None,
    pgc: dict | None = None,
    bias=None,
    scale: float = 1.0,
    norm: bool = False,
    norm_rms: bool = False,
):
    """Seismic-Unix style composite gain along the **last** (time) axis.

    Application order matches the reference exactly: bias -> tpow -> epow
    (with etpow/ebase) -> gpow -> AGC -> clip -> pclip -> nclip -> qclip ->
    linear -> PGC -> norm_rms -> scale (or 1/scale when ``norm``).
    """
    data = jnp.asarray(data)
    # keep a host copy for the PGC/AGC metadata paths: jnp.asarray's dtype
    # conversion yields a tracer under jit even for closed-over constants
    twt_host = np.asarray(twt) if not isinstance(twt, jax.core.Tracer) else None
    twt = jnp.asarray(twt)
    t = twt.reshape((1,) * (data.ndim - 1) + (-1,))

    if bias is not None and bias != 0.0:
        data = data + bias

    if tpow:
        tf = jnp.power(t, tpow)
        # guard t=0 -> 0 gain (reference zeroes the first sample when twt[0]==0)
        tf = jnp.where(t == 0.0, 0.0, tf)
        data = data * tf

    if epow:
        etf = jnp.power(t, etpow)
        ef = jnp.power(ebase, epow * etf) if ebase is not None else jnp.exp(epow * etf)
        data = data * ef

    if gpow:
        data = jnp.sign(data) * jnp.abs(data) ** gpow

    if agc_:
        if twt_host is None:
            raise ValueError("gain(agc_=True) under jit requires a concrete twt")
        dt = float(np.round(float(np.mean(np.diff(twt_host))) * 1e9) / 1e9)
        data = agc(data, agc_window_samples(agc_win, dt), kind=agc_kind, squared=agc_sqrt)

    if clip is not None:
        data = jnp.where(jnp.abs(data) > clip, clip * jnp.sign(data), data)
    if pclip is not None:
        data = jnp.minimum(data, pclip)
    if nclip is not None:
        data = jnp.maximum(data, nclip)
    if qclip is not None:
        q = jnp.quantile(jnp.abs(data), qclip, axis=-1, keepdims=True)
        data = jnp.where(jnp.abs(data) > q, q * jnp.sign(data), data)

    if linear is not None:
        g = jnp.linspace(min(linear), max(linear), twt.size)
        data = data * g.reshape(t.shape)

    if isinstance(pgc, dict):
        if twt_host is None:
            raise ValueError("gain(pgc=...) under jit requires a concrete twt")
        g = programmed_gain_control(twt_host, pgc)
        data = data * g.reshape(t.shape)

    if norm_rms:
        data = rms_normalization(data, axis=-1)

    if scale is not None and scale != 1.0:
        data = data * (1.0 / scale) if norm else data * scale

    return data


# ---------------------------------------------------------------------------
# trace balancing (reference: functions/signal.py:539-639)
# ---------------------------------------------------------------------------
def balance_traces(traces, scale: str = "rms", n_traces: int | None = None):
    """Balance traces by a per-trace (or trace-windowed) reference amplitude.

    Layout: (..., ntraces, nsamples) — the reference amplitude reduces the
    sample axis; ``n_traces`` > 1 additionally pools a centered window of
    neighboring traces (reference pads with zeros, as does this).
    """
    traces = jnp.asarray(traces)
    scale = scale.lower()
    if scale not in ("rms", "max", "peak", "mean", "median"):
        raise ValueError("scale must be rms/peak/max/mean/median")

    def _stat(x, axis):
        if scale == "rms":
            return rms(x, axis=axis)
        if scale in ("peak", "max"):
            return jnp.max(jnp.abs(x), axis=axis)
        if scale == "mean":
            return jnp.mean(jnp.abs(x), axis=axis)
        return jnp.median(jnp.abs(x), axis=axis)

    if n_traces is None or n_traces == 1:
        ref = _stat(traces, axis=-1)[..., None]
    else:
        w = int(n_traces) + 1 if int(n_traces) % 2 == 0 else int(n_traces)
        # unfold over the trace axis: (..., ntr, nsamp) -> (..., ntr, w, nsamp)
        x = jnp.moveaxis(traces, -1, -2)  # (..., nsamp, ntr)
        win = _unfold_last_same(x, w)  # (..., nsamp, ntr, w)
        win = jnp.moveaxis(win, -3, -1)  # (..., ntr, w, nsamp)
        ref = _stat(win, axis=(-2, -1))[..., None]
    ref = jnp.where(ref == 0.0, 1.0, ref)
    return traces / ref


# ---------------------------------------------------------------------------
# Hilbert envelope (reference: functions/signal.py:672-690)
# ---------------------------------------------------------------------------
def envelope(x, precision=dft.Precision.HIGHEST):
    """Amplitude envelope |analytic signal| along the last axis.

    Analytic signal via the DFT pair: A = IFFT(FFT(x)·h) with the one-sided
    doubling window h — equivalent to ``scipy.signal.hilbert``.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    z = Cplx(x, jnp.zeros_like(x))
    zf = dft.fft1(z, axis=-1, precision=precision)
    h = np.zeros((n,), np.float32)
    h[0] = 1.0
    if n % 2 == 0:
        h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[1 : (n + 1) // 2] = 2.0
    hw = jnp.asarray(h)
    za = dft.ifft1(Cplx(zf.re * hw, zf.im * hw), axis=-1, precision=precision)
    return za.abs().astype(x.dtype)


# ---------------------------------------------------------------------------
# resampling (reference: cube_preprocessing_3D.py:274-336, signal.py:693-712)
# ---------------------------------------------------------------------------
def resample_fft(x, n_out: int, precision=dft.Precision.HIGHEST):
    """Fourier resampling of the last axis to ``n_out`` samples
    (equivalent to ``scipy.signal.resample``): rfft -> truncate/zero-pad the
    spectrum -> irfft, scaled by ``n_out/n_in``."""
    x = jnp.asarray(x)
    n_in = x.shape[-1]
    spec = dft.rfft1(x, axis=-1, precision=precision)
    nb_in = n_in // 2 + 1
    nb_out = n_out // 2 + 1
    # branch on the SAMPLE counts, not the bin counts: odd<->even changes of
    # one sample tie the bin counts (11 -> 10 both have 6) yet still need
    # scipy's Nyquist-bin handling
    if n_out < n_in:
        re = spec.re[..., :nb_out]
        im = spec.im[..., :nb_out]
        # scipy convention: new even-length Nyquist bin folds its mirror in
        # (2·Re), imaginary part dropped
        if n_out % 2 == 0:
            re = re.at[..., -1].mul(2.0)
            im = im.at[..., -1].set(0.0)
    elif n_out > n_in:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nb_out - nb_in)]
        re = jnp.pad(spec.re, pad)
        im = jnp.pad(spec.im, pad)
        if n_in % 2 == 0:
            # scipy convention: split the original Nyquist bin when upsampling
            re = re.at[..., nb_in - 1].mul(0.5)
            im = im.at[..., nb_in - 1].mul(0.5)
    else:
        re, im = spec.re, spec.im
    out = dft.irfft1(Cplx(re, im), n=n_out, axis=-1, precision=precision)
    return out * (n_out / n_in)


def resampled_twt(twt, n_resamples: int, n_samples: int):
    """New TWT coordinate after resampling (reference: signal.py:693-712)."""
    twt = np.asarray(twt)
    return np.arange(n_resamples) * (twt[1] - twt[0]) * n_samples / float(n_resamples) + twt[0]


# ---------------------------------------------------------------------------
# frequency spectrum (reference: functions/signal.py:715-773)
# ---------------------------------------------------------------------------
def freq_spectrum(signal, fs: float, n: int | None = None, taper: bool = True,
                  return_minmax: bool = False):
    """Single-sided magnitude spectrum with optional Blackman taper.

    Returns (frequencies, normalized magnitudes); magnitudes scaled by
    ``2 / sum(window)`` like the reference. ``return_minmax`` additionally
    estimates the signal band via a slope-derived amplitude threshold
    (reference signal.py:754-770) -> (f, a, f_min, f_max).
    """
    signal = jnp.asarray(signal)
    n_sig = signal.shape[-1]
    win = jnp.asarray(np.blackman(n_sig).astype(np.float32)) if taper else jnp.ones((n_sig,), jnp.float32)
    s = signal * win
    n = n_sig if n is None else int(n)
    spec = dft.rfft1(s, axis=-1, n=n)
    a = spec.abs()
    f = np.fft.rfftfreq(n, 1.0 / fs)
    a_norm = a * 2.0 / jnp.sum(win)
    if not return_minmax:
        return jnp.asarray(f), a_norm
    a_np = np.asarray(a_norm)
    if a_np.ndim > 1:
        a_np = a_np.mean(axis=tuple(range(a_np.ndim - 1)))
    slope = np.abs(np.diff(a_np) / np.diff(f))
    threshold = (slope.max() - slope.min()) * 0.001
    limits = np.nonzero(a_np > threshold)[0]
    f_min = float(f[limits[0]]) if limits.size else 0.0
    f_max = float(f[limits[-1]]) if limits.size else float(f[-1])
    return jnp.asarray(f), a_norm, f_min, f_max
