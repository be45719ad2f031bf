"""Windowed statistics, outlier filters, horizon detection, Butterworth.

reference: pseudo_3D_interpolation/functions/filter.py. Split by hardware
affinity:

- **Device (JAX, batched, time-last):** STA/LTA ratio, moving mean/median,
  zero-phase Butterworth application (frequency-domain |H|² via the matmul
  rfft — the TPU-native equivalent of ``sosfiltfilt``'s forward-backward
  pass), polynomial de/trend.
- **Host (numpy):** the per-profile 1D horizon chains — MAD variants,
  smooth-with-extrapolated-edges, outlier index filters, outlier-interp,
  seafloor pick post-processing. These operate on (ntraces,) metadata
  arrays where numpy is the right tool; only the STA/LTA image runs on
  device.
"""

from __future__ import annotations

import numpy as np
import scipy.interpolate
import scipy.signal

import jax
import jax.numpy as jnp

from .cplx import Cplx
from . import dft


# ===========================================================================
# Device ops (jit-compatible, time on last axis)
# ===========================================================================
def sta_lta(a, nsta: int, nlta: int):
    """STA/LTA energy ratio along the last axis (batched).

    Classic trigger of Withers et al. (1998) as in the reference
    (functions/filter.py:511-570): running mean of a² over short and long
    trailing windows via cumulative sums; the first ``nlta-1`` samples of the
    STA are zeroed; zero LTA yields zero ratio.
    """
    a = jnp.asarray(a)
    cs = jnp.cumsum(a * a, axis=-1)
    sta = cs.at[..., nsta:].add(-cs[..., :-nsta]) / nsta
    lta = cs.at[..., nlta:].add(-cs[..., :-nlta]) / nlta
    sta = sta.at[..., : nlta - 1].set(0.0)
    return jnp.where(lta != 0, sta / jnp.where(lta == 0, 1.0, lta), 0.0)


# module-level jit so same-shape calls across files reuse the compiled
# executable (a per-call jax.jit wrapper would recompile every time)
_sta_lta_jit = jax.jit(sta_lta, static_argnums=(1, 2))


def moving_average(a, win: int = 3):
    """Trailing moving average, 'valid' length (reference filter.py:42-66)."""
    a = jnp.asarray(a)
    cs = jnp.cumsum(a, axis=-1)
    out = cs.at[..., win:].add(-cs[..., :-win])
    return out[..., win - 1 :] / win


def _unfold_last_valid(x, win: int):
    idx = jnp.arange(x.shape[-1] - win + 1)[:, None] + jnp.arange(win)[None, :]
    return x[..., idx]


def moving_median(a, win: int = 3, padded: bool = False):
    """Centered moving median; optional odd-symmetric edge padding
    (reference filter.py:89-113 + pad_array). ``win`` should be odd when
    ``padded`` so the output keeps the input length."""
    from ..utils.pad import pad_mirror_flip

    a = jnp.asarray(a)
    if padded:
        if a.ndim != 1:
            raise ValueError("padded moving_median expects a 1D array")
        a = pad_mirror_flip(a, (win - 1) // 2)
    return jnp.median(_unfold_last_valid(a, win), axis=-1)


def polynomial_filter(data, order: int = 3, kind: str = "high"):
    """Remove (``high``) or keep (``low``) a polynomial trend along the last
    axis (reference filter.py:370-400). Batched least squares via matmul."""
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[-1]
    x = jnp.arange(n, dtype=jnp.float32)
    # Vandermonde (n, order+1), scaled for conditioning
    v = jnp.stack([(x / n) ** k for k in range(order + 1)], axis=-1)
    coef, *_ = jnp.linalg.lstsq(v, jnp.moveaxis(data, -1, 0).reshape(n, -1))
    fit = (v @ coef).reshape((n,) + data.shape[:-1])
    fit = jnp.moveaxis(fit, 0, -1)
    if kind == "high":
        return data - fit
    if kind == "low":
        return fit
    raise ValueError(f"filter kind {kind!r} is not available")


def butterworth_apply_spectral(x, sos, precision=dft.Precision.HIGHEST):
    """Zero-phase Butterworth along the last axis, TPU path.

    Applies ``|H(f)|²`` (the magnitude response of one forward+backward SOS
    pass — what ``sosfiltfilt`` realizes, minus its edge-padding transients)
    multiplicatively in the rfft domain. ``sos`` comes from
    :func:`butterworth_design` on host.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    # odd-extension edge padding (like filtfilt) so the circular FFT
    # application doesn't ring at the trace ends
    pad = min(n - 1, 3 * (2 * np.asarray(sos).shape[0] * 2 + 1))
    left = 2.0 * x[..., :1] - x[..., pad:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -pad - 2 : -1]
    xp = jnp.concatenate([left, x, right], axis=-1)
    np_ = xp.shape[-1]
    # |H|^2 at the exact rfft bin frequencies, computed host-side
    w_bins = 2.0 * np.pi * np.arange(np_ // 2 + 1) / np_
    w, h = scipy.signal.sosfreqz(np.asarray(sos), worN=w_bins)
    h2 = jnp.asarray((np.abs(h) ** 2).astype(np.float32))
    spec = dft.rfft1(xp, axis=-1, precision=precision)
    out = dft.irfft1(Cplx(spec.re * h2, spec.im * h2), n=np_, axis=-1, precision=precision)
    return out[..., pad : pad + n]


# ===========================================================================
# Host-side filter design + exact filtfilt (reference filter.py:757-873)
# ===========================================================================
def butterworth_design(btype: str, cutoff, fs: float, order: int = 9):
    """Butterworth SOS coefficients (host-side scipy design)."""
    if btype not in ("lowpass", "highpass", "bandpass"):
        raise ValueError("btype must be lowpass, highpass, or bandpass")
    nyq = fs / 2.0
    return scipy.signal.butter(order, np.asarray(cutoff) / nyq, btype=btype, output="sos")


def butterworth_filter(data, btype: str, cutoff, fs: float, order: int = 9, axis: int = -1):
    """Exact zero-phase Butterworth via ``sosfiltfilt`` (host path, parity
    with the reference)."""
    sos = butterworth_design(btype, cutoff, fs, order)
    return scipy.signal.sosfiltfilt(sos, np.asarray(data), axis=axis)


def filter_frequency(data, freqs, fs: float, filter_type: str,
                     gpass: float = 1.0, gstop: float = 10.0, axis: int = -1,
                     device: bool = False):
    """Pass/stop-band specified Butterworth with auto order (``buttord``).

    ``freqs``: [f_pass, f_stop] for lowpass, [f_cut, f_stop] highpass,
    [f1, f2, f3, f4] bandpass with passband [f2, f3] and stopband beyond
    [f1, f4]. (The reference swaps wp/ws for bandpass —
    filter.py:846-849 — which specifies a bandstop; corrected here.)
    ``device=True`` applies the zero-phase response on device via
    :func:`butterworth_apply_spectral` (time must be the last axis).
    """
    if filter_type == "bandpass":
        if list(freqs) != sorted(freqs):
            raise ValueError("Invalid filter frequencies!")
        wp = [freqs[1], freqs[2]]
        ws = [freqs[0], freqs[3]]
    elif filter_type == "lowpass":
        wp, ws = freqs
        if wp > ws:
            raise ValueError("Invalid filter frequencies!")
    elif filter_type == "highpass":
        wp, ws = freqs
        if wp < ws:
            raise ValueError("Invalid filter frequencies!")
    else:
        raise ValueError(f"unknown filter_type {filter_type!r}")
    n, wn = scipy.signal.buttord(wp, ws, gpass, gstop, fs=fs)
    sos = scipy.signal.butter(n, wn, btype=filter_type, output="sos", fs=fs)
    if device:
        return butterworth_apply_spectral(data, sos)
    return scipy.signal.sosfiltfilt(sos, np.asarray(data), axis=axis)


# ===========================================================================
# Host-side 1D statistics / outlier chains
# ===========================================================================
def median_abs_deviation(x, axis=-1):
    """MAD: median(|x - median(x)|) (reference filter.py:155-175)."""
    x = np.asarray(x)
    med = np.median(x, axis=axis, keepdims=True)
    return np.median(np.abs(x - med), axis=axis)


def median_abs_deviation_double(x, axis=-1):
    """Two-sided MAD for asymmetric distributions (eurekastatistics method;
    reference filter.py:177-232). 1D: per-element left/right MAD. 2D (rows =
    windows): MAD side chosen by the window's center element."""
    x = np.asarray(x)
    if x.ndim == 1:
        med = np.median(x)
        diff = np.abs(x - med)
        left = np.median(diff[x <= med])
        right = np.median(diff[x >= med])
        if left == 0 or right == 0:
            raise ValueError("one side of median absolute deviation is zero")
        mad = np.where(x > med, right, left)
        return mad.astype(x.dtype)
    if x.ndim == 2:
        med = np.median(x, axis=axis)
        diff = np.abs(x - med[:, None])
        center_le = (x <= med[:, None])[:, x.shape[-1] // 2]
        center_ge = (x >= med[:, None])[:, x.shape[-1] // 2]
        left = np.median(diff[center_le], axis=axis)
        right = np.median(diff[center_ge], axis=axis)
        left = np.where(left == 0, 1, left)
        right = np.where(right == 0, 1, right)
        mad = np.ones((x.shape[0],), x.dtype)
        mad[center_le] = left
        mad[center_ge] = right
        return mad.astype(x.dtype)
    raise ValueError("only 1D/2D supported")


def _pad_mirror_flip_np(a, n):
    from ..utils.pad import pad_mirror_flip

    return np.asarray(pad_mirror_flip(a, n))


def smooth(data, window_len: int = 11, window: str = "hanning"):
    """Window-convolution smoothing with least-squares-extrapolated edges
    (reference filter.py:238-301)."""
    data = np.asarray(data, float)
    if data.ndim != 1:
        raise ValueError("smooth only accepts 1D arrays")
    if data.size < window_len:
        raise ValueError("input shorter than window length")
    if window_len < 3:
        return data
    window_len += 1 if window_len % 2 == 0 else 0
    wins = {"flat": np.ones, "hanning": np.hanning, "hamming": np.hamming,
            "bartlett": np.bartlett, "blackman": np.blackman}
    if window not in wins:
        raise ValueError(f"window must be one of {list(wins)}")
    half = window_len // 2
    # linear extrapolation by least squares over the edge windows
    xs = np.vstack([np.arange(half), np.ones(half)]).T
    m0, c0 = np.linalg.lstsq(xs, data[:half], rcond=None)[0]
    m1, c1 = np.linalg.lstsq(xs, data[-half:], rcond=None)[0]
    s = np.r_[np.arange(-half, 0) * m0 + c0, data, np.arange(half, half * 2) * m1 + c1]
    w = wins[window](window_len)
    return np.convolve(s, w / w.sum(), mode="valid")


def zscore_filter(data, axis=-1):
    """Indices where |z-score| > 1 (reference filter.py:304-309)."""
    data = np.asarray(data)
    z = (data - np.mean(data, axis=axis)) / np.std(data, axis=axis)
    return np.nonzero(np.abs(z) > 1)[0]


def moving_zscore_filter(data, win, axis=-1):
    """Z-score against a smoothed running mean (reference filter.py:310-317)."""
    data = np.asarray(data)
    mean = smooth(data, window_len=win, window="hanning")
    z = (data - mean) / np.std(data, axis=axis)
    return np.nonzero(np.abs(z) > 1)[0]


def iqr_filter(a, axis=-1):
    """Tukey-fence outlier indices (reference filter.py:320-329)."""
    a = np.asarray(a)
    q1, q3 = np.quantile(a, [0.25, 0.75], axis=axis)
    iqr = q3 - q1
    return np.nonzero((a < q1 - 1.5 * iqr) | (a > q3 + 1.5 * iqr))[0]


def mad_filter(a, threshold: float = 3, mad_mode: str = "single"):
    """Global MAD outlier indices (reference filter.py:332-339)."""
    a = np.asarray(a)
    med = np.median(a)
    mad = median_abs_deviation(a) if mad_mode == "single" else median_abs_deviation_double(a)
    mad = np.where(mad == 0, 1, mad)
    return np.nonzero(np.abs(a - med) / mad > threshold)[0]


def moving_mad_filter(a, win: int, threshold: float = 3, mad_mode: str = "single"):
    """Moving-window MAD outlier indices (reference filter.py:342-367)."""
    a = np.asarray(a)
    if not isinstance(win, (int, np.integer)) or win % 2 != 1:
        raise ValueError("window length must be odd integer")
    half = (win - 1) // 2
    ap = _pad_mirror_flip_np(a, half)
    windows = np.lib.stride_tricks.sliding_window_view(ap, win)
    mov_med = np.median(windows, axis=-1)
    if mad_mode == "single":
        mov_mad = median_abs_deviation(windows)
    else:
        mov_mad = median_abs_deviation_double(windows)
    mov_mad = np.where(mov_mad == 0, 1, mov_mad)
    return np.nonzero(np.abs(a - mov_med) / mov_mad > threshold)[0]


def filter_interp_1d(data, method: str = "IQR", kind: str = "cubic", win: int = 11,
                     threshold: float = 3.0, filter_boundaries: bool = True):
    """Detect outliers by ``method``, then re-interpolate across them
    (reference filter.py:403-505). Boundary runs of flagged indices are
    un-flagged to avoid extrapolation edge effects."""
    data = np.asarray(data)
    if data.ndim != 1:
        raise ValueError("data must be 1D")
    dispatch = {
        "IQR": lambda: iqr_filter(data),
        "z-score": lambda: zscore_filter(data),
        "r_z-score": lambda: moving_zscore_filter(data, win=win),
        "MAD": lambda: mad_filter(data, threshold=threshold, mad_mode="single"),
        "doubleMAD": lambda: mad_filter(data, threshold=threshold, mad_mode="double"),
        "r_doubleMAD": lambda: moving_mad_filter(data, win=win, threshold=threshold, mad_mode="double"),
        "r_singleMAD": lambda: moving_mad_filter(data, win=win, threshold=threshold, mad_mode="single"),
    }
    if method not in dispatch:
        raise ValueError(f"method must be one of {list(dispatch)}")
    idx = dispatch[method]()

    if filter_boundaries and idx.size:
        # drop runs of consecutive flags touching either end
        if idx[0] == 0:
            run = 1
            while run < idx.size and idx[run] == idx[run - 1] + 1:
                run += 1
            idx = idx[run:]
        if idx.size and idx[-1] == data.size - 1:
            run = 1
            while run < idx.size and idx[-run - 1] == idx[-run] - 1:
                run += 1
            idx = idx[:-run]

    mask = np.ones(data.size, bool)
    mask[idx] = False
    x = np.arange(data.size)
    f = scipy.interpolate.interp1d(x[mask], data[mask], kind=kind)
    return f(x)


# ===========================================================================
# Seafloor reflection detection (reference filter.py:574-751)
# ===========================================================================
def detect_seafloor_reflection(
    data,
    idx_slice_start=None,
    nsta: int | None = None,
    nlta: int | None = None,
    win: int = 30,
    threshold: float | None = None,
    win_mad: int | None = None,
    win_mad_post: int | None = None,
    win_median: int = 11,
    n: int = 5,
    post_detection_filter: bool = True,
):
    """Pick the seafloor reflection sample index per trace.

    Multi-stage chain (matching the reference): STA/LTA first-break detection
    (device) -> moving double-MAD outlier re-interpolation -> moving median ->
    per-trace peak search window picking the first significant positive
    amplitude group among the n largest -> zero-trace interpolation ->
    optional post MAD filter.

    ``data`` is (nsamples, ntraces), reference layout.
    Returns int sample indices, shape (ntraces,).
    """
    data = np.asarray(data)
    nsamples, ntraces = data.shape

    nonzero_per_trace = np.count_nonzero(data, axis=0)
    mask_nonzero = nonzero_per_trace.astype(bool)
    n_zero = ntraces - int(np.count_nonzero(mask_nonzero))
    work = data[:, mask_nonzero] if n_zero else data

    if nsta is None:
        nsta = int(np.around(nsamples * 0.001))
    if nlta is None:
        nlta = int(np.around(nsamples * 0.05))
    if nsta < 3:
        nsta, nlta = 3, 50

    # (1) STA/LTA on device; reference layout is time-first, ours time-last
    ratio = np.asarray(_sta_lta_jit(jnp.asarray(work.T), nsta, nlta)).T

    # (2) first sample exceeding the threshold (default: water-column noise)
    thr = ratio[nlta : nlta * 2, :].max() if threshold is None else threshold
    idx = np.argmax(ratio > thr, axis=0)

    if idx_slice_start is not None:
        idx = idx + idx_slice_start
        idx = np.where(
            (idx > nsamples - idx_slice_start) | (idx < idx_slice_start),
            np.median(idx), idx,
        )

    # (3) outlier removal on the picked horizon
    if win_mad is None:
        win_mad = int(idx.size * 0.02)
        win_mad += 1 if win_mad % 2 == 0 else 0
        win_mad = max(win_mad, 7)
    idx = filter_interp_1d(idx, method="r_doubleMAD", kind="cubic",
                           threshold=3, win=win_mad).astype(int)

    # (4) moving median to kill remaining spikes (window forced odd — an
    # even window makes the centered median one element short)
    win_median = int(0.3 * work.shape[1]) if win_median > work.shape[1] else win_median
    win_median = max(win_median, 3) | 1
    idx = np.asarray(moving_median(jnp.asarray(idx.astype(np.float32)),
                                   win_median, padded=True)).astype(int)

    # (5) refine to the actual peak within ±win samples
    if win > 0:
        # fixed-width search window per trace, clamped inside the section
        # (the reference's boolean-mask construction assumes all windows fit)
        width = 2 * win + 1
        upper = np.clip(idx - win, 0, max(nsamples - width, 0))
        indices = upper[None, :] + np.arange(width)[:, None]
        seg = np.take_along_axis(work, indices, axis=0)

        k = min(n, seg.shape[0] - 1)
        nl = np.argpartition(-seg, k, axis=0)[:n]
        nl = np.take_along_axis(nl, np.argsort(nl, axis=0), axis=0)
        picks = np.empty(work.shape[1], int)
        for j in range(work.shape[1]):
            tr_idx = nl[:, j]
            gaps = np.diff(tr_idx)
            brk = np.nonzero(gaps > 1)[0]
            group = tr_idx[: brk[0] + 1] if brk.size else tr_idx
            picks[j] = group[np.argmax(seg[group, j])]
        idx = picks + upper
    # (6) interpolate across zero traces
    if n_zero:
        x = np.arange(ntraces)
        f = scipy.interpolate.interp1d(x[mask_nonzero], idx, kind="linear",
                                       fill_value="extrapolate")
        idx = f(x).astype(int)

    if post_detection_filter:
        if win_mad_post is None:
            win_mad_post = int(idx.size * 0.01)
            win_mad_post += 1 if win_mad_post % 2 == 0 else 0
            win_mad_post = max(win_mad_post, 7)
        idx = filter_interp_1d(idx, method="r_doubleMAD", kind="cubic",
                               threshold=3, win=win_mad_post).astype(int)
    return idx.astype(int)
