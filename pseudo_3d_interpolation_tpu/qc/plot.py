"""QC plotting library (matplotlib, Agg-safe).

reference: pseudo_3D_interpolation/functions/plot.py (1184 LoC: seismic
image/diff, wiggle/diff, statics overlay, trace & average frequency
spectra) and the POCS inversion panels (functions/POCS.py:666-764).
All functions return (fig, axes) and accept an optional ``path`` to save.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt  # noqa: E402

from ..ops import signal as sig  # noqa: E402


def _finish(fig, path):
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150)
        plt.close(fig)
    return fig


def _clip(data, perc=99.0):
    v = np.percentile(np.abs(data), perc)
    return -v, v


def plot_seismic_image(data, twt=None, title=None, perc=99.0, cmap="gray_r",
                       path=None, ax=None):
    """Variable-density section; ``data`` is (nsamples, ntraces)."""
    data = np.asarray(data)
    if ax is None:
        fig, ax = plt.subplots(figsize=(10, 6))
    else:
        fig = ax.figure
    vmin, vmax = _clip(data, perc)
    extent = None
    if twt is not None:
        extent = [0, data.shape[1], twt[-1], twt[0]]
    im = ax.imshow(data, aspect="auto", cmap=cmap, vmin=vmin, vmax=vmax, extent=extent)
    ax.set_xlabel("trace")
    ax.set_ylabel("TWT (s)" if twt is not None else "sample")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax, fraction=0.05, pad=0.02)
    return _finish(fig, path)


def plot_seismic_difference(before, after, twt=None, titles=("before", "after"),
                            perc=99.0, path=None):
    """Three panels: before / after / difference (reference plot.py:199ff)."""
    before, after = np.asarray(before), np.asarray(after)
    fig, axes = plt.subplots(1, 3, figsize=(16, 6), sharey=True)
    vmin, vmax = _clip(before, perc)
    extent = [0, before.shape[1], twt[-1], twt[0]] if twt is not None else None
    for ax, d, t in zip(axes, [before, after, after - before],
                        [titles[0], titles[1], "difference"]):
        ax.imshow(d, aspect="auto", cmap="gray_r", vmin=vmin, vmax=vmax, extent=extent)
        ax.set_title(t)
        ax.set_xlabel("trace")
    axes[0].set_ylabel("TWT (s)" if twt is not None else "sample")
    return _finish(fig, path)


def plot_seismic_wiggle(data, twt=None, scale=1.0, max_traces=60, fill=True,
                        title=None, path=None, ax=None):
    """Wiggle traces with positive-lobe fill; ``data`` (nsamples, ntraces)."""
    data = np.asarray(data)
    ns, ntr = data.shape
    step = max(1, ntr // max_traces)
    t = np.asarray(twt) if twt is not None else np.arange(ns)
    if ax is None:
        fig, ax = plt.subplots(figsize=(10, 6))
    else:
        fig = ax.figure
    norm = np.abs(data).max() or 1.0
    for k in range(0, ntr, step):
        x = k + scale * step * data[:, k] / norm
        ax.plot(x, t, "k-", lw=0.5)
        if fill:
            ax.fill_betweenx(t, k, x, where=x > k, color="k", lw=0)
    ax.set_ylim(t[-1], t[0])
    ax.set_xlabel("trace")
    ax.set_ylabel("TWT (s)" if twt is not None else "sample")
    if title:
        ax.set_title(title)
    return _finish(fig, path)


def plot_statics_overlay(data, horizon, static=None, twt=None, title=None,
                         path=None):
    """Section with picked horizon (and optional applied static) overlays
    (reference plot.py:391ff)."""
    data = np.asarray(data)
    fig, ax = plt.subplots(figsize=(10, 6))
    plot_seismic_image(data, twt=twt, ax=ax)
    x = np.arange(data.shape[1])
    y = np.asarray(horizon, float)
    if twt is not None:
        y = np.interp(y, np.arange(len(twt)), np.asarray(twt))
    ax.plot(x, y, "r-", lw=1.2, label="horizon")
    if static is not None:
        ys = y + (np.asarray(static, float) * (twt[1] - twt[0] if twt is not None else 1))
        ax.plot(x, ys, "c--", lw=1.0, label="after static")
    ax.legend(loc="upper right")
    if title:
        ax.set_title(title)
    return _finish(fig, path)


def plot_trace_spectrum(trace, fs, title=None, path=None):
    """Single-trace amplitude spectrum (reference plot.py:704ff)."""
    f, a = sig.freq_spectrum(np.asarray(trace, np.float32), fs)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.asarray(f), np.asarray(a), "k-", lw=0.8)
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("amplitude")
    ax.set_title(title or "amplitude spectrum")
    return _finish(fig, path)


def plot_average_spectrum(data, fs, n_traces=None, title=None, path=None):
    """Mean spectrum over traces ± 1 std band (reference plot.py:863ff)."""
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None]
    if n_traces and data.shape[0] > n_traces:
        idx = np.linspace(0, data.shape[0] - 1, n_traces).astype(int)
        data = data[idx]
    f, a = sig.freq_spectrum(data, fs)
    f = np.asarray(f)
    a = np.asarray(a)
    mean, std = a.mean(axis=0), a.std(axis=0)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(f, mean, "k-", lw=1.0, label="mean")
    ax.fill_between(f, mean - std, mean + std, color="0.7", label="±1σ")
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("amplitude")
    ax.legend()
    ax.set_title(title or "average spectrum")
    return _finish(fig, path)


def plot_inversion_result(x_sparse, x_rec, metadata: dict | None = None,
                          title=None, path=None):
    """Sparse input vs POCS reconstruction panels; complex input gets
    real/imag rows (reference POCS.py:666-764)."""
    x_sparse = np.asarray(x_sparse)
    x_rec = np.asarray(x_rec)
    is_complex = np.iscomplexobj(x_sparse) or np.iscomplexobj(x_rec)
    nrows = 2 if is_complex else 1
    fig, axes = plt.subplots(nrows, 2, figsize=(12, 5 * nrows), squeeze=False)
    vmax = np.percentile(np.abs(x_sparse), 99) or 1.0
    kw = dict(cmap="RdBu", vmin=-vmax, vmax=vmax, aspect="auto")
    parts = [("real", np.real)] + ([("imag", np.imag)] if is_complex else [])
    for r, (name, fn) in enumerate(parts):
        for c, (d, lab) in enumerate([(x_sparse, "sparse input"), (x_rec, "reconstructed")]):
            im = axes[r][c].imshow(fn(d).T, **kw)
            axes[r][c].set_title(f"{lab} ({name})" if is_complex else lab)
            fig.colorbar(im, ax=axes[r][c], fraction=0.05, pad=0.02)
    if title is None and metadata:
        title = (f"{metadata.get('transform_kind', '?')} | {metadata.get('version', '?')}"
                 f" (iterations: {metadata.get('niterations', '?')})")
    if title:
        fig.suptitle(title)
    return _finish(fig, path)


def plot_fold_map(fold, title=None, path=None):
    """Bin fold / coverage map of the cube grid."""
    fold = np.asarray(fold)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(fold.T, origin="lower", aspect="auto", cmap="viridis")
    ax.set_xlabel("iline")
    ax.set_ylabel("xline")
    coverage = (fold > 0).mean()
    ax.set_title(title or f"fold (coverage {coverage:.1%})")
    fig.colorbar(im, ax=ax, fraction=0.05, pad=0.02)
    return _finish(fig, path)


# ---------------------------------------------------------------------------
# round-2 parity panels (reference plot.py:536, 704, 863, 1067)
# ---------------------------------------------------------------------------

def _wiggle_on_ax(ax, data, t, scale=1.0, tr_step=1, color="k", norm=None,
                  fill=True):
    data = np.asarray(data)
    norm = norm or (np.abs(data).max() or 1.0)
    for k in range(0, data.shape[1], tr_step):
        x = k + scale * tr_step * data[:, k] / norm
        ax.plot(x, t, color=color, lw=0.5)
        if fill:
            ax.fill_betweenx(t, k, x, where=x > k, color=color, lw=0)
    ax.set_ylim(t[-1], t[0])
    ax.set_xlabel("trace")


def plot_seismic_wiggle_diff(before, after, twt=None, gain=1.0, tr_step=None,
                             titles=("original", "edited"), path=None):
    """Three wiggle panels: before / after / difference, on a SHARED
    amplitude normalization so the difference panel is honestly scaled
    (reference plot.py:536-701)."""
    before = np.asarray(before)
    after = np.asarray(after)
    assert before.shape == after.shape, "sections must share a shape"
    ns, ntr = before.shape
    tr_step = tr_step or max(1, ntr // 60)
    t = np.asarray(twt) if twt is not None else np.arange(ns)
    fig, axes = plt.subplots(1, 3, figsize=(16, 6), sharey=True)
    norm = max(np.abs(before).max(), np.abs(after).max()) / gain or 1.0
    for ax, d, title in zip(axes, (before, after, after - before),
                            (titles[0], titles[1], "difference")):
        _wiggle_on_ax(ax, d, t, tr_step=tr_step, norm=norm)
        ax.set_title(title)
    axes[0].set_ylabel("TWT (s)" if twt is not None else "sample")
    return _finish(fig, path)


def plot_statics_panels(sections, titles=None, twt=None, gain=1.0,
                        tr_step=None, path=None):
    """Auto-gridded wiggle panels of N processing states of one section
    (e.g. raw / detected horizon applied / smoothed static applied) —
    reference _plot_seismic_wiggle_statics (plot.py:704-860) incl. its
    ceil(sqrt(N)) grid layout and shared normalization."""
    sections = [np.asarray(s) for s in sections]
    assert all(s.shape == sections[0].shape for s in sections)
    n = len(sections)
    ncols = int(np.ceil(np.sqrt(n)))
    nrows = 1 if ncols == n else ncols - 1
    nrows = nrows + 1 if n > ncols * nrows else nrows
    ns, ntr = sections[0].shape
    tr_step = tr_step or max(1, ntr // 40)
    t = np.asarray(twt) if twt is not None else np.arange(ns)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4 * nrows),
                             sharey=True, squeeze=False)
    norm = max(np.abs(s).max() for s in sections) / gain or 1.0
    flat = axes.ravel()
    for i, s in enumerate(sections):
        _wiggle_on_ax(flat[i], s, t, tr_step=tr_step, norm=norm)
        flat[i].set_title((titles or [f"state {i}"] * n)[i])
    for j in range(n, len(flat)):
        flat[j].axis("off")
    flat[0].set_ylabel("TWT (s)" if twt is not None else "sample")
    return _finish(fig, path)


def plot_trace_freq_spectrum(data, fs, trace_labels=None, plot_mvg_avg=True,
                             plot_combined=True, mvg_win=7, path=None):
    """Per-trace amplitude spectra grid with optional moving-average
    overlays and a combined-average panel (reference plot.py:863-1064)."""
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None]
    n = data.shape[0]
    f, a = sig.freq_spectrum(data, fs)
    f, a = np.asarray(f), np.atleast_2d(np.asarray(a))
    total = n + (1 if (plot_combined and n > 1) else 0)
    ncols = int(np.ceil(np.sqrt(total)))
    nrows = int(np.ceil(total / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.2 * nrows),
                             sharex=True, squeeze=False)
    flat = axes.ravel()
    kern = np.ones(mvg_win) / mvg_win
    for i in range(n):
        ax = flat[i]
        ax.plot(f, a[i], "k-", lw=0.6, label="spectrum")
        if plot_mvg_avg and len(f) > mvg_win:
            ax.plot(f, np.convolve(a[i], kern, mode="same"), "r-", lw=1.0,
                    label=f"moving avg ({mvg_win})")
        label = trace_labels[i] if trace_labels is not None else f"trace {i}"
        ax.set_title(str(label))
        ax.set_ylabel("amplitude")
        if i == 0:
            ax.legend(fontsize=8)
    if plot_combined and n > 1:
        ax = flat[n]
        ax.plot(f, a.mean(axis=0), "b-", lw=1.2)
        ax.set_title("combined average")
    for j in range(total, len(flat)):
        flat[j].axis("off")
    for ax in axes[-1]:
        ax.set_xlabel("frequency (Hz)")
    return _finish(fig, path)


def plot_average_freq_spectrum(data, fs, n_traces=None, norm=False,
                               mvg_win=7, path=None, title=None):
    """Survey-average spectrum: mean over traces with a percentile band and
    a moving-average overlay (reference plot.py:1067-1184)."""
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None]
    if n_traces and data.shape[0] > n_traces:
        idx = np.linspace(0, data.shape[0] - 1, n_traces).astype(int)
        data = data[idx]
    f, a = sig.freq_spectrum(data, fs)
    f, a = np.asarray(f), np.atleast_2d(np.asarray(a))
    mean = a.mean(axis=0)
    if norm and mean.max() > 0:
        a = a / mean.max()
        mean = mean / mean.max()
    p10, p90 = np.percentile(a, [10, 90], axis=0)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.fill_between(f, p10, p90, color="0.8", label="P10–P90")
    ax.plot(f, mean, "k-", lw=1.0, label="mean")
    if len(f) > mvg_win:
        kern = np.ones(mvg_win) / mvg_win
        ax.plot(f, np.convolve(mean, kern, mode="same"), "r-", lw=1.2,
                label=f"moving avg ({mvg_win})")
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("amplitude" + (" (normalized)" if norm else ""))
    ax.legend()
    ax.set_title(title or "average frequency spectrum")
    return _finish(fig, path)
