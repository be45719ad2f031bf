"""Multilevel 2D discrete wavelet transform in pure JAX.

replaces: PyWavelets' ``wavedec2``/``waverec2`` used as the WAVELET sparse
basis of the POCS solver (reference cube_POCS_interpolation_3D.py:260-266,
functions/POCS.py:524, 585-609). PyWavelets is a C extension and is not a
dependency here; instead:

- **Daubechies filters are generated exactly** on host by spectral
  factorization of the Daubechies polynomial (binomial coefficients ->
  roots -> minimum-phase half), for any order ``db1``..``db20``; ``haar``
  = ``db1``. (Coiflets — the reference's ``coif5`` default — have no closed
  construction; ``db8``..``db15`` provide comparable support/smoothness and
  the basis choice is a config knob. Requesting an unavailable family
  raises with the supported list.)
- **Boundary mode is periodization**: circular convolution with exact
  perfect reconstruction and fixed per-level coefficient shapes
  ``(N/2, ...)`` — the property that makes the coefficient pytree static
  under ``jit``/``scan``. (The reference uses pywt's ``smooth`` padding,
  whose ragged coefficient shapes cannot batch on TPU; for POCS the
  boundary handling is immaterial to reconstruction quality.)

Layout: trailing two axes are the slice; leading axes batch. Decomposition
returns the pywt-style list ``[cA_n, (cH_n, cV_n, cD_n), ..., (cH_1, cV_1,
cD_1)]`` — a pytree that threads through scan/jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# filter generation (host, exact)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def daubechies(p: int) -> np.ndarray:
    """Daubechies ``db-p`` scaling (lowpass) filter, length 2p, Σh = √2.

    Spectral factorization: roots of P(y) = Σ_k C(p-1+k, k) y^k are mapped
    to z-plane quadratic roots; the minimum-phase half (|z| < 1) forms
    m0(z) ∝ ((1+z)/2)^p Π(z - z_i). Float64 throughout; exact to ~1e-14
    (validated against the closed-form db2 in tests).
    """
    if p < 1:
        raise ValueError("order must be >= 1")
    if p == 1:
        return np.array([1.0, 1.0]) / np.sqrt(2.0)
    from math import comb

    ck = np.array([comb(p - 1 + k, k) for k in range(p - 1, -1, -1)], np.float64)
    yroots = np.roots(ck)  # roots of P(y), highest-power-first coeffs
    zroots = []
    for y in yroots:
        # y = (2 - z - 1/z)/4  =>  z^2 + (4y - 2) z + 1 = 0
        c = np.array([1.0, 4.0 * y - 2.0, 1.0])
        r = np.roots(c)
        zroots.append(r[np.argmin(np.abs(r))])  # minimum-phase root
    # polynomial ((1+z)/2)^p * prod (z - z_i), normalized
    poly = np.array([1.0 + 0j])
    for _ in range(p):
        poly = np.convolve(poly, [1.0, 1.0])
    for z in zroots:
        poly = np.convolve(poly, [1.0, -z])
    h = np.real(poly)
    h = h / np.sum(h) * np.sqrt(2.0)
    return h[::-1].copy()  # pywt orientation (h[0] smallest index)


@functools.lru_cache(maxsize=32)
def symlet(p: int) -> np.ndarray:
    """Symlet ``sym-p``: least-asymmetric orthogonal filter, length 2p.

    Same |m0(ω)|² as db-p, but the spectral-factorization roots are chosen
    (exhaustively over conjugate-pair in/out assignments, p <= 12) to
    minimize the phase nonlinearity of the filter — the standard
    least-asymmetric construction.
    """
    if p < 2:
        return daubechies(1)
    if p > 12:
        raise ValueError("symlets supported up to sym12 (exhaustive search)")
    from itertools import product
    from math import comb

    ck = np.array([comb(p - 1 + k, k) for k in range(p - 1, -1, -1)], np.float64)
    yroots = np.roots(ck)
    # group complex roots into conjugate pairs; reals stand alone
    used = np.zeros(len(yroots), bool)
    groups = []
    for i, y in enumerate(yroots):
        if used[i]:
            continue
        used[i] = True
        if abs(y.imag) < 1e-12:
            groups.append([y.real])
        else:
            j = int(np.argmin([
                abs(yroots[k] - np.conj(y)) + (1e18 if used[k] else 0)
                for k in range(len(yroots))
            ]))
            used[j] = True
            groups.append([y, yroots[j]])

    def z_of(y, inside: bool):
        r = np.roots([1.0, 4.0 * y - 2.0, 1.0])
        r = r[np.argsort(np.abs(r))]
        return r[0] if inside else r[1]

    def build(choice):
        poly = np.array([1.0 + 0j])
        for _ in range(p):
            poly = np.convolve(poly, [1.0, 1.0])
        for grp, inside in zip(groups, choice):
            for y in grp:
                poly = np.convolve(poly, [1.0, -z_of(y, inside)])
        h = np.real(poly)
        return h / np.sum(h) * np.sqrt(2.0)

    def asymmetry(h):
        # deviation of the group delay from constant (phase nonlinearity)
        w = np.linspace(0.01, np.pi - 0.01, 128)
        e = np.exp(-1j * np.outer(w, np.arange(len(h))))
        H = e @ h
        phase = np.unwrap(np.angle(H * np.exp(1j * w * (len(h) - 1) / 2)))
        return float(np.sum(np.diff(phase) ** 2))

    best, best_a = None, np.inf
    for choice in product([True, False], repeat=len(groups)):
        h = build(choice)
        a = asymmetry(h)
        if a < best_a:
            best, best_a = h, a
    return best[::-1].copy()


_FAMILIES = {"haar": 1}
_FAMILIES.update({f"db{i}": i for i in range(1, 21)})
_FAMILIES.update({f"sym{i}": i for i in range(2, 13)})


def wavelet_filters(name: str):
    """(dec_lo, dec_hi, rec_lo, rec_hi) for an orthogonal wavelet by name."""
    name = name.lower()
    if name not in _FAMILIES:
        raise ValueError(
            f"Wavelet {name!r} not available; choose one of {sorted(_FAMILIES)} "
            "(orthogonal Daubechies/Symlet families, generated exactly)"
        )
    if name.startswith("sym"):
        h = symlet(_FAMILIES[name]).astype(np.float32)
    else:
        h = daubechies(_FAMILIES[name]).astype(np.float32)
    L = h.size
    g = (h[::-1] * np.asarray([(-1.0) ** k for k in range(L)], np.float32)).astype(np.float32)
    # orthogonal: synthesis filters equal analysis filters (transpose op)
    return h, g, h, g


def max_level(n: int, name: str) -> int:
    """Max decomposition levels for axis length ``n`` (periodized).

    Returns 0 when the axis is shorter than the filter — decomposition is
    not possible (callers raise a clear error rather than wrapping
    incorrectly).
    """
    L = 2 * _FAMILIES[name.lower()]
    lvl = 0
    while n % 2 == 0 and n >= L:
        n //= 2
        lvl += 1
    return lvl


# ---------------------------------------------------------------------------
# 1D periodized analysis / synthesis along the last axis
# ---------------------------------------------------------------------------
def _analysis_last(x, filt):
    """a[n] = Σ_k f[k] · x[(2n+k) mod N] along the last axis (N even)."""
    L = filt.shape[0]
    xp = jnp.concatenate([x, x[..., : L - 1]], axis=-1)
    b = int(np.prod(xp.shape[:-1])) if xp.ndim > 1 else 1
    out = jax.lax.conv_general_dilated(
        xp.reshape((b, 1, xp.shape[-1])),
        filt.reshape((1, 1, L)),
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(x.shape[:-1] + (x.shape[-1] // 2,))


def _synthesis_last(a, filt, n: int):
    """x[m] = Σ_n f[(m-2n) mod N] · a[n] (transpose of analysis)."""
    L = filt.shape[0]
    u = jnp.zeros(a.shape[:-1] + (n,), a.dtype)
    u = u.at[..., ::2].set(a)
    up = jnp.concatenate([u[..., -(L - 1):], u], axis=-1) if L > 1 else u
    b = int(np.prod(up.shape[:-1])) if up.ndim > 1 else 1
    out = jax.lax.conv_general_dilated(
        up.reshape((b, 1, up.shape[-1])),
        filt[::-1].reshape((1, 1, L)),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(a.shape[:-1] + (n,))


def _last2(fn, x, *args):
    """Apply a last-axis op along the second-to-last axis via transpose."""
    return jnp.swapaxes(fn(jnp.swapaxes(x, -1, -2), *args), -1, -2)


# ---------------------------------------------------------------------------
# 2D single level + multilevel
# ---------------------------------------------------------------------------
def dwt2(x, name: str = "db4"):
    """One 2D analysis level: (..., H, W) -> (cA, (cH, cV, cD))."""
    h, g, _, _ = wavelet_filters(name)
    hj, gj = jnp.asarray(h), jnp.asarray(g)
    lo = _analysis_last(x, hj)
    hi = _analysis_last(x, gj)
    ll = _last2(_analysis_last, lo, hj)
    lh = _last2(_analysis_last, lo, gj)
    hl = _last2(_analysis_last, hi, hj)
    hh = _last2(_analysis_last, hi, gj)
    # pywt naming: cH = horizontal detail (lowpass cols, highpass rows)
    return ll, (lh, hl, hh)


def idwt2(ll, details, name: str = "db4"):
    """Inverse of :func:`dwt2`."""
    lh, hl, hh = details
    h, g, _, _ = wavelet_filters(name)
    hj, gj = jnp.asarray(h), jnp.asarray(g)
    h2 = ll.shape[-2] * 2
    w2 = ll.shape[-1] * 2
    lo = _last2(_synthesis_last, ll, hj, h2) + _last2(_synthesis_last, lh, gj, h2)
    hi = _last2(_synthesis_last, hl, hj, h2) + _last2(_synthesis_last, hh, gj, h2)
    return _synthesis_last(lo, hj, w2) + _synthesis_last(hi, gj, w2)


def wavedec2(x, name: str = "db4", level: int | None = None):
    """Multilevel 2D DWT -> [cA_n, (cH_n, cV_n, cD_n), ..., (cH_1, ...)].

    Both trailing axes must be divisible by 2**level; ``level=None`` uses
    the maximum for the smaller axis.
    """
    h, w = x.shape[-2], x.shape[-1]
    if level is None:
        level = min(max_level(h, name), max_level(w, name))
    if level < 1:
        raise ValueError(
            f"slice {h}x{w} too short for wavelet {name!r} "
            f"(filter length {2 * _FAMILIES[name.lower()]}); pad the input "
            "(WaveletTransform.with_shape does this automatically)"
        )
    for s in (h, w):
        if s % (2**level):
            raise ValueError(f"axis length {s} not divisible by 2**{level}")
    coeffs = []
    cur = x
    for _ in range(level):
        cur, det = dwt2(cur, name)
        coeffs.append(det)
    return [cur] + coeffs[::-1]


def waverec2(coeffs, name: str = "db4"):
    """Inverse multilevel 2D DWT."""
    cur = coeffs[0]
    for det in coeffs[1:]:
        cur = idwt2(cur, det, name)
    return cur
