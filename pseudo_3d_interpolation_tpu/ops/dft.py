"""DFT / DCT as dense matrix multiplication — the MXU-native spectral core.

Why matmul and not an FFT primitive: the POCS hot loop does 2D spectral
transforms of ~128–1024-point axes. On TPU the systolic MXU delivers its
peak on dense matmuls, XLA's native FFT support is limited (and the axon
backend rejects complex dtypes outright), so the speed-of-light formulation
is ``X = F_H @ x @ F_W^T`` with precomputed DFT matrices and complex numbers
carried as (re, im) pairs of real f32 — four real matmuls per complex one.
For a 512-point axis that trades O(N log N) scalar-ish work for an
MXU-saturating dense contraction; wall-clock wins by a wide margin.

Conventions match ``numpy.fft``: forward unnormalized, inverse scaled by
``1/N`` per axis. replaces: numpy ``fft2/ifft2`` use in reference
pseudo_3D_interpolation/cube_POCS_interpolation_3D.py:255-257 and
functions/POCS.py:578-613.

The DCT-II/III pair (orthonormalized) is provided as an additional real
single-matmul sparse basis — cheaper than FFT on TPU (half the matmuls, no
imaginary part) and listed as a supported transform kind by the reference
(functions/POCS.py:235,494).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cplx import Cplx

Precision = jax.lax.Precision


@functools.lru_cache(maxsize=64)
def dft_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) parts of the forward DFT matrix ``F[j,k] = exp(-2πi jk/n)``.

    Computed in float64 on host, stored f32. ``F = Fr + i·Fi``.
    """
    jk = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    ang = -2.0 * np.pi * jk / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=64)
def dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix ``C`` with ``X = C @ x``; inverse is ``C.T``."""
    k = np.arange(n)[:, None].astype(np.float64)
    t = np.arange(n)[None, :].astype(np.float64)
    c = np.cos(np.pi * (2 * t + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    c[0] /= np.sqrt(2.0)
    return c.astype(np.float32)


def _mm_left(m, x, precision):
    """(n_out, n_in) @ (..., n_in, W) over the second-to-last axis."""
    return jnp.einsum("hk,...kw->...hw", m, x, precision=precision)


def _mm_right(x, m, precision):
    """(..., H, n_in) @ (n_out, n_in)^T over the last axis."""
    return jnp.einsum("...hk,wk->...hw", x, m, precision=precision)


def fft2(z: Cplx, precision=Precision.HIGHEST) -> Cplx:
    """2D DFT over the trailing two axes of a (re, im) pair. numpy convention."""
    h, w = z.shape[-2], z.shape[-1]
    fhr, fhi = (jnp.asarray(m) for m in dft_matrices(h))
    fwr, fwi = (jnp.asarray(m) for m in dft_matrices(w))
    # left multiply: y = F_H @ z
    yr = _mm_left(fhr, z.re, precision) - _mm_left(fhi, z.im, precision)
    yi = _mm_left(fhr, z.im, precision) + _mm_left(fhi, z.re, precision)
    # right multiply: out = y @ F_W^T  (F_W symmetric, kept explicit for clarity)
    outr = _mm_right(yr, fwr, precision) - _mm_right(yi, fwi, precision)
    outi = _mm_right(yr, fwi, precision) + _mm_right(yi, fwr, precision)
    return Cplx(outr, outi)


def ifft2(z: Cplx, precision=Precision.HIGHEST) -> Cplx:
    """2D inverse DFT over trailing two axes; scaled by 1/(H·W)."""
    h, w = z.shape[-2], z.shape[-1]
    fhr, fhi = (jnp.asarray(m) for m in dft_matrices(h))
    fwr, fwi = (jnp.asarray(m) for m in dft_matrices(w))
    # inverse matrix = conj(F)/n  ->  use (fr, -fi), fold 1/(h*w) in at the end
    yr = _mm_left(fhr, z.re, precision) + _mm_left(fhi, z.im, precision)
    yi = _mm_left(fhr, z.im, precision) - _mm_left(fhi, z.re, precision)
    outr = _mm_right(yr, fwr, precision) + _mm_right(yi, fwi, precision)
    outi = _mm_right(yr, fwi, precision) * (-1.0) + _mm_right(yi, fwr, precision)
    scale = 1.0 / (h * w)
    return Cplx(outr * scale, outi * scale)


def fft1(z: Cplx, axis: int = -1, precision=Precision.HIGHEST) -> Cplx:
    """1D DFT along ``axis`` of a (re, im) pair (numpy convention)."""
    z = Cplx(jnp.moveaxis(z.re, axis, -1), jnp.moveaxis(z.im, axis, -1))
    n = z.shape[-1]
    fr, fi = (jnp.asarray(m) for m in dft_matrices(n))
    outr = _mm_right(z.re[..., None, :], fr, precision) - _mm_right(z.im[..., None, :], fi, precision)
    outi = _mm_right(z.re[..., None, :], fi, precision) + _mm_right(z.im[..., None, :], fr, precision)
    out = Cplx(outr[..., 0, :], outi[..., 0, :])
    return Cplx(jnp.moveaxis(out.re, -1, axis), jnp.moveaxis(out.im, -1, axis))


def ifft1(z: Cplx, axis: int = -1, precision=Precision.HIGHEST) -> Cplx:
    """1D inverse DFT along ``axis``; scaled by 1/N."""
    n = z.shape[axis]
    out = fft1(z.conj(), axis=axis, precision=precision).conj()
    return out * (1.0 / n)


def rfft1(x: jnp.ndarray, axis: int = -1, n: int | None = None,
          precision=Precision.HIGHEST) -> Cplx:
    """Real-input 1D DFT along ``axis`` -> first ``n//2+1`` bins as a pair.

    ``n`` zero-pads (or truncates) the axis before transforming, mirroring
    ``numpy.fft.rfft(x, n)`` — used for spectrum upsampling in the cube FFT
    stage (reference: cube_apply_FFT.py:240-254).
    """
    x = jnp.moveaxis(x, axis, -1)
    ln = x.shape[-1]
    n = ln if n is None else int(n)
    if n < ln:
        x = x[..., :n]
    elif n > ln:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - ln)])
    fr, fi = dft_matrices(n)
    nb = n // 2 + 1
    frh = jnp.asarray(fr[:nb])
    fih = jnp.asarray(fi[:nb])
    outr = jnp.einsum("...t,ft->...f", x, frh, precision=precision)
    outi = jnp.einsum("...t,ft->...f", x, fih, precision=precision)
    return Cplx(jnp.moveaxis(outr, -1, axis), jnp.moveaxis(outi, -1, axis))


def irfft1(z: Cplx, n: int, axis: int = -1, precision=Precision.HIGHEST) -> jnp.ndarray:
    """Inverse of :func:`rfft1`: hermitian-symmetric bins -> real signal of length ``n``.

    Uses the weighted real contraction ``x = (1/n) * Σ_f w_f (Re·cos + Im·(-sin))``
    with ``w_f = 2`` for interior bins (1 for DC and, if n even, Nyquist).
    """
    zr = jnp.moveaxis(z.re, axis, -1)
    zi = jnp.moveaxis(z.im, axis, -1)
    nb = zr.shape[-1]
    fr, fi = dft_matrices(n)
    w = np.full((nb,), 2.0, np.float32)
    w[0] = 1.0
    if n % 2 == 0 and nb == n // 2 + 1:
        w[-1] = 1.0
    # x[t] = (1/n) Σ_f w_f Re(X[f] e^{+2πi f t/n})
    #      = (1/n) Σ_f w_f (Re[f]·cos(2πft/n) − Im[f]·sin(2πft/n));
    # with fr = cos(−θ) = cos θ and fi = sin(−θ) = −sin θ this folds to
    # (zr @ (fr·w) + zi @ (fi·w)) / n.
    cr = jnp.asarray(fr[:nb] * w[:, None])
    ci = jnp.asarray(fi[:nb] * w[:, None])
    x = (
        jnp.einsum("...f,ft->...t", zr, cr, precision=precision)
        + jnp.einsum("...f,ft->...t", zi, ci, precision=precision)
    ) / n
    return jnp.moveaxis(x, -1, axis)


def dct2_2d(x: jnp.ndarray, precision=Precision.HIGHEST) -> jnp.ndarray:
    """Orthonormal 2D DCT-II over trailing two axes (real single-matmul basis)."""
    h, w = x.shape[-2], x.shape[-1]
    ch = jnp.asarray(dct2_matrix(h))
    cw = jnp.asarray(dct2_matrix(w))
    return _mm_right(_mm_left(ch, x, precision), cw, precision)


def idct2_2d(x: jnp.ndarray, precision=Precision.HIGHEST) -> jnp.ndarray:
    """Inverse orthonormal 2D DCT (DCT-III) over trailing two axes."""
    h, w = x.shape[-2], x.shape[-1]
    ch = jnp.asarray(dct2_matrix(h).T)
    cw = jnp.asarray(dct2_matrix(w).T)
    return _mm_right(_mm_left(ch, x, precision), cw, precision)


def fftshift_mask(h: int, w: int) -> np.ndarray:
    """(-1)^(i+j) sign mask: multiplying pre-FFT equals fftshift post-FFT."""
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    return ((-1.0) ** (i + j)).astype(np.float32)
