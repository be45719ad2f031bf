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


# ---------------------------------------------------------------------------
# Fast path: one Cooley-Tukey split N = M·R (DIF), M >= 128
#
# The dense matmul-DFT costs 8·N per point per axis; one decimation-in-
# frequency split brings that to 8·M + O(R) with M = N/R, while KEEPING the
# contraction dimension at M >= 128 — a full MXU tile — so the saved FLOPs
# are saved wall-clock (a sqrt(N)-radix FFT would be cheaper on paper but
# its tiny matmuls underuse the 128-wide systolic array). The small-radix
# R in {2..8} stage is butterflies + twiddles on the VPU, where XLA fuses
# them into the surrounding elementwise work.
#
#   X[R·p + s] = Σ_m w_M^{mp} · [ w_N^{ms} · Σ_t w_R^{ts} · x[m + M·t] ]
#
# (t indexes R contiguous length-M blocks; the output interleave R·p+s is a
# cheap reshape/transpose). Exact — same DFT, same convention; the inverse
# runs via conj∘fft∘conj. At 512 this cuts the solve's dominant matmul
# FLOPs 4× and measures ~2.5-3x faster than the dense path on v5e; the
# directional-basis (SHEARLET/CURVELET) POCS solve inherits it through
# fft2/ifft2.
# ---------------------------------------------------------------------------

_FAST_MIN_M = 128


_SPLIT_PREFERENCE: dict | None = None  # parsed once from P3D_RADIX_SPLIT


def _split_preference() -> dict:
    """Per-axis-length radix preference, parsed ONCE per process from the
    ``P3D_RADIX_SPLIT`` env var (``"1024:4,512:2"`` -> prefer R=4 at
    n=1024, R=2 at n=512). The split choice fixes the permuted spectral
    layout (radix_perm) that kernels, window packs, and compiled programs
    share, so it must stay constant for the life of the process — hence
    env-var (not runtime-argument) plumbing; tools/probe_split.py probes
    candidates in subprocesses."""
    global _SPLIT_PREFERENCE
    if _SPLIT_PREFERENCE is None:
        import os

        table = {}
        for part in os.environ.get("P3D_RADIX_SPLIT", "").split(","):
            if ":" in part:
                n_s, r_s = part.split(":", 1)
                try:
                    table[int(n_s)] = int(r_s)
                except ValueError:
                    raise ValueError(
                        f"P3D_RADIX_SPLIT entry {part!r} is not 'N:R'")
        _SPLIT_PREFERENCE = table
    return _SPLIT_PREFERENCE


def fast_split(n: int):
    """(M, R) for the fast path, or None when the dense matmul is better
    (n < 256 or no divisor with M >= 128 and R <= 8).

    The default prefers the largest R (fewest MXU MACs: per-axis dot work
    is n²·M = n³/R); ``P3D_RADIX_SPLIT`` overrides R per axis length for
    hardware where the O(n²·R) VPU butterfly stage dominates instead
    (candidates probed by tools/probe_split.py)."""
    if n < 2 * _FAST_MIN_M:
        return None
    r_pref = _split_preference().get(n)
    if r_pref is not None:
        if (r_pref < 2 or r_pref > 8 or n % r_pref
                or n // r_pref < _FAST_MIN_M):
            # R <= 8 is a hard bound: the Pallas kernels pack the R
            # twiddle rows into 16-row VMEM blocks (pocs_iter.py::
            # _radix_kernel_constants) and the O(n²R) butterfly cost is
            # the reason to override DOWNWARD in the first place
            raise ValueError(
                f"P3D_RADIX_SPLIT asks R={r_pref} at n={n}, but n must "
                f"split as M*R with M >= {_FAST_MIN_M} and 2 <= R <= 8")
        return n // r_pref, r_pref
    for r in (8, 7, 6, 5, 4, 3, 2):
        if n % r == 0 and n // r >= _FAST_MIN_M:
            return n // r, r
    return None


def _radix_constants(n: int):
    """Host-precomputed constants for the N = M·R split of axis length n.

    Returns (M, R, W_R (R,R) complex128 exactified, twiddle (R, M) f32 pair,
    F_M f32 pair).
    """
    m, r = fast_split(n)
    return _radix_constants_for(n, m, r)


def _snap_roots(w: np.ndarray) -> np.ndarray:
    """Snap near-exact root-of-unity values so unrolled butterflies emit
    adds/swaps for 0/±1/±i coefficients. ONE implementation shared by the
    direct (`_radix_constants_for`) and recursive (`_wr_snapped`) butterfly
    forms — they must emit identical coefficients for the
    P3D_NO_BUTTERFLY_RECURSION A/B to be meaningful."""
    w.real[np.abs(w.real) < 1e-12] = 0.0
    w.imag[np.abs(w.imag) < 1e-12] = 0.0
    w.real[np.abs(w.real - 1) < 1e-12] = 1.0
    w.real[np.abs(w.real + 1) < 1e-12] = -1.0
    w.imag[np.abs(w.imag - 1) < 1e-12] = 1.0
    w.imag[np.abs(w.imag + 1) < 1e-12] = -1.0
    return w


@functools.lru_cache(maxsize=64)
def _radix_constants_for(n: int, m: int, r: int):
    # cached on the FULL split (not just n) so a test-scoped
    # P3D_RADIX_SPLIT change can never serve constants that disagree with
    # a freshly computed radix_perm(n)
    st = np.outer(np.arange(r), np.arange(r)).astype(np.float64)
    w_r = _snap_roots(np.exp(-2j * np.pi * st / r))  # butterfly coefficients
    ms = np.outer(np.arange(r), np.arange(m)).astype(np.float64)
    ang = -2.0 * np.pi * ms / n
    twr = np.cos(ang).astype(np.float32)
    twi = np.sin(ang).astype(np.float32)
    fr, fi = dft_matrices(m)
    return m, r, w_r, twr, twi, fr, fi


def _gauss_enabled() -> bool:
    """Gauss 3-multiplication complex products (default on; see
    ops/pallas/pocs_iter.py for the numerics discussion — the identical
    identity is applied both in-kernel and on the XLA split/partial-DFT
    paths). ``P3D_NO_GAUSS=1`` restores the exact 4-dot form everywhere,
    read at trace time."""
    import os

    return not os.environ.get("P3D_NO_GAUSS")


def _cmul_left(dot, fr, fi, fs, br, bi):
    """(fr + i·fi) @ (br + i·bi); ``fs = fr + fi`` enables the 3-dot form
    (pass ``None`` for the exact 4-dot form). ``dot(a, b)`` contracts with
    the constant pair as the FIRST operand."""
    if fs is None:
        return dot(fr, br) - dot(fi, bi), dot(fr, bi) + dot(fi, br)
    t1 = dot(fr, br)
    t2 = dot(fi, bi)
    t3 = dot(fs, br + bi)
    return t1 - t2, t3 - t1 - t2


def _cmul_left_conj(dot, fr, fi, fd, br, bi):
    """conj(fr + i·fi) @ (br + i·bi); ``fd = fr - fi`` or ``None``."""
    if fd is None:
        return dot(fr, br) + dot(fi, bi), dot(fr, bi) - dot(fi, br)
    t1 = dot(fr, br)
    t2 = dot(fi, bi)
    t3 = dot(fd, br + bi)
    return t1 + t2, t3 - t1 + t2


def _cmul_right(dot, br, bi, fr, fi, fs):
    """(br + i·bi) @ (fr + i·fi); constant pair as the SECOND operand."""
    if fs is None:
        return dot(br, fr) - dot(bi, fi), dot(br, fi) + dot(bi, fr)
    t1 = dot(br, fr)
    t2 = dot(bi, fi)
    t3 = dot(br + bi, fs)
    return t1 - t2, t3 - t1 - t2


def _cmul_right_conj(dot, br, bi, fr, fi, fd):
    """(br + i·bi) @ conj(fr + i·fi); ``fd = fr - fi`` or ``None``."""
    if fd is None:
        return dot(br, fr) + dot(bi, fi), dot(bi, fr) - dot(br, fi)
    t1 = dot(br, fr)
    t2 = dot(bi, fi)
    t3 = dot(br + bi, fd)
    return t1 + t2, t3 - t1 + t2


def _cmac(acc, c: complex, xr, xi):
    """acc += c·(xr + i·xi) with 0/±1/±i coefficients emitted as adds/swaps."""
    ar, ai = acc
    cr, ci = float(c.real), float(c.imag)
    if cr == 0.0 and ci == 0.0:
        return acc
    # real-part contribution
    if cr == 1.0:
        ar = xr if ar is None else ar + xr
        ai = xi if ai is None else ai + xi
    elif cr == -1.0:
        ar = -xr if ar is None else ar - xr
        ai = -xi if ai is None else ai - xi
    elif cr != 0.0:
        ar = cr * xr if ar is None else ar + cr * xr
        ai = cr * xi if ai is None else ai + cr * xi
    # imaginary-part contribution: i·(xr + i·xi) = -xi + i·xr
    if ci == 1.0:
        ar = -xi if ar is None else ar - xi
        ai = xr if ai is None else ai + xr
    elif ci == -1.0:
        ar = xi if ar is None else ar + xi
        ai = -xr if ai is None else ai - xr
    elif ci != 0.0:
        ar = (-ci) * xi if ar is None else ar - ci * xi
        ai = ci * xr if ai is None else ai + ci * xr
    return ar, ai


def _butterfly_recursion_enabled() -> bool:
    """Mixed-radix recursive butterflies (default on; measurement escape
    hatch ``P3D_NO_BUTTERFLY_RECURSION=1`` restores the direct single-level
    form), read at trace time."""
    import os

    return not os.environ.get("P3D_NO_BUTTERFLY_RECURSION")


@functools.lru_cache(maxsize=64)
def _wr_snapped(r: int) -> np.ndarray:
    """Exactified ``W_R[s, t] = exp(-2πi·st/R)`` (via the shared
    :func:`_snap_roots`, so every butterfly form emits identical
    adds/swaps for 0/±1/±i coefficients)."""
    st = np.outer(np.arange(r), np.arange(r)).astype(np.float64)
    return _snap_roots(np.exp(-2j * np.pi * st / r))


def _smallest_factor(r: int) -> int:
    for p in (2, 3, 5, 7):
        if r % p == 0:
            return p
    return r


def butterfly_dft(pairs, r: int, inverse: bool = False):
    """R-point DFT across ``r`` (re, im) block pairs, outputs natural order.

    Computes ``u_s = Σ_t W_R^{∓st}·x_t`` (forward: ``-``; ``inverse=True``
    conjugates the kernel — unnormalized). The direct single-level form
    costs O(R²) block-MACs; for composite R this recurses through the
    mixed-radix Cooley-Tukey factorization R = R1·R2 (t = R2·t1 + t2,
    s = s1 + R1·s2):

        A[s1, t2] = Σ_t1 W_{R1}^{∓s1·t1} · x[R2·t1 + t2]   (R2 small DFTs)
        B[s1, t2] = W_R^{∓s1·t2} · A[s1, t2]               (twiddles)
        u[s1 + R1·s2] = Σ_t2 W_{R2}^{∓s2·t2} · B[s1, t2]   (R1 small DFTs)

    which brings the R=8 butterfly from 64 block-MACs (16 of them full
    complex multiplies) to 24 adds + 2 complex multiplies — the O(n²·R)
    VPU stage measured as the 1024² fused-kernel efficiency cliff
    (docs/perf.md round 4c: kernel at 59% of the HIGH ceiling at R=8 vs
    77% at R=4). All coefficients snap through :func:`_wr_snapped`, so
    trivial factors emit adds/swaps; outputs stay in NATURAL s order, so
    the s-block permuted layout (``radix_perm``) and every window pack
    are unchanged. ``P3D_NO_BUTTERFLY_RECURSION=1`` restores the direct
    form for A/B measurement.
    """
    if r == 1:
        return [tuple(p) for p in pairs]
    r1 = _smallest_factor(r)
    if r1 == r or not _butterfly_recursion_enabled():
        # prime radix (or recursion disabled): direct coefficient form
        w = _wr_snapped(r)
        outs = []
        for s in range(r):
            acc = (None, None)
            for t in range(r):
                c = complex(w[s, t])
                if inverse:
                    c = c.conjugate()
                acc = _cmac(acc, c, pairs[t][0], pairs[t][1])
            outs.append(acc)
        return outs
    r2 = r // r1
    # inner: r2 independent r1-point DFTs over stride-r2 inputs
    inner = [
        butterfly_dft([pairs[r2 * t1 + t2] for t1 in range(r1)], r1, inverse)
        for t2 in range(r2)
    ]
    w = _wr_snapped(r)
    outs = [None] * r
    for s1 in range(r1):
        col = []
        for t2 in range(r2):
            c = complex(w[s1, t2])
            if inverse:
                c = c.conjugate()
            xr, xi = inner[t2][s1]
            col.append(_cmac((None, None), c, xr, xi))
        sub = butterfly_dft(col, r2, inverse)
        for s2 in range(r2):
            outs[s1 + r1 * s2] = sub[s2]
    return outs


def radix_perm(n: int) -> np.ndarray:
    """σ: permuted position -> natural frequency index under the fast
    split's s-block layout (identity when no split applies).

    The split's natural output order X[R·p+s] requires an interleave; the
    PERMUTED layout keeps the R s-blocks contiguous — position s·M+p holds
    frequency R·p+s. Elementwise spectral ops (thresholds, window
    multiplies with equally-permuted windows) are layout-invariant, so hot
    paths can stay permuted and skip the interleave entirely
    (ops/pallas/subband.py does).
    """
    sp = fast_split(n)
    if sp is None:
        return np.arange(n, dtype=np.int64)
    m, r = sp
    s, p = np.divmod(np.arange(n, dtype=np.int64), m)
    return r * p + s


def _ifft1_fast_axis_from_perm(z: Cplx, axis: int, precision) -> Cplx:
    """Inverse DFT along ``axis`` consuming the PERMUTED layout (DIT mirror
    of the DIF forward); emits natural order, scaled 1/N."""
    n = z.shape[axis]
    m, r, w_r, twr, twi, fr, fi = _radix_constants(n)
    last = axis == -1 or axis == z.re.ndim - 1
    fd = jnp.asarray(fr - fi) if _gauss_enabled() else None  # conj sum
    fr = jnp.asarray(fr)
    fi = jnp.asarray(fi)  # conj(F_M) = (fr, -fi)

    def blk(a, s):
        return a[..., s * m:(s + 1) * m] if last else a[..., s * m:(s + 1) * m, :]

    if last:
        def e_r(a, mm):
            return jnp.einsum("...p,mp->...m", a, mm, precision=precision)
    else:
        def e_l(mm, a):
            return jnp.einsum("mp,...pw->...mw", mm, a, precision=precision)

    ds = []
    for s in range(r):
        zr_s, zi_s = blk(z.re, s), blk(z.im, s)
        if last:
            cr_, ci_ = _cmul_right_conj(e_r, zr_s, zi_s, fr, fi, fd)
            tr_, ti_ = jnp.asarray(twr[s]), jnp.asarray(twi[s])
        else:
            cr_, ci_ = _cmul_left_conj(e_l, fr, fi, fd, zr_s, zi_s)
            tr_, ti_ = jnp.asarray(twr[s])[:, None], jnp.asarray(twi[s])[:, None]
        # multiply by conj(twiddle) = (tr, -ti)
        ds.append((cr_ * tr_ + ci_ * ti_, ci_ * tr_ - cr_ * ti_))

    # inverse butterfly: out_t = Σ_s W_R^{+st}·d_s (mixed-radix recursion)
    outs = butterfly_dft(ds, r, inverse=True)
    outs_r = [o[0] for o in outs]
    outs_i = [o[1] for o in outs]
    ax = -1 if last else -2
    scale = 1.0 / n
    return Cplx(jnp.concatenate(outs_r, ax) * scale,
                jnp.concatenate(outs_i, ax) * scale)


def fft2_permuted(z: Cplx, precision=Precision.HIGHEST) -> Cplx:
    """2D DFT with each qualifying axis left in the split's PERMUTED layout
    (``radix_perm``); axes without a split come out natural. Cheaper than
    :func:`fft2` (skips the interleave) and the layout elementwise ops
    don't care about; invert with :func:`ifft2_from_permuted`."""
    h, w = z.shape[-2], z.shape[-1]
    gauss = _gauss_enabled()
    out = z
    if fast_split(w):
        out = _fft1_fast_axis(out, -1, precision, permuted=True)
    else:
        fw_np = dft_matrices(w)
        fws = jnp.asarray(fw_np[0] + fw_np[1]) if gauss else None
        fwr, fwi = (jnp.asarray(mm) for mm in fw_np)
        out = Cplx(*_cmul_right(lambda a, mm: _mm_right(a, mm, precision),
                                out.re, out.im, fwr, fwi, fws))
    if fast_split(h):
        out = _fft1_fast_axis(out, -2, precision, permuted=True)
    else:
        fh_np = dft_matrices(h)
        fhs = jnp.asarray(fh_np[0] + fh_np[1]) if gauss else None
        fhr, fhi = (jnp.asarray(mm) for mm in fh_np)
        out = Cplx(*_cmul_left(lambda mm, a: _mm_left(mm, a, precision),
                               fhr, fhi, fhs, out.re, out.im))
    return out


def ifft2_from_permuted(z: Cplx, precision=Precision.HIGHEST) -> Cplx:
    """Inverse of :func:`fft2_permuted`; scaled by 1/(H·W)."""
    h, w = z.shape[-2], z.shape[-1]
    gauss = _gauss_enabled()
    out = z
    if fast_split(h):
        out = _ifft1_fast_axis_from_perm(out, -2, precision)
    else:
        fh_np = dft_matrices(h)
        fhd = jnp.asarray(fh_np[0] - fh_np[1]) if gauss else None
        fhr, fhi = (jnp.asarray(mm) for mm in fh_np)
        outr, outi = _cmul_left_conj(
            lambda mm, a: _mm_left(mm, a, precision),
            fhr, fhi, fhd, out.re, out.im)
        out = Cplx(outr / h, outi / h)
    if fast_split(w):
        out = _ifft1_fast_axis_from_perm(out, -1, precision)
    else:
        fw_np = dft_matrices(w)
        fwd = jnp.asarray(fw_np[0] - fw_np[1]) if gauss else None
        fwr, fwi = (jnp.asarray(mm) for mm in fw_np)
        outr, outi = _cmul_right_conj(
            lambda a, mm: _mm_right(a, mm, precision),
            out.re, out.im, fwr, fwi, fwd)
        out = Cplx(outr / w, outi / w)
    return out


def _fft1_fast_axis(z: Cplx, axis: int, precision, permuted: bool = False) -> Cplx:
    """Forward DFT along ``axis`` (-1 or -2) via the N = M·R split.

    ``permuted=True`` skips the output interleave and returns the s-block
    layout (see :func:`radix_perm`)."""
    n = z.shape[axis]
    m, r, w_r, twr, twi, fr, fi = _radix_constants(n)
    shape = z.shape
    last = axis == -1 or axis == z.re.ndim - 1

    if last:
        view = shape[:-1] + (r, m)
        xr = z.re.reshape(view)
        xi = z.im.reshape(view)
        blk = lambda a, t: a[..., t, :]  # noqa: E731
    else:
        view = shape[:-2] + (r, m, shape[-1])
        xr = z.re.reshape(view)
        xi = z.im.reshape(view)
        blk = lambda a, t: a[..., t, :, :]  # noqa: E731

    tw = [(jnp.asarray(twr[s]), jnp.asarray(twi[s])) for s in range(r)]
    fs = jnp.asarray(fr + fi) if _gauss_enabled() else None
    fr = jnp.asarray(fr)
    fi = jnp.asarray(fi)

    if last:
        def e_r(a, mm):
            return jnp.einsum("...m,pm->...p", a, mm, precision=precision)
    else:
        def e_l(mm, a):
            return jnp.einsum("pm,...mw->...pw", mm, a, precision=precision)

    # butterfly: u_s = Σ_t w_R^{st} · x_t (mixed-radix recursion;
    # adds/swaps for 0/±1/±i coefficients)
    us = butterfly_dft([(blk(xr, t), blk(xi, t)) for t in range(r)], r)
    outs_r, outs_i = [], []
    for s in range(r):
        ur, ui = us[s]
        # twiddle by w_N^{ms} (per-s constant vector along the m axis)
        cr, ci = tw[s]
        if not last:
            cr, ci = cr[:, None], ci[:, None]
        vr = ur * cr - ui * ci
        vi = ur * ci + ui * cr
        # length-M DFT as one MXU matmul (contraction dim M >= 128)
        if last:
            yr, yi = _cmul_right(e_r, vr, vi, fr, fi, fs)
        else:
            yr, yi = _cmul_left(e_l, fr, fi, fs, vr, vi)
        outs_r.append(yr)
        outs_i.append(yi)

    if permuted:
        # s-block layout: position s·M+p holds X[R·p+s] (radix_perm)
        ax = -1 if last else -2
        return Cplx(jnp.concatenate(outs_r, ax), jnp.concatenate(outs_i, ax))

    # interleave: X[R·p + s] = y_s[p] -> stack s last, flatten (p, s)
    if last:
        outr = jnp.stack(outs_r, axis=-1).reshape(shape)
        outi = jnp.stack(outs_i, axis=-1).reshape(shape)
    else:
        outr = jnp.stack(outs_r, axis=-2)  # (..., p, s, w)
        outi = jnp.stack(outs_i, axis=-2)
        outr = outr.reshape(shape)
        outi = outi.reshape(shape)
    return Cplx(outr, outi)


def fft2(z: Cplx, precision=Precision.HIGHEST, fast: bool = True) -> Cplx:
    """2D DFT over the trailing two axes of a (re, im) pair. numpy convention.

    ``fast=True`` (default) routes axes with a qualifying length through the
    Cooley-Tukey matmul split above — identical DFT, ~R× fewer matmul FLOPs.
    """
    h, w = z.shape[-2], z.shape[-1]
    if fast and (fast_split(h) or fast_split(w)):
        out = z
        if fast_split(w):
            out = _fft1_fast_axis(out, -1, precision)
        else:
            fwr, fwi = (jnp.asarray(m) for m in dft_matrices(w))
            outr = _mm_right(out.re, fwr, precision) - _mm_right(out.im, fwi, precision)
            outi = _mm_right(out.re, fwi, precision) + _mm_right(out.im, fwr, precision)
            out = Cplx(outr, outi)
        if fast_split(h):
            out = _fft1_fast_axis(out, -2, precision)
        else:
            fhr, fhi = (jnp.asarray(m) for m in dft_matrices(h))
            outr = _mm_left(fhr, out.re, precision) - _mm_left(fhi, out.im, precision)
            outi = _mm_left(fhr, out.im, precision) + _mm_left(fhi, out.re, precision)
            out = Cplx(outr, outi)
        return out
    fhr, fhi = (jnp.asarray(m) for m in dft_matrices(h))
    fwr, fwi = (jnp.asarray(m) for m in dft_matrices(w))
    # left multiply: y = F_H @ z
    yr = _mm_left(fhr, z.re, precision) - _mm_left(fhi, z.im, precision)
    yi = _mm_left(fhr, z.im, precision) + _mm_left(fhi, z.re, precision)
    # right multiply: out = y @ F_W^T  (F_W symmetric, kept explicit for clarity)
    outr = _mm_right(yr, fwr, precision) - _mm_right(yi, fwi, precision)
    outi = _mm_right(yr, fwi, precision) + _mm_right(yi, fwr, precision)
    return Cplx(outr, outi)


def ifft2(z: Cplx, precision=Precision.HIGHEST, fast: bool = True) -> Cplx:
    """2D inverse DFT over trailing two axes; scaled by 1/(H·W)."""
    h, w = z.shape[-2], z.shape[-1]
    if fast and (fast_split(h) or fast_split(w)):
        # ifft = conj(fft(conj(z))) / (H·W) — reuses the fast forward exactly
        out = fft2(z.conj(), precision=precision, fast=True)
        s = 1.0 / (h * w)
        return Cplx(out.re * s, -out.im * s)
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


