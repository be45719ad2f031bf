"""Fused POCS iteration as a Pallas TPU kernel.

One iteration of the FFT-basis POCS update for a batch of square slices:

    X   = F @ x @ F^T            (2D DFT, complex as (re, im) pairs)
    X̂   = threshold(X, tau)      (hard/soft/garrote, magnitude-based)
    x'  = conj(F) @ X̂ @ conj(F)^T / N²
    out = x'·(1 − α·mask) + α·x_obs

The whole chain stays VMEM-resident per slice: the XLA version materializes
each matmul operand/result in HBM (~24 MB of traffic per 512² slice-iter),
the fused kernel touches HBM only for slice in/out (+ shared constants),
which is the difference between memory- and compute-bound in the fast
(bf16-matmul) regime on v5e/v5p.

Constraints (fall back to the XLA path otherwise — models/pocs.py):
  - H and W multiples of 128 (square slices share one DFT matrix and get
    the in-kernel Cooley-Tukey split; rectangular slices run the dense
    path with a per-axis matrix pair)
  - FFT transform, hard/soft/garrote threshold

The kernel grid runs one program per slice; per-slice thresholds arrive as
a scalar-prefetch vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import dft
from ..cplx import Cplx

try:  # pallas requires a TPU-capable lowering; import lazily/guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def tpu_lowering_available(interpret: bool = False) -> bool:
    """Whether the fused kernels can actually execute here: Mosaic lowering
    requires a TPU backend (``interpret=True`` runs the kernels anywhere,
    which is how the CPU test suite exercises them). Without this check a
    default CPU/GPU run with an eligible grid would reach ``pallas_call``
    with ``interpret=False`` and fail at lowering instead of falling back
    to the XLA path as the config contract promises. A failed pallas
    import (_PALLAS_OK) disqualifies interpret mode too — interpret still
    needs ``pl.pallas_call`` itself."""
    if not _PALLAS_OK:
        return False
    if interpret:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def pallas_supported(shape, interpret: bool = False) -> bool:
    """Whether the fused kernel supports slices of this shape (each spatial
    side a multiple of 128 — the MXU/VREG tile; rectangular slices run the
    dense per-axis-matrix path, square ones additionally get the
    Cooley-Tukey split) on the active backend (TPU, or any backend under
    ``interpret``)."""
    if not _PALLAS_OK or not tpu_lowering_available(interpret):
        return False
    h, w = shape[-2], shape[-1]
    return h % 128 == 0 and w % 128 == 0


_KERNEL_THRESH_OPS = ("hard", "soft", "garrote")


def _shrink(mag2, tau, op: str):
    """Magnitude-shrink factor for the in-kernel threshold — identical
    numerics to ops/threshold.py (hard keeps >= tau; soft shrinks the
    magnitude by tau; non-negative garrote scales by (1 - tau²/|c|²)+)."""
    if op == "soft":
        mag = jnp.sqrt(mag2)
        denom = jnp.where(mag == 0.0, 1.0, mag)
        return jnp.maximum(1.0 - tau / denom, 0.0)
    if op == "garrote":
        denom = jnp.where(mag2 == 0.0, 1.0, mag2)
        return jnp.maximum(1.0 - (tau * tau) / denom, 0.0)
    return (mag2 >= tau * tau).astype(jnp.float32)


def _make_dot(precision, fr, fi, *extra_consts):
    """In-kernel dot for the requested precision.

    Mosaic lowers DEFAULT (bf16) and HIGHEST (f32 6-pass) natively but has
    no HIGH (bf16x3) lowering — for HIGH we implement the standard
    error-corrected 3-pass decomposition

        a·b ≈ hi(a)·hi(b) + hi(a)·lo(b) + lo(a)·hi(b)

    with hi = bf16 round, lo = bf16(residual); the lo·lo term is below f32
    rounding. The three passes are CONCATENATED along the contraction
    axis into ONE MXU dot — ``[a_hi | a_hi | a_lo] @ [b_hi; b_lo; b_hi]``
    — so the partial sums accumulate inside the MXU's f32 accumulator
    instead of as VPU adds over the full output (two f32 output-sized
    adds per dot eliminated; the 3x-deep contraction also amortizes the
    systolic fill better). Measured as part of the 1024² VPU overhead
    (docs/perf.md round 5). Matches XLA's HIGH quality (quality-neutral
    to 0.001 dB on the north-star cube) at ~2x the HIGHEST rate.

    Constants passed by identity get their bf16 splits AND both
    concatenated orientations prepared ONCE at dot-construction time
    (outside any iteration loop); non-const operands are split and
    stacked per call (3 cheap elementwise ops on the operand, in place
    of the 2-op split plus the removed output adds).
    """
    if precision != jax.lax.Precision.HIGH:
        return functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                 precision=precision)
    import os

    def _split(a):
        hi = a.astype(jnp.bfloat16)
        return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    _raw = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if os.environ.get("P3D_NO_CAT_DOT"):
        # measurement escape hatch: the explicit 3-dot + 2-add form
        cache3 = [(c, _split(c)) for c in (fr, fi, *extra_consts)]

        def _lookup(a):
            for c, s in cache3:
                if a is c:
                    return s
            return _split(a)

        def dot3(a, b):
            a_s = _lookup(a)
            b_s = _lookup(b)
            return (_raw(a_s[0], b_s[0]) + _raw(a_s[0], b_s[1])
                    + _raw(a_s[1], b_s[0]))

        return dot3
    cache = []
    for c in (fr, fi, *extra_consts):
        hi, lo = _split(c)
        cache.append((c,
                      jnp.concatenate([hi, hi, lo], axis=1),   # const FIRST
                      jnp.concatenate([hi, hi, lo], axis=0)))  # const SECOND

    def _find(a):
        for c, cat1, cat0 in cache:
            if a is c:
                return cat1, cat0
        return None

    def dot(a, b):
        fa = _find(a)
        fb = _find(b)
        if fa is not None and fb is None:
            hi, lo = _split(b)
            return _raw(fa[0], jnp.concatenate([hi, lo, hi], axis=0))
        if fb is not None and fa is None:
            hi, lo = _split(a)
            return _raw(jnp.concatenate([hi, lo, hi], axis=1), fb[1])
        # const×const / non-const×non-const: explicit 3-pass form
        a_s = _split(a)
        b_s = _split(b)
        return (_raw(a_s[0], b_s[0]) + _raw(a_s[0], b_s[1])
                + _raw(a_s[1], b_s[0]))

    return dot


# Gauss 3-multiplication complex products: the identity, its numerics,
# and the P3D_NO_GAUSS escape hatch live in ops/dft.py — the same helpers
# serve the kernels here and the XLA split/partial-DFT paths. In-kernel
# the constant-pair sums/diffs are computed once per kernel body (outside
# the iteration loop) and registered in _make_dot's bf16x3 split cache;
# the kernels are measured MXU-pass-bound (docs/perf.md round 3g), so the
# 25% MAC cut is a direct throughput win at every precision.
_gauss_enabled = dft._gauss_enabled
_cmul_left = dft._cmul_left
_cmul_left_conj = dft._cmul_left_conj
_cmul_right = dft._cmul_right
_cmul_right_conj = dft._cmul_right_conj


def _kernel(tau_ref, xr_ref, xi_ref, obr_ref, obi_ref, mask_ref,
            fr_ref, fi_ref, outr_ref, outi_ref, *, n: int, alpha: float,
            op: str, precision, rect_refs=None, hw=None):
    i = pl.program_id(0)
    tau = tau_ref[i]

    fr = fr_ref[...]
    fi = fi_ref[...]
    xr = xr_ref[...]
    xi = xi_ref[...]
    if rect_refs is not None:  # rectangular: separate (W, W) DFT pair
        e0 = rect_refs[0][...]
        e1 = rect_refs[1][...]
    else:
        e0, e1 = fr, fi
    n_scale = float(hw[0] * hw[1]) if hw is not None else float(n * n)

    gauss = _gauss_enabled()
    fs = fr + fi if gauss else None
    fd = fr - fi if gauss else None
    if e0 is fr:
        es, ed = fs, fd
    else:
        es = e0 + e1 if gauss else None
        ed = e0 - e1 if gauss else None
    sums = [fs, fd] + ([es, ed] if es is not fs else [])
    dot = _make_dot(precision, fr, fi, e0, e1,
                    *[c for c in sums if c is not None])

    # forward: Y = F_h @ x ; X = Y @ F_w (F symmetric -> use F directly)
    yr, yi = _cmul_left(dot, fr, fi, fs, xr, xi)
    Xr, Xi = _cmul_right(dot, yr, yi, e0, e1, es)

    # magnitude threshold (phase preserving)
    shrink = _shrink(Xr * Xr + Xi * Xi, tau, op)
    Xr = Xr * shrink
    Xi = Xi * shrink

    # inverse: conj(F_h) @ X̂ @ conj(F_w) / (H·W), conj(F) = (fr, −fi)
    yr, yi = _cmul_left_conj(dot, fr, fi, fd, Xr, Xi)
    rr, ri = _cmul_right_conj(dot, yr, yi, e0, e1, ed)
    scale = 1.0 / n_scale
    rr = rr * scale
    ri = ri * scale

    # data-consistency reinsertion
    keep = 1.0 - alpha * mask_ref[...]
    outr_ref[...] = rr * keep + alpha * obr_ref[...]
    outi_ref[...] = ri * keep + alpha * obi_ref[...]


def pocs_iteration_fused(
    x: Cplx,
    obs: Cplx,
    mask,
    tau,
    alpha: float = 1.0,
    thresh_op: str = "hard",
    interpret: bool = False,
    precision=None,
) -> Cplx:
    """One fused POCS iteration over a batch of slices.

    ``x``/``obs``: (B, H, W) pairs (H, W multiples of 128); ``mask``:
    (H, W); ``tau``: (B,) per-slice thresholds. Returns the updated
    (B, H, W) pair.
    """
    if thresh_op not in _KERNEL_THRESH_OPS:
        raise ValueError("fused kernel supports hard/soft/garrote thresholds")
    b, h, w = x.re.shape
    n = h
    rect = h != w
    fr, fi = dft.dft_matrices(h)
    extra_inputs = []
    extra_specs = []
    if rect:
        wr_, wi_ = dft.dft_matrices(w)
        extra_inputs = [jnp.asarray(wr_), jnp.asarray(wi_)]
        extra_specs = [
            pl.BlockSpec((w, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    def kernel(tau_ref, xr, xi, obr, obi, mask_r, fr_r, fi_r, *rest):
        *ex_refs, outr, outi = rest
        _kernel(
            tau_ref,
            xr.at[0], xi.at[0], obr.at[0], obi.at[0],
            mask_r, fr_r, fi_r,
            outr.at[0], outi.at[0],
            n=n, alpha=float(alpha), op=thresh_op,
            precision=(precision if precision is not None
                       else jax.lax.Precision.HIGHEST),
            rect_refs=ex_refs if rect else None,
            hw=(h, w) if rect else None,
        )

    outr, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        # 512² slices need ~18 MB of scoped VMEM (slice pairs + DFT matrices
        # + matmul temporaries); raise the Mosaic limit above its 16 MB
        # default so the fused kernel fits without spilling
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if _PALLAS_OK and not interpret else None,
        interpret=interpret,
    )(
        jnp.asarray(tau, jnp.float32),
        x.re, x.im, obs.re, obs.im,
        jnp.asarray(mask, jnp.float32),
        jnp.asarray(fr), jnp.asarray(fi),
        *extra_inputs,
    )
    return Cplx(outr, outi)


# ---------------------------------------------------------------------------
# In-kernel Cooley-Tukey split (round 3)
#
# Same N = M·R (M >= 128) decimation-in-frequency split as ops/dft.py, done
# on VMEM-resident slices: the dense N-deep DFT dots become R M-deep dots
# per axis (4x fewer MXU MACs at 512²) plus VPU butterflies/twiddles. The
# kernel keeps the spectrum in PERMUTED order (per axis, R s-blocks of
# X[R·p+s]) — legal because the only spectral op is the elementwise
# threshold; the inverse is the exact mirror (DIT) consuming the permuted
# layout and emitting natural order. Everything is static slicing +
# elementwise + M-deep matmuls: no reshapes/transposes for Mosaic to choke
# on. Exactness is pinned against the dense kernel and the XLA scan in
# tests/test_pallas_kernel.py.
# ---------------------------------------------------------------------------


def _fast_fwd_left(xr, xi, dot, fmr, fmi, twl, w_r, m, r, fms=None):
    """Forward DFT along rows via the split; output rows permuted.
    ``fms = fmr + fmi`` engages the 3-dot complex product (None: 4-dot).
    The R-point butterfly runs the mixed-radix recursion
    (ops/dft.py::butterfly_dft) — the single-level O(n²·R) form was the
    measured 1024² efficiency cliff (docs/perf.md round 4c)."""
    us = dft.butterfly_dft(
        [(xr[t * m:(t + 1) * m, :], xi[t * m:(t + 1) * m, :])
         for t in range(r)], r)
    outs_r, outs_i = [], []
    for s in range(r):
        ur, ui = us[s]
        cr = twl[:, s:s + 1]          # (m, 1) twiddle cos
        ci = twl[:, 8 + s:9 + s]      # (m, 1) twiddle sin
        vr = ur * cr - ui * ci
        vi = ur * ci + ui * cr
        or_, oi_ = _cmul_left(dot, fmr, fmi, fms, vr, vi)
        outs_r.append(or_)
        outs_i.append(oi_)
    return jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0)


def _fast_inv_left(Xr, Xi, dot, fmr, fmi, twl, w_r, m, r, fmd=None):
    """Unnormalized (N x) inverse along rows from the permuted layout.
    ``fmd = fmr - fmi`` engages the 3-dot complex product (None: 4-dot)."""
    ds = []
    for s in range(r):
        Xr_s = Xr[s * m:(s + 1) * m, :]
        Xi_s = Xi[s * m:(s + 1) * m, :]
        cr_, ci_ = _cmul_left_conj(dot, fmr, fmi, fmd, Xr_s, Xi_s)
        tr = twl[:, s:s + 1]
        ti = twl[:, 8 + s:9 + s]
        ds.append((cr_ * tr + ci_ * ti, ci_ * tr - cr_ * ti))  # conj(tw)·c
    outs = dft.butterfly_dft(ds, r, inverse=True)
    return (jnp.concatenate([o[0] for o in outs], 0),
            jnp.concatenate([o[1] for o in outs], 0))


def _fast_fwd_right(xr, xi, dot, fmr, fmi, twr, w_r, m, r, fms=None):
    """Forward DFT along columns via the split; output columns permuted."""
    us = dft.butterfly_dft(
        [(xr[:, t * m:(t + 1) * m], xi[:, t * m:(t + 1) * m])
         for t in range(r)], r)
    outs_r, outs_i = [], []
    for s in range(r):
        ur, ui = us[s]
        cr = twr[s:s + 1, :]          # (1, m)
        ci = twr[8 + s:9 + s, :]
        vr = ur * cr - ui * ci
        vi = ur * ci + ui * cr
        or_, oi_ = _cmul_right(dot, vr, vi, fmr, fmi, fms)
        outs_r.append(or_)
        outs_i.append(oi_)
    return jnp.concatenate(outs_r, 1), jnp.concatenate(outs_i, 1)


def _fast_inv_right(Xr, Xi, dot, fmr, fmi, twr, w_r, m, r, fmd=None):
    """Unnormalized (N x) inverse along columns from the permuted layout."""
    ds = []
    for s in range(r):
        Xr_s = Xr[:, s * m:(s + 1) * m]
        Xi_s = Xi[:, s * m:(s + 1) * m]
        cr_, ci_ = _cmul_right_conj(dot, Xr_s, Xi_s, fmr, fmi, fmd)
        tr = twr[s:s + 1, :]
        ti = twr[8 + s:9 + s, :]
        ds.append((cr_ * tr + ci_ * ti, ci_ * tr - cr_ * ti))
    outs = dft.butterfly_dft(ds, r, inverse=True)
    return (jnp.concatenate([o[0] for o in outs], 1),
            jnp.concatenate([o[1] for o in outs], 1))


def _radix_kernel_constants(n: int):
    """Twiddle/packing for the in-kernel split: (m, r, w_r, F_M pair,
    twl (m,16) [cols 0:r cos, 8:8+r sin], twr (16,m) [rows likewise]).

    Retained for the probe tools; the production kernels use the FOLDED
    constants below (twiddles pre-multiplied into per-s DFT matrices)."""
    m, r, w_r, twr_np, twi_np, fmr, fmi = dft._radix_constants(n)
    assert r <= 8, "split radix must fit the 16-row twiddle packing"
    twl = np.zeros((m, 16), np.float32)
    twl[:, :r] = twr_np.T
    twl[:, 8:8 + r] = twi_np.T
    twr_pack = np.zeros((16, m), np.float32)
    twr_pack[:r] = twr_np
    twr_pack[8:8 + r] = twi_np
    return m, r, w_r, fmr, fmi, twl, twr_pack


# ---------------------------------------------------------------------------
# Folded radix constants (round 5)
#
# The split's per-s twiddle stage (v = tw_s ⊙ u before/after each M-deep
# dot) is pure VPU work on full (M, n) blocks — measured as part of the
# 1024² efficiency cliff alongside the butterflies (docs/perf.md round 4c).
# It folds into the constant DFT matrix at ZERO MXU cost: with
# G_s = F_M·diag(tw_s) (and Gt_s = G_s^T = diag(tw_s)·F_M, F symmetric),
#
#   forward left :  F_M @ (tw_s ⊙ u_s)        =  G_s @ u_s
#   forward right:  (u_s ⊙ tw_s) @ F_M        =  u_s @ Gt_s
#   inverse left :  conj(tw_s) ⊙ (conj(F_M)@X) = conj(Gt_s) @ X_s
#   inverse right:  (X @ conj(F_M)) ⊙ conj(tw_s) = X_s @ conj(G_s)
#
# so each of the 4 axis passes loses one complex multiply per element per
# block plus the twiddle loads. Cost: R (M, M) constant matrices per form
# instead of one + a twiddle vector — ~4 MB VMEM at N=1024 (R=8), well
# inside the kernel's budget. The products are formed in float64 on host
# and rounded once, which is slightly MORE accurate than the runtime f32
# twiddle multiply they replace.
# ---------------------------------------------------------------------------

_FOLDED_KEYS = ("gre", "gim", "gtre", "gtim")


@functools.lru_cache(maxsize=64)
def _radix_folded_for(n: int, m: int, r: int):
    jk = np.outer(np.arange(m), np.arange(m)).astype(np.float64)
    f = np.exp(-2j * np.pi * jk / m)
    ms = np.outer(np.arange(r), np.arange(m)).astype(np.float64)
    tw = np.exp(-2j * np.pi * ms / n)  # (r, m) twiddles w_N^{ms}
    gre = np.empty((r * m, m), np.float32)
    gim = np.empty((r * m, m), np.float32)
    gtre = np.empty((r * m, m), np.float32)
    gtim = np.empty((r * m, m), np.float32)
    for s in range(r):
        g = f * tw[s][None, :]  # G_s[p, m] = F[p, m]·tw_s[m]
        gre[s * m:(s + 1) * m] = g.real
        gim[s * m:(s + 1) * m] = g.imag
        gtre[s * m:(s + 1) * m] = g.real.T
        gtim[s * m:(s + 1) * m] = g.imag.T
    return {"gre": gre, "gim": gim, "gtre": gtre, "gtim": gtim}


def _radix_kernel_constants_folded(n: int):
    """(m, r, stacks) with ``stacks[k]`` the (R·M, M) f32 stack for each
    key in :data:`_FOLDED_KEYS` (per-s matrices in row blocks)."""
    m, r = dft.fast_split(n)
    return m, r, _radix_folded_for(n, m, r)


def _folded_slices(gre, gim, gtre, gtim, m: int, r: int, gauss: bool):
    """Slice the 4 read stacks into per-s (M, M) lists; Gauss sum/diff
    stacks are formed by ONE whole-stack add/sub then sliced (identical
    f32 values to per-slice sums). Sum/diff lists are None when Gauss
    products are disabled."""
    def _sl(a):
        return [a[s * m:(s + 1) * m, :] for s in range(r)]

    g = {"gre": _sl(gre), "gim": _sl(gim), "gtre": _sl(gtre),
         "gtim": _sl(gtim)}
    if gauss:
        g["gsum"] = _sl(gre + gim)
        g["gdiff"] = _sl(gre - gim)
        g["gtsum"] = _sl(gtre + gtim)
        g["gtdiff"] = _sl(gtre - gtim)
    else:
        g["gsum"] = g["gdiff"] = g["gtsum"] = g["gtdiff"] = None
    return g


def _fast_fwd_left_folded(xr, xi, dot, g, m, r):
    """Forward DFT along rows via the split with folded twiddles; output
    rows permuted."""
    us = dft.butterfly_dft(
        [(xr[t * m:(t + 1) * m, :], xi[t * m:(t + 1) * m, :])
         for t in range(r)], r)
    outs_r, outs_i = [], []
    for s in range(r):
        or_, oi_ = _cmul_left(dot, g["gre"][s], g["gim"][s],
                              None if g["gsum"] is None else g["gsum"][s],
                              us[s][0], us[s][1])
        outs_r.append(or_)
        outs_i.append(oi_)
    return jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0)


def _fast_fwd_right_folded(xr, xi, dot, g, m, r):
    """Forward DFT along columns via the split with folded twiddles."""
    us = dft.butterfly_dft(
        [(xr[:, t * m:(t + 1) * m], xi[:, t * m:(t + 1) * m])
         for t in range(r)], r)
    outs_r, outs_i = [], []
    for s in range(r):
        or_, oi_ = _cmul_right(dot, us[s][0], us[s][1], g["gtre"][s],
                               g["gtim"][s],
                               None if g["gtsum"] is None else g["gtsum"][s])
        outs_r.append(or_)
        outs_i.append(oi_)
    return jnp.concatenate(outs_r, 1), jnp.concatenate(outs_i, 1)


def _fast_inv_left_folded(Xr, Xi, dot, g, m, r):
    """Unnormalized inverse along rows from the permuted layout."""
    ds = []
    for s in range(r):
        ds.append(_cmul_left_conj(
            dot, g["gtre"][s], g["gtim"][s],
            None if g["gtdiff"] is None else g["gtdiff"][s],
            Xr[s * m:(s + 1) * m, :], Xi[s * m:(s + 1) * m, :]))
    outs = dft.butterfly_dft(ds, r, inverse=True)
    return (jnp.concatenate([o[0] for o in outs], 0),
            jnp.concatenate([o[1] for o in outs], 0))


def _fast_inv_right_folded(Xr, Xi, dot, g, m, r):
    """Unnormalized inverse along columns from the permuted layout."""
    ds = []
    for s in range(r):
        ds.append(_cmul_right_conj(
            dot, Xr[:, s * m:(s + 1) * m], Xi[:, s * m:(s + 1) * m],
            g["gre"][s], g["gim"][s],
            None if g["gdiff"] is None else g["gdiff"][s]))
    outs = dft.butterfly_dft(ds, r, inverse=True)
    return (jnp.concatenate([o[0] for o in outs], 1),
            jnp.concatenate([o[1] for o in outs], 1))


def _folded_dot_consts(g, gauss: bool):
    """Every per-s constant slice, for _make_dot's bf16x3 split cache."""
    keys = (("gre", "gim", "gtre", "gtim")
            + (("gsum", "gdiff", "gtsum", "gtdiff") if gauss else ()))
    return [a for k in keys for a in g[k]]


# ---------------------------------------------------------------------------
# Folded multi-iteration kernel (round 2)
#
# The one-iteration kernel above pays an HBM round trip of the slice pair
# per iteration plus a launch per scan step, which is why it merely matched
# XLA at saturating batch (docs/perf.md round 1). Folding the WHOLE solve
# into one launch keeps x (and the FPOCS x_prev) VMEM-resident across all
# iterations — HBM is touched once per slice for in/out and once for the
# shared constants. Regular + fast versions, hard/soft/garrote thresholds.
# ---------------------------------------------------------------------------

def _solve_kernel(tau_ref, xr_ref, xi_ref, mask_ref, fr_ref, fi_ref,
                  outr_ref, outi_ref, cost_ref, *, n: int, alpha: float,
                  op: str, niter: int, precision, fast: bool,
                  basis: str = "fft", split=None, gtre_ref=None,
                  gtim_ref=None, rect_refs=None, hw=None, wv_level: int = 0):
    i = pl.program_id(0)
    fr = fr_ref[...]
    fi = fi_ref[...]
    # right-hand transform matrices: for square slices the (symmetric) DFT
    # matrix / the DCT pair serves both sides; rectangular slices carry a
    # separate (W, W) pair (e0 = right-forward, e1 = right-inverse partner —
    # FFT: F_w.(re, im); DCT: (C_w^T, C_w), mirroring the square (fr, fi)
    # convention below)
    wv_a = wv_at = None
    if basis == "wavelet":
        # fr/fi carry the level-1 (full-size) analysis matrix and its
        # transpose; deeper levels ride in rect_refs as (A_j, A_j^T) pairs.
        # Every slice/concat boundary in the cascade is n >> j with
        # n >> (level-1) >= 128 enforced by the caller, so all lane splits
        # are 128-aligned for Mosaic.
        wv_a = [fr] + [rect_refs[2 * j][...] for j in range(wv_level - 1)]
        wv_at = [fi] + [rect_refs[2 * j + 1][...] for j in range(wv_level - 1)]
        rect_refs = None
        # per-subband threshold map (block-constant over quadrants) is
        # assembled by 2D-iota range tests — elementwise, no concatenation
        # of non-aligned blocks
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col_ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    if rect_refs is not None:
        e0 = rect_refs[0][...]
        e1 = rect_refs[1][...]
    else:
        e0, e1 = (fi, fr) if basis == "dct" else (fr, fi)
    n_scale = float(hw[0] * hw[1]) if hw is not None else float(n * n)
    obr = xr_ref[...]  # the observed slice doubles as the initial iterate
    obi = xi_ref[...]
    mask = mask_ref[...]
    keep = 1.0 - alpha * mask
    gfold = None
    if split is not None:
        # folded split constants: fr/fi carry the G = F_M·diag(tw) stacks,
        # gt refs their transposes (see the folded-constants section above)
        m_, r_ = split
        gfold = _folded_slices(fr, fi, gtre_ref[...], gtim_ref[...],
                               m_, r_, _gauss_enabled())

    # Gauss 3-dot complex products (FFT paths only — DCT/wavelet transform
    # re/im independently with real matrices): precompute the constant-pair
    # sum/diff ONCE, outside the iteration loop, and register them in the
    # dot's split cache so the HIGH (bf16x3) path decomposes each only once
    fs = fd = es = ed = None
    if basis not in ("dct", "wavelet") and split is None and _gauss_enabled():
        fs = fr + fi
        fd = fr - fi
        if e0 is fr:
            es, ed = fs, fd
        else:
            es = e0 + e1
            ed = e0 - e1
    sums = [fs, fd] + ([es, ed] if es is not fs else [])
    if gfold is not None:
        consts = _folded_dot_consts(gfold, _gauss_enabled())
        dot = _make_dot(precision, consts[0], consts[1], *consts[2:])
    else:
        dot = _make_dot(precision, fr, fi, e0, e1,
                        *[c for c in sums if c is not None],
                        *(wv_a[1:] + wv_at[1:] if basis == "wavelet" else ()))

    def one(j, carry):
        xr_prev, xi_prev, xr, xi, v, cost_prev = carry
        if basis == "wavelet":
            # block-constant tau over the Mallat quadrant layout: approx
            # block keeps tau = 0 (pass-through for hard/soft/garrote);
            # level d counts deepest-first to match the flattened decay
            # tree [det_L, ..., det_1] with bands (cH, cV, cD)
            tau = jnp.zeros((n, n), jnp.float32)
            for d in range(wv_level):
                s = n >> (wv_level - d)
                in_lo_r = row_ix < s
                in_hi_r = (row_ix >= s) & (row_ix < 2 * s)
                in_lo_c = col_ix < s
                in_hi_c = (col_ix >= s) & (col_ix < 2 * s)
                t_ch = tau_ref[i, j, 3 * d + 0]
                t_cv = tau_ref[i, j, 3 * d + 1]
                t_cd = tau_ref[i, j, 3 * d + 2]
                tau = jnp.where(in_hi_r & in_lo_c, t_ch, tau)  # cH: high rows
                tau = jnp.where(in_lo_r & in_hi_c, t_cv, tau)  # cV: high cols
                tau = jnp.where(in_hi_r & in_hi_c, t_cd, tau)  # cD: both
        else:
            tau = tau_ref[i, j]
        # per-slice Nesterov schedule with adaptive restart (matches the
        # XLA scan in models/pocs.py exactly); frac == 0 for 'regular'
        v1 = (1.0 + jnp.sqrt(1.0 + 4.0 * v * v)) / 2.0
        f = (v - 1.0) / (v1 + 1.0) if fast else jnp.float32(0.0)
        yr_in = xr + f * (xr - xr_prev)
        yi_in = xi + f * (xi - xi_prev)

        if basis == "wavelet":
            # Mallat cascade as MXU matmuls: level j is A_j @ LL @ A_j^T on
            # the shrinking top-left block (A orthogonal -> inverse is the
            # transpose cascade, scale 1). The wavelet is real, so re/im
            # transform independently; the threshold acts on the joint
            # magnitude exactly like models.transforms.WaveletTransform.
            def _wv_fwd(xx):
                for lv in range(wv_level):
                    nj = n >> lv
                    if lv == 0:
                        xx = dot(dot(wv_a[0], xx), wv_at[0])
                    else:
                        sub = dot(dot(wv_a[lv], xx[:nj, :nj]), wv_at[lv])
                        xx = jnp.concatenate(
                            [jnp.concatenate([sub, xx[:nj, nj:]], 1),
                             xx[nj:, :]], 0)
                return xx

            def _wv_inv(xx):
                for lv in range(wv_level - 1, -1, -1):
                    nj = n >> lv
                    if lv == 0:
                        xx = dot(dot(wv_at[0], xx), wv_a[0])
                    else:
                        sub = dot(dot(wv_at[lv], xx[:nj, :nj]), wv_a[lv])
                        xx = jnp.concatenate(
                            [jnp.concatenate([sub, xx[:nj, nj:]], 1),
                             xx[nj:, :]], 0)
                return xx

            Xr = _wv_fwd(yr_in)
            Xi = _wv_fwd(yi_in)
        elif basis == "dct":
            # orthonormal DCT-II: fr holds C_h, fi holds C_h^T (e0/e1 the
            # W-side pair); re/im transform independently (the DCT is
            # real), thresholds act on the joint magnitude — exactly
            # models.transforms.DCTTransform
            Xr = dot(dot(fr, yr_in), e0)
            Xi = dot(dot(fr, yi_in), e0)
        elif split is not None:
            # Cooley-Tukey split: R M-deep dots per axis (twiddles folded
            # into the per-s matrices), permuted spectrum
            ar, ai = _fast_fwd_left_folded(yr_in, yi_in, dot, gfold, m_, r_)
            Xr, Xi = _fast_fwd_right_folded(ar, ai, dot, gfold, m_, r_)
        else:
            yr, yi = _cmul_left(dot, fr, fi, fs, yr_in, yi_in)
            Xr, Xi = _cmul_right(dot, yr, yi, e0, e1, es)

        shrink = _shrink(Xr * Xr + Xi * Xi, tau, op)
        Xr = Xr * shrink
        Xi = Xi * shrink

        if basis == "wavelet":
            rr = _wv_inv(Xr)
            ri = _wv_inv(Xi)
            scale = 1.0
        elif basis == "dct":
            rr = dot(dot(fi, Xr), e1)
            ri = dot(dot(fi, Xi), e1)
            scale = 1.0
        elif split is not None:
            br, bi = _fast_inv_right_folded(Xr, Xi, dot, gfold, m_, r_)
            rr, ri = _fast_inv_left_folded(br, bi, dot, gfold, m_, r_)
            scale = 1.0 / n_scale
        else:
            yr, yi = _cmul_left_conj(dot, fr, fi, fd, Xr, Xi)
            rr, ri = _cmul_right_conj(dot, yr, yi, e0, e1, ed)
            scale = 1.0 / n_scale
        new_r = rr * scale * keep + alpha * obr
        new_i = ri * scale * keep + alpha * obi

        # per-iteration cost (Gao et al. 2013), needed for the restart test
        # and reported (final iteration) exactly like the XLA scan's
        mag_new = jnp.sqrt(new_r * new_r + new_i * new_i)
        mag_old = jnp.sqrt(xr * xr + xi * xi)
        d = jnp.sum(mag_new - mag_old)
        s = jnp.sum(mag_new)
        cost = (d * d) / jnp.where(s == 0.0, 1.0, s * s)

        if fast:
            # adaptive restart (O'Donoghue & Candès 2015): on a cost
            # increase, re-alias x_prev to the NEW iterate (momentum -> 0
            # next step) and reset the Nesterov counter
            restart = cost > cost_prev
            pr = jnp.where(restart, new_r, xr)
            pi = jnp.where(restart, new_i, xi)
            v_next = jnp.where(restart, 1.0, v1)
        else:
            pr, pi, v_next = xr, xi, v1
        return pr, pi, new_r, new_i, v_next, cost

    init = (obr, obi, obr, obi, jnp.float32(1.0), jnp.float32(jnp.inf))
    _, _, xr_fin, xi_fin, _, cost_fin = jax.lax.fori_loop(0, niter, one, init)
    outr_ref[...] = xr_fin
    outi_ref[...] = xi_fin
    cost_ref[i] = cost_fin


def pocs_solve_fused(
    obs: Cplx,
    mask,
    decay,
    alpha: float = 0.75,
    thresh_op: str = "hard",
    version: str = "fast",
    interpret: bool = False,
    precision=None,
    basis: str = "fft",
    use_split: bool = True,
    wavelet_mats=None,
) -> Cplx:
    """The COMPLETE POCS solve in one kernel launch per slice.

    ``obs``: (B, H, W) pair (H, W multiples of 128); ``mask``: (H, W);
    ``decay``: (niter, B) per-iteration per-slice thresholds;
    ``version='fast'`` runs true Nesterov momentum with adaptive restart
    in-kernel (identical math to the XLA scan); ``basis``: 'fft'
    (matmul-DFT) or 'dct' (orthonormal DCT-II — 4x fewer dots per
    iteration). Returns ``(result, final_cost)`` — the final-iteration cost
    matches the XLA scan's telemetry; per-iteration history / early
    stopping are intentionally not supported (this is the fixed-iteration
    production path; use the XLA scan for instrumented runs). ``use_split``
    enables the in-kernel Cooley-Tukey split for the FFT basis on SQUARE
    slices when N factors as M·R with M >= 128 (4x fewer MXU MACs at 512²;
    exact — see the round-3 section above); rectangular slices run the
    dense path with a per-axis matrix pair. ``basis='wavelet'`` runs the
    Mallat cascade in matmul form (one level = A @ LL @ A^T on the
    shrinking top-left block, A the orthogonal periodized analysis matrix —
    ops/wavelet.py::dwt_matrix): pass the per-level matrices finest-first
    via ``wavelet_mats`` and a PER-SUBBAND ``decay`` of shape
    ``(niter, B, 3·level)`` ordered deepest-level-first (cH, cV, cD) —
    exactly the flattened WaveletTransform decay tree; square slices with
    ``n >> (level-1) >= 128`` keep every matmul and lane split 128-aligned.
    """
    if thresh_op not in _KERNEL_THRESH_OPS:
        raise ValueError("fused kernel supports hard/soft/garrote thresholds")
    if version not in ("regular", "fast"):
        raise ValueError("fused solve supports regular/fast versions")
    if basis not in ("fft", "dct", "wavelet"):
        raise ValueError("fused solve supports fft/dct/wavelet bases")
    b, h, w = obs.re.shape
    n = h
    decay = jnp.asarray(decay, jnp.float32)
    niter = decay.shape[0]
    split = None
    rect = h != w
    extra_inputs = []
    extra_specs = []
    wv_level = 0
    if basis == "wavelet":
        if rect:
            raise ValueError("fused wavelet solve requires square slices")
        if not wavelet_mats:
            raise ValueError("basis='wavelet' requires wavelet_mats "
                             "(per-level analysis matrices, finest first)")
        wv_level = len(wavelet_mats)
        # hard requirement, not an assert: a short decay would index past
        # the SMEM tau block in-kernel (no bounds checking on device)
        if decay.ndim != 3 or decay.shape[2] != 3 * wv_level:
            raise ValueError(
                f"wavelet decay must be (niter, B, 3*level={3 * wv_level}),"
                f" got {decay.shape}")
        fr = np.asarray(wavelet_mats[0], np.float32)
        fi = fr.T.copy()
        for mat in wavelet_mats[1:]:
            a = np.asarray(mat, np.float32)
            extra_inputs += [jnp.asarray(a), jnp.asarray(a.T.copy())]
            extra_specs += [
                pl.BlockSpec(a.shape, lambda i, tau: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(a.shape, lambda i, tau: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
    elif basis == "dct":
        c = dft.dct2_matrix(h)
        fr, fi = c, c.T.copy()
        if rect:
            cw = dft.dct2_matrix(w)
            extra_inputs = [jnp.asarray(cw.T.copy()), jnp.asarray(cw)]
    elif not rect and use_split and dft.fast_split(n):
        # folded Cooley-Tukey split path: fr/fi hold the stacked
        # G = F_M·diag(tw) per-s matrices, the transpose stacks ride along
        # (see the folded-constants section above)
        m_, r_, stacks = _radix_kernel_constants_folded(n)
        split = (m_, r_)
        fr, fi = stacks["gre"], stacks["gim"]
        extra_inputs = [jnp.asarray(stacks["gtre"]),
                        jnp.asarray(stacks["gtim"])]
        extra_specs = [
            pl.BlockSpec((r_ * m_, m_), lambda i, tau: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_ * m_, m_), lambda i, tau: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        fr, fi = dft.dft_matrices(h)
        if rect:
            wr_, wi_ = dft.dft_matrices(w)
            extra_inputs = [jnp.asarray(wr_), jnp.asarray(wi_)]
    if rect:
        extra_specs = [
            pl.BlockSpec((w, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
        ]
    fshape = fr.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fshape, lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fshape, lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            # per-slice scalar cost: Mosaic rejects rank-1 blocks smaller
            # than the full array unless 128-multiples (interpret mode
            # masked this; caught by an on-device lowering run), so every
            # program sees the WHOLE (b,) vector in SMEM and writes its own
            # cost_ref[program_id] slot
            pl.BlockSpec((b,), lambda i, tau: (0,), memory_space=pltpu.SMEM),
        ],
    )

    def kernel(tau_ref, xr, xi, mask_r, fr_r, fi_r, *rest):
        *ex_refs, outr, outi, cost = rest
        _solve_kernel(
            tau_ref, xr.at[0], xi.at[0], mask_r, fr_r, fi_r,
            outr.at[0], outi.at[0], cost,
            n=n, alpha=float(alpha), op=thresh_op,
            niter=int(niter),
            precision=(precision if precision is not None
                       else jax.lax.Precision.HIGHEST),
            fast=(version == "fast"),
            basis=basis,
            split=split,
            gtre_ref=ex_refs[0] if split else None,
            gtim_ref=ex_refs[1] if split else None,
            rect_refs=ex_refs if (rect or wv_level > 1) else None,
            hw=(h, w) if rect else None,
            wv_level=wv_level,
        )

    outr, outi, cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if _PALLAS_OK and not interpret else None,
        interpret=interpret,
    )(
        # scalar-prefetch thresholds: (B, niter) tau_ref[i, j], or
        # (B, niter, 3·level) tau_ref[i, j, k] for the wavelet basis
        jnp.transpose(decay, (1, 0, 2)) if basis == "wavelet" else decay.T,
        obs.re, obs.im,
        jnp.asarray(mask, jnp.float32),
        jnp.asarray(fr), jnp.asarray(fi),
        *extra_inputs,
    )
    return Cplx(outr, outi), cost
