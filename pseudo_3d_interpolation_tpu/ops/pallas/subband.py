"""Fused full-size subband update for spectral-stack bases (SHEARLET /
CURVELET) as a Pallas TPU kernel.

The directional POCS hot loop spends its time on the finest-scale
subbands: at 512² that is 32 (shearlet) full-resolution
ifft2 -> threshold -> fft2 round trips per iteration. The XLA streamed
path (ops/shearlet.py::pocs_subband_apply) already avoids materializing
the (B, L, H, W) stack, but each scan step still runs its butterflies and
matmul stages through HBM. This kernel performs the whole per-subband
round trip VMEM-resident:

    for each (slice b, subband l) grid step:
        prod = X_b · psi_l                      (elementwise, spectral)
        c    = ifft2(prod)                      (radix split, in-VMEM)
        ĉ    = threshold(c, tau[b, l])          (hard / soft / garrote)
        acc_b += fft2(ĉ) · psi_l                (radix split, in-VMEM)

Spectra live in the radix-PERMUTED layout (ops/dft.py::radix_perm): the
split's s-block order, which elementwise ops don't care about and which
lets the in-kernel transforms skip the interleave. The caller supplies
``X`` from ``dft.fft2_permuted`` and equally permuted ``psi``; the
returned accumulator inverts with ``dft.ifft2_from_permuted``.

The grid is (B, L) with l innermost: X and the accumulator stay resident
per slice while the psi stack streams from HBM (~1 MB per subband at
512²). Requires square slices whose side has a fast split (N = M·R,
M >= 128) — callers fall back to the XLA streamed path otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import dft
from ..cplx import Cplx
from .pocs_iter import (_KERNEL_THRESH_OPS, _PALLAS_OK, _fast_fwd_left,
                        _fast_fwd_right, _fast_inv_left, _fast_inv_right,
                        _make_dot, _radix_kernel_constants, _shrink)

if _PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def subband_supported(shape, thresh_op: str) -> bool:
    """Whether the fused subband kernel supports this configuration."""
    if not _PALLAS_OK or thresh_op not in _KERNEL_THRESH_OPS:
        return False
    h, w = shape[-2], shape[-1]
    return h == w and h % 128 == 0 and dft.fast_split(h) is not None


def _kernel(tau_ref, xr_ref, xi_ref, psi_ref, fmr_ref, fmi_ref, twl_ref,
            twr_ref, accr_ref, acci_ref, *, n: int, m: int, r: int, w_r,
            op: str, precision):
    b = pl.program_id(0)
    l = pl.program_id(1)
    tau = tau_ref[b, l]
    fmr = fmr_ref[...]
    fmi = fmi_ref[...]
    twl = twl_ref[...]
    twr = twr_ref[...]
    p = psi_ref[...]
    dot = _make_dot(precision, fmr, fmi)

    prod_r = xr_ref[...] * p
    prod_i = xi_ref[...] * p
    # natural-order spatial coefficients (inverse from permuted layout)
    br, bi = _fast_inv_right(prod_r, prod_i, dot, fmr, fmi, twr, w_r, m, r)
    cr, ci = _fast_inv_left(br, bi, dot, fmr, fmi, twl, w_r, m, r)
    scale = 1.0 / (n * n)
    cr = cr * scale
    ci = ci * scale

    shrink = _shrink(cr * cr + ci * ci, tau, op)
    cr = cr * shrink
    ci = ci * shrink

    ar, ai = _fast_fwd_left(cr, ci, dot, fmr, fmi, twl, w_r, m, r)
    vr, vi = _fast_fwd_right(ar, ai, dot, fmr, fmi, twr, w_r, m, r)

    @pl.when(l == 0)
    def _init():
        accr_ref[...] = vr * p
        acci_ref[...] = vi * p

    @pl.when(l > 0)
    def _accum():
        accr_ref[...] = accr_ref[...] + vr * p
        acci_ref[...] = acci_ref[...] + vi * p


def subband_update_fused(
    x_perm: Cplx,
    psi_perm,
    tau,
    thresh_op: str = "hard",
    precision=None,
    interpret: bool = False,
) -> Cplx:
    """Fused Σ_l fft2(threshold(ifft2(X·psi_l)))·psi_l over full-size
    subbands.

    ``x_perm``: (B, N, N) radix-permuted spectrum pair; ``psi_perm``:
    (L, N, N) equally permuted real window stack; ``tau``: (B, L)
    per-slice per-subband thresholds. Returns the (B, N, N) permuted
    spectrum accumulator.
    """
    b, n, n2 = x_perm.re.shape
    assert n == n2, "square slices required"
    lcount = psi_perm.shape[0]
    m, r, w_r, fmr, fmi, twl, twr_pack = _radix_kernel_constants(n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, lcount),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i, j, tau: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 16), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    def kernel(tau_ref, xr, xi, psi, fmr_r, fmi_r, twl_r, twr_r, accr, acci):
        _kernel(tau_ref, xr.at[0], xi.at[0], psi.at[0], fmr_r, fmi_r,
                twl_r, twr_r, accr.at[0], acci.at[0],
                n=n, m=m, r=r, w_r=w_r, op=thresh_op,
                precision=(precision if precision is not None
                           else jax.lax.Precision.HIGHEST))

    accr, acci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        if _PALLAS_OK and not interpret else None,
        interpret=interpret,
    )(
        jnp.asarray(tau, jnp.float32),
        x_perm.re, x_perm.im,
        jnp.asarray(psi_perm, jnp.float32),
        jnp.asarray(fmr), jnp.asarray(fmi),
        jnp.asarray(twl), jnp.asarray(twr_pack),
    )
    return Cplx(accr, acci)
