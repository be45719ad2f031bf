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
from .pocs_iter import (_KERNEL_THRESH_OPS, _PALLAS_OK, _cmul_left,
                        _cmul_left_conj, _cmul_right, _cmul_right_conj,
                        _gauss_enabled, _make_dot, _shrink,
                        tpu_lowering_available)

if _PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def subband_supported(shape, thresh_op: str, interpret: bool = False) -> bool:
    """Whether the fused subband kernel supports this configuration on the
    active backend (TPU, or any backend under ``interpret``)."""
    if (not _PALLAS_OK or thresh_op not in _KERNEL_THRESH_OPS
            or not tpu_lowering_available(interpret)):
        return False
    h, w = shape[-2], shape[-1]
    return h % 128 == 0 and w % 128 == 0


def subband_layout(shape) -> str:
    """Spectral layout the kernel will use for this shape: ``'permuted'``
    (square with a fast Cooley-Tukey split — in-kernel radix transforms on
    the permuted spectrum) or ``'natural'`` (dense per-axis DFT matrices;
    rectangular slices and squares without a fast split)."""
    h, w = shape[-2], shape[-1]
    if h == w and dft.fast_split(h) is not None:
        return "permuted"
    return "natural"


def _kernel(tau_ref, xr_ref, xi_ref, psi_ref, g_refs, accr_ref, acci_ref,
            *, n: int, m: int, r: int, op: str, precision):
    from .pocs_iter import (_fast_fwd_left_folded, _fast_fwd_right_folded,
                            _fast_inv_left_folded, _fast_inv_right_folded,
                            _folded_dot_consts, _folded_slices)

    b = pl.program_id(0)
    l = pl.program_id(1)
    tau = tau_ref[b, l]
    p = psi_ref[...]
    gauss = _gauss_enabled()
    g = _folded_slices(*(ref[...] for ref in g_refs), m, r, gauss)
    consts = _folded_dot_consts(g, gauss)
    dot = _make_dot(precision, consts[0], consts[1], *consts[2:])

    prod_r = xr_ref[...] * p
    prod_i = xi_ref[...] * p
    # natural-order spatial coefficients (inverse from permuted layout)
    br, bi = _fast_inv_right_folded(prod_r, prod_i, dot, g, m, r)
    cr, ci = _fast_inv_left_folded(br, bi, dot, g, m, r)
    scale = 1.0 / (n * n)
    cr = cr * scale
    ci = ci * scale

    shrink = _shrink(cr * cr + ci * ci, tau, op)
    cr = cr * shrink
    ci = ci * shrink

    ar, ai = _fast_fwd_left_folded(cr, ci, dot, g, m, r)
    vr, vi = _fast_fwd_right_folded(ar, ai, dot, g, m, r)

    @pl.when(l == 0)
    def _init():
        accr_ref[...] = vr * p
        acci_ref[...] = vi * p

    @pl.when(l > 0)
    def _accum():
        accr_ref[...] = accr_ref[...] + vr * p
        acci_ref[...] = acci_ref[...] + vi * p


def _kernel_spatial(tau_ref, xr_ref, xi_ref, psi_ref, g_refs, outr_ref,
                    outi_ref, Xr_s, Xi_s, accr_s, acci_s, *, n: int, m: int,
                    r: int, lcount: int, op: str, precision):
    """Spatial-I/O variant (round 5): the top-level spectral round trip is
    folded INTO the kernel — the l==0 step computes the slice's permuted
    spectrum into VMEM scratch (reused by every subband step of that
    slice), and the l==L-1 step inverts the accumulated spectral update
    and writes the SPATIAL result. Removes the XLA fft2_permuted /
    ifft2_from_permuted stages and their HBM round trips of the spectrum
    and accumulator (the per-iteration MAC count is identical — the two
    transforms just moved in here)."""
    from .pocs_iter import (_fast_fwd_left_folded, _fast_fwd_right_folded,
                            _fast_inv_left_folded, _fast_inv_right_folded,
                            _folded_dot_consts, _folded_slices)

    b = pl.program_id(0)
    l = pl.program_id(1)
    tau = tau_ref[b, l]
    p = psi_ref[...]
    gauss = _gauss_enabled()
    g = _folded_slices(*(ref[...] for ref in g_refs), m, r, gauss)
    consts = _folded_dot_consts(g, gauss)
    dot = _make_dot(precision, consts[0], consts[1], *consts[2:])
    scale = 1.0 / (n * n)

    @pl.when(l == 0)
    def _fwd():
        ar, ai = _fast_fwd_left_folded(xr_ref[...], xi_ref[...], dot, g,
                                       m, r)
        Xr, Xi = _fast_fwd_right_folded(ar, ai, dot, g, m, r)
        Xr_s[...] = Xr
        Xi_s[...] = Xi

    prod_r = Xr_s[...] * p
    prod_i = Xi_s[...] * p
    br, bi = _fast_inv_right_folded(prod_r, prod_i, dot, g, m, r)
    cr, ci = _fast_inv_left_folded(br, bi, dot, g, m, r)
    cr = cr * scale
    ci = ci * scale

    shrink = _shrink(cr * cr + ci * ci, tau, op)
    cr = cr * shrink
    ci = ci * shrink

    ar, ai = _fast_fwd_left_folded(cr, ci, dot, g, m, r)
    vr, vi = _fast_fwd_right_folded(ar, ai, dot, g, m, r)

    @pl.when(l == 0)
    def _init():
        accr_s[...] = vr * p
        acci_s[...] = vi * p

    @pl.when(l > 0)
    def _accum():
        accr_s[...] = accr_s[...] + vr * p
        acci_s[...] = acci_s[...] + vi * p

    @pl.when(l == lcount - 1)
    def _inv():
        br2, bi2 = _fast_inv_right_folded(accr_s[...], acci_s[...], dot, g,
                                          m, r)
        rr, ri = _fast_inv_left_folded(br2, bi2, dot, g, m, r)
        outr_ref[...] = rr * scale
        outi_ref[...] = ri * scale


def _kernel_dense(tau_ref, xr_ref, xi_ref, psi_ref, fhr_ref, fhi_ref,
                  fwr_ref, fwi_ref, accr_ref, acci_ref, *, h: int, w: int,
                  op: str, precision):
    """Natural-order variant: dense (H, H)/(W, W) DFT matrix pairs instead
    of the radix split — rectangular slices and non-split squares."""
    b = pl.program_id(0)
    l = pl.program_id(1)
    tau = tau_ref[b, l]
    fhr = fhr_ref[...]
    fhi = fhi_ref[...]
    fwr = fwr_ref[...]
    fwi = fwi_ref[...]
    p = psi_ref[...]
    gauss = _gauss_enabled()
    fhs = fhr + fhi if gauss else None
    fhd = fhr - fhi if gauss else None
    if fwr is fhr:
        fws, fwd_ = fhs, fhd
    else:
        fws = fwr + fwi if gauss else None
        fwd_ = fwr - fwi if gauss else None
    sums = [fhs, fhd] + ([fws, fwd_] if fws is not fhs else [])
    dot = _make_dot(precision, fhr, fhi, fwr, fwi,
                    *[c for c in sums if c is not None])

    xr = xr_ref[...] * p
    xi = xi_ref[...] * p
    # ifft2: conj(F_h) @ X @ conj(F_w) / (H·W)
    yr, yi = _cmul_left_conj(dot, fhr, fhi, fhd, xr, xi)
    cr, ci = _cmul_right_conj(dot, yr, yi, fwr, fwi, fwd_)
    scale = 1.0 / (h * w)
    cr = cr * scale
    ci = ci * scale

    shrink = _shrink(cr * cr + ci * ci, tau, op)
    cr = cr * shrink
    ci = ci * shrink

    # fft2: F_h @ ĉ @ F_w
    yr, yi = _cmul_left(dot, fhr, fhi, fhs, cr, ci)
    vr, vi = _cmul_right(dot, yr, yi, fwr, fwi, fws)

    @pl.when(l == 0)
    def _init():
        accr_ref[...] = vr * p
        acci_ref[...] = vi * p

    @pl.when(l > 0)
    def _accum():
        accr_ref[...] = accr_ref[...] + vr * p
        acci_ref[...] = acci_ref[...] + vi * p


def _box_kernel(tau_ref, xbr_ref, xbi_ref, psi_ref, ahr_ref, ahi_ref,
                ahtr_ref, ahti_ref, awr_ref, awi_ref, awtr_ref, awti_ref,
                mr_ref, mi_ref, *, n_h: int, n_w: int, op: str, precision):
    """One support-cropped subband's POCS round trip, VMEM-resident.

    Operands per grid step (b, l): the group's box spectrum ``xb``
    (sr, sc), window ``psi_l`` (sr, sc), and the constant partial-DFT
    matrices A_h = F[idx_h] (sr, N_h) / A_w = F[idx_w] (sc, N_w) plus
    their transposes. The body mirrors ops/shearlet.py::_box_group_spatial
    exactly: c = A_h^H (xb·ψ) A_w^* / (N_h·N_w) is the FULL-resolution
    spatial coefficient field (thresholding happens at N_h×N_w — the box
    only compresses the transforms, never the nonlinearity), then the
    thresholded field projects back to the box, W = A_h ĉ A_w^T, and the
    ψ-weighted boxes accumulate across l.
    """
    b = pl.program_id(0)
    l = pl.program_id(1)
    tau = tau_ref[b, l]
    ahr = ahr_ref[...]
    ahi = ahi_ref[...]
    ahtr = ahtr_ref[...]
    ahti = ahti_ref[...]
    awr = awr_ref[...]
    awi = awi_ref[...]
    awtr = awtr_ref[...]
    awti = awti_ref[...]
    p = psi_ref[...]
    gauss = _gauss_enabled()
    # only the sum/diff each product form actually needs: the backprojection
    # uses conj forms of (aht, aw), the forward projection plain forms of
    # (ah, awt)
    ahtd = ahtr - ahti if gauss else None
    awd = awr - awi if gauss else None
    ahs = ahr + ahi if gauss else None
    awts = awtr + awti if gauss else None
    # every constant matrix goes into the dot's identity-keyed cache so the
    # HIGH (bf16x3) path splits each one into hi/lo bf16 parts ONCE
    dot = _make_dot(precision, ahr, ahi, ahtr, ahti, awr, awi, awtr, awti,
                    *[c for c in (ahtd, awd, ahs, awts) if c is not None])

    vr = xbr_ref[...] * p
    vi = xbi_ref[...] * p
    # c = A_h^H V A_w^*  (inverse DFT restricted to the box's frequencies)
    yr, yi = _cmul_left_conj(dot, ahtr, ahti, ahtd, vr, vi)
    cr, ci = _cmul_right_conj(dot, yr, yi, awr, awi, awd)
    scale = 1.0 / (n_h * n_w)
    cr = cr * scale
    ci = ci * scale

    shrink = _shrink(cr * cr + ci * ci, tau, op)
    cr = cr * shrink
    ci = ci * shrink

    # W = A_h ĉ A_w^T  (forward DFT evaluated only at the box)
    yr, yi = _cmul_left(dot, ahr, ahi, ahs, cr, ci)
    wr, wi = _cmul_right(dot, yr, yi, awtr, awti, awts)

    @pl.when(l == 0)
    def _init():
        mr_ref[...] = wr * p
        mi_ref[...] = wi * p

    @pl.when(l > 0)
    def _accum():
        mr_ref[...] = mr_ref[...] + wr * p
        mi_ref[...] = mi_ref[...] + wi * p


def box_group_supported(sr: int, sc: int, n_h: int, n_w: int,
                        thresh_op: str, interpret: bool = False) -> bool:
    """Whether the fused box-group kernel supports this configuration:
    sublane-aligned box sides (the plan's _box_indices pads to multiples
    of 8 with zero-psi frequencies) on lane-aligned slices, on the active
    backend (TPU, or any backend under ``interpret``).
    ``P3D_NO_BOX_KERNEL=1`` force-disables it (XLA spatial-projection
    fallback) — operational escape hatch for hardware/toolchain versions
    where the small-box dot shapes fail Mosaic lowering."""
    import os

    if os.environ.get("P3D_NO_BOX_KERNEL"):
        return False
    return (_PALLAS_OK and thresh_op in _KERNEL_THRESH_OPS
            and tpu_lowering_available(interpret)
            and sr % 8 == 0 and sc % 8 == 0
            and n_h % 128 == 0 and n_w % 128 == 0)


def box_group_update_fused(
    xbox: Cplx,
    psi,
    tau,
    mats,
    n_h: int,
    n_w: int,
    thresh_op: str = "hard",
    precision=None,
    interpret: bool = False,
) -> Cplx:
    """Fused Σ_l ψ_l·proj_box(threshold(backproj(xbox·ψ_l))) for ONE
    support-cropped group.

    ``xbox``: (B, sr, sc) box spectrum pair (``_partial_fft2`` of the
    spatial iterate). ``psi``: (lg, sr, sc) window stack. ``tau``:
    (B, lg). ``mats``: the 8-tuple of constant partial-DFT f32 matrices
    (ahr, ahi, ahtr, ahti, awr, awi, awtr, awti) with A = F[idx] —
    see :func:`_box_kernel`. Returns the (B, sr, sc) ψ-weighted summed
    box; the caller inverts it with ONE ``_partial_ifft2``.

    Versus the XLA spatial-projection path this keeps the (N_h, N_w)
    spatial field of every subband VMEM-resident instead of streaming it
    through HBM (the XLA path materializes (B, lg, N_h, N_w) stacks —
    measured ~17% of the directional iteration at 512², more at 1024²
    where the 136-box group is below the zero-pad-to-full threshold).
    """
    b, sr, sc = xbox.re.shape
    lcount = psi.shape[0]
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST
    ahr, ahi, ahtr, ahti, awr, awi, awtr, awti = mats

    def kernel(tau_ref, xbr, xbi, psi_r, a0, a1, a2, a3, a4, a5, a6, a7,
               mr, mi):
        _box_kernel(tau_ref, xbr.at[0], xbi.at[0], psi_r.at[0],
                    a0, a1, a2, a3, a4, a5, a6, a7, mr.at[0], mi.at[0],
                    n_h=n_h, n_w=n_w, op=thresh_op, precision=prec)

    def _const_spec(a):
        return pl.BlockSpec(a.shape, lambda i, j, tau: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, lcount),
        in_specs=[
            pl.BlockSpec((1, sr, sc), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sc), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sc), lambda i, j, tau: (j, 0, 0), memory_space=pltpu.VMEM),
        ] + [_const_spec(a) for a in mats],
        out_specs=[
            pl.BlockSpec((1, sr, sc), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sc), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    mr, mi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, sr, sc), jnp.float32),
            jax.ShapeDtypeStruct((b, sr, sc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        if _PALLAS_OK and not interpret else None,
        interpret=interpret,
    )(
        jnp.asarray(tau, jnp.float32),
        xbox.re, xbox.im,
        psi,
        *mats,
    )
    return Cplx(mr, mi)


def subband_update_fused(
    x_spec: Cplx,
    psi,
    tau,
    thresh_op: str = "hard",
    precision=None,
    interpret: bool = False,
    layout: str = "permuted",
    spatial_io: bool = False,
) -> Cplx:
    """Fused Σ_l fft2(threshold(ifft2(X·psi_l)))·psi_l over full-size
    subbands.

    ``layout='permuted'`` (square slices with a fast split): ``x_spec`` is
    the (B, N, N) radix-permuted spectrum pair from ``dft.fft2_permuted``
    and ``psi`` the equally permuted (L, N, N) real window stack; the
    returned accumulator inverts with ``dft.ifft2_from_permuted``.
    ``layout='natural'`` (rectangular slices / non-split squares):
    ``x_spec`` is the plain ``dft.fft2`` (B, H, W) spectrum, ``psi`` the
    natural-order stack, and the result inverts with ``dft.ifft2``.
    ``tau``: (B, L) per-slice per-subband thresholds.

    ``spatial_io=True`` (permuted layout only): ``x_spec`` is the SPATIAL
    (B, N, N) slice pair and the return value is the SPATIAL update —
    the top-level fft2_permuted / ifft2_from_permuted run inside the
    kernel via VMEM scratch (see :func:`_kernel_spatial`).
    """
    b, h, w = x_spec.re.shape
    lcount = psi.shape[0]
    prec = precision if precision is not None else jax.lax.Precision.HIGHEST

    if spatial_io and layout != "permuted":
        raise ValueError("spatial_io requires the permuted layout")
    scratch_shapes = ()
    if layout == "permuted":
        assert h == w, "permuted layout requires square slices"
        n = h
        from .pocs_iter import (_FOLDED_KEYS, _radix_kernel_constants_folded)

        m, r, stacks = _radix_kernel_constants_folded(n)
        const_inputs = [jnp.asarray(stacks[k]) for k in _FOLDED_KEYS]
        const_specs = [
            pl.BlockSpec((r * m, m), lambda i, j, tau: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in _FOLDED_KEYS
        ]

        if spatial_io:
            # spectrum + accumulator scratch (see _kernel_spatial)
            scratch_shapes = tuple(pltpu.VMEM((h, w), jnp.float32)
                                   for _ in range(4))

            def kernel(tau_ref, xr, xi, psi_r, *rest):
                *g_refs, outr, outi, Xr_s, Xi_s, accr_s, acci_s = rest
                _kernel_spatial(tau_ref, xr.at[0], xi.at[0], psi_r.at[0],
                                g_refs, outr.at[0], outi.at[0],
                                Xr_s, Xi_s, accr_s, acci_s,
                                n=n, m=m, r=r, lcount=lcount, op=thresh_op,
                                precision=prec)
        else:
            def kernel(tau_ref, xr, xi, psi_r, *rest):
                *g_refs, accr, acci = rest
                _kernel(tau_ref, xr.at[0], xi.at[0], psi_r.at[0], g_refs,
                        accr.at[0], acci.at[0],
                        n=n, m=m, r=r, op=thresh_op, precision=prec)
    elif layout == "natural":
        fhr, fhi = dft.dft_matrices(h)
        fwr, fwi = (fhr, fhi) if w == h else dft.dft_matrices(w)
        const_inputs = [jnp.asarray(fhr), jnp.asarray(fhi),
                        jnp.asarray(fwr), jnp.asarray(fwi)]
        const_specs = [
            pl.BlockSpec((h, h), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
        ]

        def kernel(tau_ref, xr, xi, psi_r, fhr_r, fhi_r, fwr_r, fwi_r,
                   accr, acci):
            _kernel_dense(tau_ref, xr.at[0], xi.at[0], psi_r.at[0],
                          fhr_r, fhi_r, fwr_r, fwi_r,
                          accr.at[0], acci.at[0],
                          h=h, w=w, op=thresh_op, precision=prec)
    else:
        raise ValueError(f"unknown layout {layout!r}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, lcount),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j, tau: (j, 0, 0), memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch_shapes,
    )

    accr, acci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        if _PALLAS_OK and not interpret else None,
        interpret=interpret,
    )(
        jnp.asarray(tau, jnp.float32),
        x_spec.re, x_spec.im,
        jnp.asarray(psi, jnp.float32),
        *const_inputs,
    )
    return Cplx(accr, acci)
