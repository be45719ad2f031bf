"""Sparse-transform protocol for the POCS solver.

The reference drives POCS with closure pairs (np.fft.fft2/ifft2, pywt
wavedec2/waverec2, FFST shearlets, curvelops FDCT — reference:
cube_POCS_interpolation_3D.py:255-286). Here each basis is a small
*static* object with four methods, so one scan-based solver handles any
transform under ``jit`` without Python branching inside the trace:

    forward(z: Cplx)          -> coeffs (pytree)
    inverse(coeffs)           -> Cplx
    decay(coeffs, ...)        -> pytree of per-leaf (niter, *batch) schedules
    threshold(coeffs, t, op)  -> coeffs

Coefficient pytrees carry complex data as ``Cplx`` pairs (TPU has no native
complex support; see ops/cplx.py). Batch axes lead: slices are (..., H, W).

Transform instances are hashable/static so they can be closed over or passed
as ``static_argnums`` to jit.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops import decay as decay_ops
from ..ops import dft
from ..ops import threshold as threshold_ops
from ..ops.cplx import Cplx


@dataclasses.dataclass(frozen=True)
class FFTTransform:
    """2D Fourier basis via MXU matmul-DFT (reference FFT kind)."""

    kind: str = "FFT"

    def forward(self, z: Cplx) -> Cplx:
        return dft.fft2(z)

    def inverse(self, coeffs: Cplx) -> Cplx:
        return dft.ifft2(coeffs)

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        return decay_ops.threshold_decay(
            coeffs.abs(), model, niter, p_max=p_max, p_min=p_min, kind=decay_kind
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        # t: (*batch,) per-slice threshold -> broadcast over the slice
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)


@dataclasses.dataclass(frozen=True)
class DCTTransform:
    """2D orthonormal DCT basis — real, single-matmul, cheapest on TPU.

    Listed as a supported kind by the reference (functions/POCS.py:235). For
    complex slices the DCT acts on re/im independently (it is linear), while
    thresholding acts on the joint magnitude.
    """

    kind: str = "DCT"

    def forward(self, z: Cplx) -> Cplx:
        return Cplx(dft.dct2_2d(z.re), dft.dct2_2d(z.im))

    def inverse(self, coeffs: Cplx) -> Cplx:
        return Cplx(dft.idct2_2d(coeffs.re), dft.idct2_2d(coeffs.im))

    def decay(self, coeffs: Cplx, model, niter, p_max, p_min, decay_kind):
        return decay_ops.threshold_decay(
            coeffs.abs(), model, niter, p_max=p_max, p_min=p_min, kind=decay_kind
        )

    def threshold(self, coeffs: Cplx, t, op: str) -> Cplx:
        return threshold_ops.threshold_pair(coeffs, t[..., None, None], kind=op)


_REGISTRY = {}


def register_transform(name: str, factory) -> None:
    """Register a transform factory under an (upper-case) kind name."""
    _REGISTRY[name.upper()] = factory


register_transform("FFT", lambda **kw: FFTTransform())
register_transform("DCT", lambda **kw: DCTTransform())


def get_transform(kind: str, **kwargs):
    """Build a transform by reference kind name (FFT/DCT/WAVELET/SHEARLET)."""
    kind = kind.upper()
    if kind not in _REGISTRY:
        raise ValueError(
            f"Unsupported transform {kind!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[kind](**kwargs)
