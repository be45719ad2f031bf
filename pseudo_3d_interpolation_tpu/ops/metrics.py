"""Reconstruction-quality metrics: SNR, PSNR, Immerkær noise level.

reference: pseudo_3D_interpolation/functions/signal.py:10-90. Batched,
jit-compatible; reductions run over the trailing axes given by ``axis``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.rescale import rescale


def snr(x, y, axis=None):
    """Signal-to-noise ratio (dB) of reconstruction ``y`` against truth ``x``.

    ``10 log10(sum(x^2) / sum((x - y)^2))`` — Yang et al. (2012). Returns
    ``inf`` where the arrays match exactly. Complex inputs use magnitudes of
    the difference/signal (|.|^2), reducing to the reference formula for real
    data.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    num = jnp.sum(jnp.abs(x) ** 2, axis=axis)
    den = jnp.sum(jnp.abs(x - y) ** 2, axis=axis)
    return jnp.where(den == 0, jnp.inf, 10.0 * jnp.log10(num / jnp.where(den == 0, 1.0, den)))


def psnr(x, y, max_pixel=1.0, axis=None):
    """Peak signal-to-noise ratio (dB).

    Matches the reference formula ``10 log10(max_pixel / sqrt(MSE))``
    (functions/signal.py:37-62); ``max_pixel=None`` uses ``max(x)``.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    mse = jnp.mean(jnp.abs(x - y) ** 2, axis=axis)
    peak = jnp.max(x.real, axis=axis) if max_pixel is None else max_pixel
    return jnp.where(mse == 0, jnp.inf, 10.0 * jnp.log10(peak / jnp.sqrt(jnp.where(mse == 0, 1.0, mse))))


def immerkaer_noise_level(img):
    """Immerkær (1996) fast noise variance estimate of a 2D image.

    The image is rescaled to [0, 255], convolved ('full') with the Laplacian
    difference mask, and the absolute response averaged
    (reference: functions/signal.py:65-90). Shape ``(H, W)`` -> scalar.
    """
    img = rescale(jnp.asarray(img, jnp.float32), 0.0, 255.0)
    h, w = img.shape
    mask = jnp.asarray([[1.0, -2.0, 1.0], [-2.0, 4.0, -2.0], [1.0, -2.0, 1.0]], jnp.float32)
    # 'full' convolution = conv with 2-pixel zero padding on each side
    padded = jnp.pad(img, 2)
    resp = _conv2d_valid(padded, mask)
    sigma = jnp.sum(jnp.abs(resp))
    return sigma * jnp.sqrt(0.5 * jnp.pi) / (6.0 * (w - 2) * (h - 2))


def _conv2d_valid(img, kernel):
    """2D 'valid' convolution (true convolution: kernel flipped) via XLA conv."""
    import jax.lax as lax

    k = kernel[::-1, ::-1]
    out = lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]
