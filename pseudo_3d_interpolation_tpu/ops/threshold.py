"""Sparse-coefficient threshold operators (soft / hard / non-negative garrote).

Semantics follow PyWavelets' thresholding (the reference uses pywt's operators
or its own fallbacks: pseudo_3D_interpolation/functions/threshold_operator.py,
functions/POCS.py:43-102). Percentile variants interpret the threshold as a
percentile of ``|x|`` computed on the fly.

All operators:
  * accept real or complex inputs (threshold applies to the magnitude,
    shrinkage preserves phase),
  * broadcast the threshold against the input, so batched use passes a
    per-slice threshold shaped ``(..., 1, 1)`` against ``(..., H, W)``
    coefficients,
  * are pure jnp elementwise chains — XLA fuses them into surrounding
    FFT/matmul epilogues on TPU (no separate HBM round-trip).
"""

from __future__ import annotations

import jax.numpy as jnp

THRESHOLD_KINDS = (
    "soft",
    "hard",
    "garrote",
    "soft-percentile",
    "hard-percentile",
    "garrote-percentile",
)


def soft(x, value, substitute=0.0):
    """Soft threshold: shrink magnitudes by ``value``, zero below it."""
    x = jnp.asarray(x)
    mag = jnp.abs(x)
    denom = jnp.where(mag == 0, 1.0, mag)
    shrink = jnp.clip(1.0 - value / denom, 0.0, None)
    out = x * shrink
    if _is_zero(substitute):
        return out
    return jnp.where(mag < value, jnp.asarray(substitute, out.dtype), out)


def hard(x, value, substitute=0.0):
    """Hard threshold: keep values with ``|x| >= value``, substitute the rest."""
    x = jnp.asarray(x)
    return jnp.where(jnp.abs(x) < value, jnp.asarray(substitute, x.dtype), x)


def garrote(x, value, substitute=0.0):
    """Non-negative garrote: ``x * max(1 - value^2 / |x|^2, 0)``."""
    x = jnp.asarray(x)
    mag2 = jnp.abs(x) ** 2
    denom = jnp.where(mag2 == 0, 1.0, mag2)
    shrink = jnp.clip(1.0 - (value * value) / denom, 0.0, None)
    out = x * shrink
    if _is_zero(substitute):
        return out
    return jnp.where(mag2 < value * value, jnp.asarray(substitute, out.dtype), out)


def _is_zero(substitute) -> bool:
    """True when the substitute is the static scalar 0 (fast path)."""
    return isinstance(substitute, (int, float)) and substitute == 0


def _percentile_from_mag(mag, perc):
    """Per-slice percentile threshold from magnitudes (..., H, W).

    ``perc`` may be a scalar or a per-slice array broadcastable to the batch
    shape (e.g. from a decay schedule of factors). Returns
    ``mag.shape[:-2] + (1, 1)``.
    """
    import jax

    batch_shape = mag.shape[:-2]
    flat = mag.reshape(batch_shape + (-1,))
    if jnp.ndim(perc) == 0:
        t = jnp.percentile(flat, perc, axis=-1)
    else:
        q = jnp.asarray(perc)
        while q.ndim > len(batch_shape):  # strip trailing broadcast dims
            q = q[..., 0]
        q = jnp.broadcast_to(q, batch_shape).reshape(-1)
        t = jax.vmap(lambda v, p: jnp.percentile(v, p))(
            flat.reshape((-1, flat.shape[-1])), q
        ).reshape(batch_shape)
    return t[..., None, None]


def _percentile_threshold(x, perc):
    """Per-slice percentile of |x| over the trailing two axes."""
    return _percentile_from_mag(jnp.abs(x), perc)


def soft_pair(z, value):
    """Soft threshold of a ``Cplx`` (re, im) pair by magnitude, phase-preserving."""
    mag = z.abs()
    denom = jnp.where(mag == 0, 1.0, mag)
    shrink = jnp.clip(1.0 - value / denom, 0.0, None)
    return type(z)(z.re * shrink, z.im * shrink)


def hard_pair(z, value):
    """Hard threshold of a ``Cplx`` pair: zero where ``|z| < value``."""
    keep = (z.abs2() >= value * value).astype(z.re.dtype)
    return type(z)(z.re * keep, z.im * keep)


def garrote_pair(z, value):
    """Non-negative garrote threshold of a ``Cplx`` pair by magnitude."""
    mag2 = z.abs2()
    denom = jnp.where(mag2 == 0, 1.0, mag2)
    shrink = jnp.clip(1.0 - (value * value) / denom, 0.0, None)
    return type(z)(z.re * shrink, z.im * shrink)


def _percentile_threshold_pair(z, perc):
    return _percentile_from_mag(z.abs(), perc)


def threshold_pair(z, value, kind: str = "soft"):
    """Dispatch magnitude threshold on a ``Cplx`` pair (TPU-native complex).

    Equivalent to :func:`threshold` on native complex arrays; substitution is
    not supported in pair form (the solver never uses it).
    """
    if kind == "soft":
        return soft_pair(z, value)
    if kind == "hard":
        return hard_pair(z, value)
    if kind in ("garrote", "garotte"):
        return garrote_pair(z, value)
    if kind == "soft-percentile":
        return soft_pair(z, _percentile_threshold_pair(z, value))
    if kind == "hard-percentile":
        return hard_pair(z, _percentile_threshold_pair(z, value))
    if kind in ("garrote-percentile", "garotte-percentile"):
        return garrote_pair(z, _percentile_threshold_pair(z, value))
    raise ValueError(f"Unknown threshold kind {kind!r}; choose one of {THRESHOLD_KINDS}")


def threshold(x, value, substitute=0.0, kind: str = "soft"):
    """Dispatch threshold operator by name (reference: functions/POCS.py:61-102).

    For ``*-percentile`` kinds, ``value`` is a percentile of ``|x|`` taken over
    the trailing two (slice) axes — matching the reference's
    ``np.percentile(np.abs(x), perc)`` per 2D slice.
    """
    if kind == "soft":
        return soft(x, value, substitute)
    if kind == "hard":
        return hard(x, value, substitute)
    if kind in ("garrote", "garotte"):
        return garrote(x, value, substitute)
    if kind == "soft-percentile":
        return soft(x, _percentile_threshold(x, value), substitute)
    if kind == "hard-percentile":
        return hard(x, _percentile_threshold(x, value), substitute)
    if kind in ("garrote-percentile", "garotte-percentile"):
        return garrote(x, _percentile_threshold(x, value), substitute)
    raise ValueError(f"Unknown threshold kind {kind!r}; choose one of {THRESHOLD_KINDS}")
