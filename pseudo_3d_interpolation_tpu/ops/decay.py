"""Iteration-based threshold decay schedules for POCS.

Re-implements the decay models of the reference
(pseudo_3D_interpolation/functions/POCS.py:169-368) in batched, jit-compatible
form:

  - ``linear``                   Gao et al. (2010)
  - ``exponential[-q]``          Yang et al. (2012), Zhang et al. (2015),
                                 Zhao et al. (2021)
  - ``data-driven``              Gao et al. (2013)
  - ``inverse_proportional[-q]`` Ge et al. (2015)

plus the adaptive minimum threshold ``p_min='adaptive'`` of Zhao et al. (2021).

Batching model: coefficients arrive as ``(..., H, W)`` — leading axes are
independent slices; every schedule returns ``(niter, ...)`` so that
``schedule[i]`` broadcasts per-slice thresholds against ``(..., 1, 1)``.

Deviation from the reference (deliberate): threshold bounds are computed from
``|coeffs|`` rather than the raw (possibly complex) coefficient maximum; the
reference's un-absed ``x_fwd.max()`` on complex FFT coefficients relies on
numpy's lexicographic complex ordering, which produces complex-valued
thresholds — the published algorithms (and the reference's own commented-out
earlier code at POCS.py:280-284) use magnitudes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DECAY_MODELS = ("linear", "exponential", "data-driven", "inverse_proportional")


def _parse_q(model: str) -> float:
    """Extract the descent-rate exponent from names like ``exponential-2``.

    A malformed suffix (``exponential-2x``, ``exponential-q2``) raises —
    silently falling back to q=1 would run a different schedule than the
    user configured. ``data-driven`` / ``inverse-proportional`` style
    hyphens (non-numeric words) are part of the model name, not exponents.
    """
    if "-" in model:
        tail = model.rsplit("-", 1)[-1]
        try:
            return float(tail)
        except ValueError:
            if tail.isalpha():  # e.g. 'data-driven', 'inverse-proportional'
                return 1.0
            raise ValueError(
                f"malformed decay-model exponent in {model!r} "
                f"(expected e.g. 'exponential-2')") from None
    return 1.0


def _slice_stats(coeff_abs):
    """(max, min, l2norm^2, size) reduced over the trailing two axes."""
    amax = jnp.max(coeff_abs, axis=(-2, -1))
    amin = jnp.min(coeff_abs, axis=(-2, -1))
    norm2 = jnp.sum(coeff_abs * coeff_abs, axis=(-2, -1))
    size = coeff_abs.shape[-2] * coeff_abs.shape[-1]
    return amax, amin, norm2, size


def adaptive_tau_min(coeff_abs):
    """Zhao et al. (2021) adaptive minimum threshold for single-scale transforms.

    ``0.01 * sqrt(||C||_F^2 / size)`` per slice
    (reference: functions/POCS.py:296-299). Returns shape ``(...,)``.
    """
    _, _, norm2, size = _slice_stats(coeff_abs)
    return 0.01 * jnp.sqrt(norm2 / size)


def tau_bounds(coeff_abs, p_max=0.99, p_min=1e-3, kind: str = "values"):
    """Compute per-slice (tau_max, tau_min) threshold bounds.

    ``kind='values'`` scales the per-slice coefficient magnitude maximum by
    ``p_max`` / ``p_min``; ``p_min='adaptive'`` uses Zhao et al. (2021).
    ``kind='factors'`` returns the raw percentages (for percentile threshold
    operators). reference: functions/POCS.py:277-333.
    """
    amax, _, _, _ = _slice_stats(coeff_abs)
    if kind == "factors":
        if isinstance(p_min, str):
            raise ValueError(
                "p_min='adaptive' computes a VALUE-domain minimum and has "
                "no percentile ('factors') meaning — pass a numeric "
                "percentage for percentile threshold operators")
        shape = coeff_abs.shape[:-2]
        return (jnp.full(shape, float(p_max)), jnp.full(shape, float(p_min)))
    if kind != "values":
        raise ValueError("kind must be 'values' or 'factors'")
    tau_max = p_max * amax
    if isinstance(p_min, str):
        if p_min != "adaptive":
            raise ValueError(f"unknown p_min {p_min!r}")
        tau_min = adaptive_tau_min(coeff_abs)
    else:
        tau_min = p_min * amax
    return tau_max, tau_min


def schedule(model: str, niter: int, tau_max, tau_min):
    """Closed-form decay schedules: linear / exponential[-q].

    Returns ``(niter,) + tau_max.shape``. reference: functions/POCS.py:335-354.
    """
    tau_max = jnp.asarray(tau_max)
    tau_min = jnp.asarray(tau_min)
    denom = max(niter - 1, 1)
    m = (jnp.arange(niter, dtype=jnp.float32) / denom).reshape((niter,) + (1,) * tau_max.ndim)
    if model == "linear":
        return tau_max - (tau_max - tau_min) * m
    if model.startswith("exponential"):
        q = _parse_q(model)
        # an all-zero slice gives tau_max == tau_min == 0 -> log(0/0) NaN
        # (and -inf * 0 at m=0): return a zero schedule like 'linear' does
        # instead of poisoning the batch — callers with dead/padded slices
        # hit this outside the solver's own zero-slice short-circuit
        safe_max = jnp.where(tau_max == 0, 1.0, tau_max)
        safe_min = jnp.where(tau_min == 0, jnp.finfo(jnp.float32).tiny,
                             tau_min)
        c = jnp.log(safe_min / safe_max)
        out = tau_max * jnp.exp(c * m**q)
        return jnp.where(tau_max == 0, 0.0, out)
    raise ValueError(f"No closed-form schedule for model {model!r}")


def inverse_proportional(model: str, niter: int, coeff_abs):
    """Ge et al. (2015) inversely proportional decay (ignores p_max/p_min).

    ``tau_i = a / i^q + b`` with a, b fixed by the per-slice coefficient
    min/max. reference: functions/POCS.py:250-274.
    """
    q = _parse_q(model)
    amax, amin, _, _ = _slice_stats(coeff_abs)
    nq = float(niter) ** q
    if nq == 1.0:
        # niter == 1: the a/b system is degenerate (nq - 1 == 0 -> NaN);
        # a single iteration thresholds at the schedule start, tau_max
        return amax[None]
    a = (nq * (amax - amin)) / (nq - 1.0)
    b = (nq * amin - amax) / (nq - 1.0)
    i = jnp.arange(1, niter + 1, dtype=jnp.float32).reshape((niter,) + (1,) * amax.ndim)
    return a / (i**q) + b


def data_driven(niter: int, coeff_abs, tau_max, tau_min):
    """Gao et al. (2013) data-driven decay from the sorted coefficient curve.

    Sorts ``|coeffs|`` descending per slice, restricts to the open interval
    (tau_min, tau_max), and samples that curve at ``ceil((i-1)(Nv-1)/(niter-1))``
    (reference: functions/POCS.py:356-362). Fixed-shape formulation: the
    data-dependent compaction ``v = sorted[idx_in_range]`` becomes a
    cumulative-count + searchsorted lookup so it runs under jit.
    """
    batch_shape = coeff_abs.shape[:-2]
    flat = coeff_abs.reshape(batch_shape + (-1,))
    n = flat.shape[-1]

    def per_slice(vals, tmax, tmin):
        vals_desc = jnp.sort(vals)[::-1]
        valid = (vals_desc > tmin) & (vals_desc < tmax)
        nv = jnp.sum(valid)
        # rank of each iteration along the valid curve
        i = jnp.arange(niter, dtype=jnp.float32)
        rank = jnp.ceil(i * (nv - 1) / max(niter - 1, 1)).astype(jnp.int32)
        rank = jnp.clip(rank, 0, jnp.maximum(nv - 1, 0))
        # cum[k] = number of valid entries among vals_desc[:k+1]
        cum = jnp.cumsum(valid.astype(jnp.int32))
        # index of the (rank+1)-th valid element
        idx = jnp.searchsorted(cum, rank + 1, side="left")
        idx = jnp.clip(idx, 0, n - 1)
        return vals_desc[idx]

    flat2 = flat.reshape((-1, n))
    tmax2 = jnp.broadcast_to(jnp.asarray(tau_max), batch_shape).reshape((-1,))
    tmin2 = jnp.broadcast_to(jnp.asarray(tau_min), batch_shape).reshape((-1,))
    out = jax.vmap(per_slice)(flat2, tmax2, tmin2)  # (B, niter)
    out = jnp.moveaxis(out, -1, 0)  # (niter, B)
    return out.reshape((niter,) + batch_shape)


def threshold_decay(
    coeff_abs,
    model: str = "exponential",
    niter: int = 50,
    p_max: float = 0.99,
    p_min=1e-3,
    kind: str = "values",
    tau_min_override=None,
):
    """One-stop batched equivalent of the reference's ``get_threshold_decay``.

    Parameters
    ----------
    coeff_abs
        ``|forward transform of x|`` with shape ``(..., H, W)``; leading axes
        batch independent slices. For multi-scale transforms call once per
        subband (optionally passing ``tau_min_override`` for shared adaptive
        minima).
    model
        ``linear`` / ``exponential[-q]`` / ``data-driven`` /
        ``inverse_proportional[-q]``.
    kind
        ``values`` (thresholds in data units) or ``factors`` (percentages, for
        percentile threshold operators).

    Returns
    -------
    jnp.ndarray of shape ``(niter,) + coeff_abs.shape[:-2]``.
    """
    if "inverse" in model and "proportional" in model:
        if kind != "values":
            # the Ge et al. schedule is defined on coefficient VALUES;
            # handing its data-unit thresholds to a percentile operator
            # (kind='factors') would silently threshold ~nothing (or NaN
            # via jnp.percentile(q > 100))
            raise ValueError(
                "inverse_proportional decay requires decay_kind='values'")
        return inverse_proportional(model, niter, coeff_abs)
    tau_max, tau_min = tau_bounds(coeff_abs, p_max=p_max, p_min=p_min, kind=kind)
    if tau_min_override is not None:
        tau_min = jnp.broadcast_to(jnp.asarray(tau_min_override), tau_max.shape)
    if model == "data-driven":
        if kind != "values":
            raise ValueError("data-driven decay requires kind='values'")
        return data_driven(niter, coeff_abs, tau_max, tau_min)
    return schedule(model, niter, tau_max, tau_min)


def shearlet_adaptive_tau_min_from_norms(norm_per_band, n_scales: int):
    """Zhao et al. (2021) adaptive minimum from per-subband norms.

    ``norm_per_band``: (..., L) = sqrt(Σ|c_l|² / (L·H·W)) in subband order
    [lowpass, scale1 x 4, scale2 x 8, ...]; reference POCS.py:302-320
    combines them through a median into one scalar per slice."""
    counts = [1] + [2 ** (j + 2) for j in range(n_scales)]
    j_of_band = jnp.asarray(
        sum(([float(j)] * c for j, c in enumerate(counts)), []), dtype=jnp.float32
    )
    return (1.0 / 3.0) * jnp.median(jnp.log10(j_of_band + 1.0) * norm_per_band, axis=-1)


def shearlet_adaptive_tau_min(coeff_abs, n_scales: int):
    """Zhao et al. (2021) adaptive minimum for the multi-scale shearlet stack.

    ``coeff_abs`` has shape ``(..., L, H, W)``; see
    :func:`shearlet_adaptive_tau_min_from_norms` (the streamed decay path
    computes the norms without materializing the stack).
    """
    size = coeff_abs.shape[-3] * coeff_abs.shape[-2] * coeff_abs.shape[-1]
    norm_per_band = jnp.sqrt(jnp.sum(coeff_abs**2, axis=(-2, -1)) / size)  # (..., L)
    return shearlet_adaptive_tau_min_from_norms(norm_per_band, n_scales)


def n_shearlet_scales(shape) -> int:
    """Number of shearlet scales for a slice shape (reference: POCS.py:21-31)."""
    scales = int(math.floor(0.5 * math.log2(max(shape))))
    return max(scales, 1)
