"""Min/max rescaling (jit-compatible).

reference: pseudo_3D_interpolation/functions/utils.py:413-473
(``rescale`` / ``rescale_dask``); one function covers both here because the
min/max may be passed in explicitly (the reason the dask variant existed).
"""

from __future__ import annotations

import jax.numpy as jnp


def rescale(a, vmin=0.0, vmax=1.0, amin=None, amax=None):
    """Linearly rescale ``a`` from its (nan-aware) range to [vmin, vmax].

    ``amin``/``amax`` override the data range (useful when the global range is
    known without a full reduction, e.g. per-shard processing).
    Degenerate input (amin == amax) is returned unchanged.
    """
    a = jnp.asarray(a)
    lo = jnp.nanmin(a) if amin is None else jnp.asarray(amin, a.dtype)
    hi = jnp.nanmax(a) if amax is None else jnp.asarray(amax, a.dtype)
    scale = (vmax - vmin) / jnp.where(hi == lo, 1.0, hi - lo)
    return jnp.where(hi == lo, a, vmin + (a - lo) * scale)
