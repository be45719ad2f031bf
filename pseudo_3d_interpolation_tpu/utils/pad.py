"""Array padding / de-padding helpers (jit-compatible).

reference: pseudo_3D_interpolation/functions/utils.py:194-298.
All functions are shape-static so they can live inside ``jax.jit``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pad_mirror_flip(a, n: int, zeros: bool = False):
    """Pad a 1D array with ``n`` values on each side.

    Default pads with the signal mirrored *and* flipped about the edge value
    (odd-symmetric extension), matching the reference's ``pad_array``
    (reference: functions/utils.py:194-222). ``zeros=True`` pads with zeros.
    """
    a = jnp.asarray(a)
    if n <= 0:
        return a
    if zeros:
        z = jnp.zeros((n,), dtype=a.dtype)
        return jnp.concatenate([z, a, z])
    start = a[0] - jnp.abs(a[1 : n + 1][::-1] - a[0])
    end = a[-1] - jnp.abs(a[-n - 1 : -1][::-1] - a[-1])
    return jnp.concatenate([start, a, end])


def pad_along_axis(array, n, mode: str = "constant", axis: int = -1, **kwargs):
    """Pad an nD array along one axis (reference: functions/utils.py:225-269)."""
    array = jnp.asarray(array)
    if isinstance(n, (tuple, list)):
        n_before, n_after = int(n[0]), int(n[1])
    else:
        n_before = n_after = int(n)
    if n_before <= 0 and n_after <= 0:
        return array
    npad = [(0, 0)] * array.ndim
    npad[axis] = (max(n_before, 0), max(n_after, 0))
    return jnp.pad(array, npad, mode=mode, **kwargs)


def pad_to_shape(array, shape, mode: str = "constant", **kwargs):
    """Pad an array at the end of each axis up to ``shape``."""
    array = jnp.asarray(array)
    npad = [(0, int(t) - int(s)) for s, t in zip(array.shape, shape)]
    if any(p[1] < 0 for p in npad):
        raise ValueError(f"target shape {shape} smaller than array shape {array.shape}")
    if all(p[1] == 0 for p in npad):
        return array
    return jnp.pad(array, npad, mode=mode, **kwargs)


def slice_valid_data(data, nso: int):
    """Undo zero-padding: return the ``nso`` valid samples of each trace.

    ``data`` is (samples, traces); each trace was zero-padded top and/or
    bottom. Returns the de-padded (nso, traces) block plus the per-trace start
    index (reference: functions/utils.py:272-298).
    """
    data = jnp.asarray(data)
    idx_start = jnp.argmax(data != 0, axis=0)
    indexer = (jnp.arange(nso)[:, None] + idx_start[None, :]).astype(jnp.int32)
    return jnp.take_along_axis(data, indexer, axis=0), idx_start


def next_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (host-side helper for TPU tiling)."""
    return int(-(-int(n) // int(m)) * int(m))


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (host-side; FFT-friendly padding)."""
    return 1 << int(np.ceil(np.log2(max(int(n), 1))))


def pad_slices_to_tile(data, mask, multiple: int = 128):
    """Zero-pad a (..., H, W) slice stack and its shared (H, W) mask to the
    next ``multiple``-aligned sides, host-side.

    The frame is an *observed-zero* border: amplitude 0 with mask 1, so the
    POCS reinsertion keeps pinning it toward zero every iteration instead of
    treating it as missing traces to hallucinate into. Purpose: the fused
    Pallas kernels require %128 sides (the MXU/VREG tile —
    ops/pallas/pocs_iter.py), which real survey grids rarely bin to; padding
    lets any grid ride them. The transform then sees the padded grid, so the
    solve is a (slightly) different — equally valid — POCS problem; callers
    crop back to ``(h, w)`` with the returned original sides. No-op (inputs
    returned unchanged) when both sides are already aligned.

    Memory note: this materializes a full padded HOST copy of ``data``. The
    blowup factor is ``(ceil(h/128)*128 * ceil(w/128)*128) / (h*w)`` — up to
    ~6x host RAM + device upload for small strongly non-aligned grids (e.g.
    60x45 -> 128x128). For large cubes with non-aligned grids prefer the
    checkpointed streaming driver (pipeline/pocs.interpolate_checkpointed),
    which pads per-slab rather than whole-cube.
    """
    data = np.asarray(data)
    h, w = data.shape[-2:]
    hp, wp = next_multiple(h, multiple), next_multiple(w, multiple)
    if (hp, wp) == (h, w):
        return data, np.asarray(mask, np.float32), (h, w)
    padded = np.zeros(data.shape[:-2] + (hp, wp), data.dtype)
    padded[..., :h, :w] = data
    mask_p = np.ones((hp, wp), np.float32)
    mask_p[:h, :w] = np.asarray(mask, np.float32)
    return padded, mask_p, (h, w)
