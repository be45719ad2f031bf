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


# measured engage threshold for the auto pad_to_tile policy (docs/perf.md
# round 4, tools/probe_pad_policy.py on a v5e at the production batch 32):
# padded-kernel/XLA-fallback speedup by pad-area ratio — 1.02x area -> 1.55x,
# 1.03x -> 1.66x, 1.05x -> 1.27x, 1.15x -> 1.59x, 1.14x -> 1.05x,
# 1.64x -> 1.00x (wash), 2.52x -> 0.93x, 5.69x -> 0.76x. Below 1.3 the
# padded kernel never lost (and stayed >= 1.0 at batch 8 too).
PAD_TO_TILE_MAX_AREA = 1.3


def pad_area_ratio(h: int, w: int, multiple: int = 128) -> float:
    """Compute overhead factor of tile padding: padded area / raw area."""
    return (next_multiple(h, multiple) * next_multiple(w, multiple)
            / float(int(h) * int(w)))


def auto_pad_to_tile(config, h: int, w: int, transform=None,
                     multiple: int = 128) -> bool:
    """Resolve a POCSConfig's tri-state ``pad_to_tile`` for an (h, w) grid.

    ``True``/``False`` are explicit overrides. ``None`` (the default) is
    the measured auto policy: engage padding when the fused folded kernel
    could actually run on the padded grid (use_pallas, FFT/DCT basis,
    kernel-supported threshold op) AND the pad-area overhead is at most
    :data:`PAD_TO_TILE_MAX_AREA` — the region where the padded kernel
    measured never-worse and up to 1.66x faster than the XLA fallback
    (tools/probe_pad_policy.py). The reference handles arbitrary bin grids
    implicitly (cube_binning_3D.py:413-558); here arbitrary grids get the
    fast path automatically when it pays.
    """
    if config.pad_to_tile is not None:
        return bool(config.pad_to_tile)
    if not config.use_pallas:
        return False
    if int(h) % multiple == 0 and int(w) % multiple == 0:
        return False  # aligned: padding is a no-op
    kind = getattr(transform, "kind", None) or config.transform_kind
    if kind not in ("FFT", "DCT"):
        # directional/wavelet bases have their own kernel gates; the
        # measured policy covers the folded FFT/DCT kernels only
        return False
    op = "garrote" if config.thresh_op == "garotte" else config.thresh_op
    if op not in ("hard", "soft", "garrote"):
        return False
    # mirror the folded-kernel eligibility gate (models/pocs.py): if the
    # kernel could not engage on the PADDED grid either, padding buys
    # nothing and costs up to the area ratio in extra XLA compute
    if (config.eps != 0.0 or config.keep_cost_history
            or config.global_early_stop
            or config.version not in ("regular", "fast")):
        return False
    # padding without the kernel is a pure loss: on a non-TPU backend
    # (no Mosaic lowering, unless interpreting) the padded grid would
    # run the XLA path over up to 1.3x the area for nothing
    from ..ops.pallas.pocs_iter import tpu_lowering_available

    if not tpu_lowering_available(config.pallas_interpret):
        return False
    return pad_area_ratio(h, w, multiple) <= PAD_TO_TILE_MAX_AREA


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
