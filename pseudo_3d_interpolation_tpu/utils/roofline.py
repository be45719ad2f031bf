"""MXU roofline accounting for the POCS hot paths (library core).

Derives, from the actual transform plans, the real-multiply-accumulate
(rMAC) count of ONE POCS iteration of ONE (n, n) slice per basis, and
converts measured slice-iteration rates into achieved MXU throughput and
utilization against the per-precision pass ceiling. Used by
``tools/roofline.py`` (CLI report) and ``bench.py`` (driver-visible MFU
line). Counting rules mirror ops/pallas/{pocs_iter,subband}.py exactly —
see tools/roofline.py's docstring for the full derivation; VPU work is
not counted (it is the gap between reported utilization and 100%).

reference: no counterpart — the reference has no performance model; its
throughput story is dask worker counts (cube_POCS_interpolation_3D.py).
"""

from __future__ import annotations

# TPU v5e peak; pass ceilings per precision: DEFAULT (bf16) 1 MXU pass per
# rMAC, HIGH (bf16x3) 3, HIGHEST (f32) 6
PEAK_BF16_TFLOPS = 197.0
PASSES = {"default": 1, "high": 3, "highest": 6}


def full_transform_rmacs(n: int) -> int:
    """One full-size fft2 or ifft2 on an (n, n) slice, split + Gauss."""
    from ..ops import dft

    sp = dft.fast_split(n)
    if sp is None:
        # dense matmul-DFT: 2 axes x cmul[(N,N)@(N,N)] = 6*N^3
        return 6 * n * n * n
    m, r = sp
    # 2 axes x R blocks x cmul[(M,M)@(M,N)] = 6*M*N^2
    return 6 * m * n * n


def partial_fft2_rmacs(n: int, sr: int, sc: int) -> int:
    """Partial fft2: (sr, n)@(n, n) rows then (sr, n)@(n, sc) cols, Gauss."""
    return 3 * (sr * n * n + sr * n * sc)


def box_subband_rmacs(n: int, sr: int, sc: int) -> int:
    """One in-kernel box-group subband round trip on an (n, n) slice."""
    return 3 * (n * n * (sr + sc) + 2 * n * sr * sc)


def plan_iteration_rmacs(plan, n: int) -> dict:
    """rMACs of one directional POCS iteration on one (n, n) slice under
    the fused-Pallas routing (_pocs_subband_apply_pallas)."""
    full_bands = 0
    box = 0
    box_bands = []
    for g in plan:
        lg = g.psi.shape[0]
        if g.idx_h is None:
            full_bands += lg
            continue
        sr, sc = len(g.idx_h), len(g.idx_w)
        if sr * 4 >= n and sc * 4 >= n:  # zero-padded to full size
            full_bands += lg
            continue
        box_bands.append((lg, sr, sc))
        box += partial_fft2_rmacs(n, sr, sc)          # box spectrum of z
        box += lg * box_subband_rmacs(n, sr, sc)      # per-subband trip
        box += partial_fft2_rmacs(n, sr, sc)          # invert summed box
    base = 2 * full_transform_rmacs(n)                # fft2(z), ifft2(acc)
    full = 2 * full_bands * full_transform_rmacs(n)   # per-band inv+fwd
    return {
        "full_bands": full_bands,
        "box_groups": box_bands,
        "rmacs": base + full + box,
        "rmacs_base": base,
        "rmacs_full": full,
        "rmacs_box": box,
    }


def wavelet_iteration_rmacs(n: int, level: int | None = None,
                            wavelet: str = "db4") -> int:
    """rMACs of one folded-kernel WAVELET iteration on an (n, n) slice.

    The kernel runs the Mallat cascade as per-level matmul pairs
    ``A_lv @ LL @ A_lv^T`` on the shrinking (m, m) top-left block
    (ops/pallas/pocs_iter.py::_wv_fwd/_wv_inv): 2 real dots of m^3 MACs
    per channel per level, re/im independent (real matrices, no Gauss),
    forward + inverse per iteration.
    """
    if level is None:
        from ..ops import wavelet as wv

        level = min(max(wv.max_level(n, wavelet), 1), 3)
    total = 0
    for lv in range(level):
        m = n >> lv
        total += 4 * m * m * m  # 2 dots x 2 channels on the (m, m) block
    return 2 * total  # forward + inverse


def achieved_tflops(rate_slice_iters_per_s: float, rmacs: int) -> float:
    """Measured slice-iteration rate -> achieved MXU TFLOP/s (2 flop/MAC)."""
    return rate_slice_iters_per_s * rmacs * 2 / 1e12


def mfu_pct(rate_slice_iters_per_s: float, rmacs: int, precision: str,
            peak_bf16_tflops: float = PEAK_BF16_TFLOPS) -> float:
    """Utilization (%) against the attainable ceiling at ``precision``."""
    ceiling = peak_bf16_tflops / PASSES[precision.lower()]
    return 100.0 * achieved_tflops(rate_slice_iters_per_s, rmacs) / ceiling
