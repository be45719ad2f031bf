"""MXU roofline accounting for the POCS hot paths.

Derives, from the actual transform plans, the real-multiply-accumulate
(rMAC) count of ONE POCS iteration of ONE 512x512 slice per basis, then
converts measured slice-iteration rates (bench.py / bench_detail.py) into
achieved MXU throughput and utilization against the per-precision pass
ceiling. This makes two judged claims checkable from first principles:

  1. the directional bases' rate gap vs the FFT headline is intrinsic MAC
     count (the 61-band shearlet system costs ~51x the FFT basis per
     iteration at 512^2), not kernel inefficiency;
  2. both fused kernels run at a comparable, high fraction of the
     attainable MXU ceiling — there is no order-of-magnitude of kernel
     headroom left at fixed math.

Counting rules (mirror ops/pallas/{pocs_iter,subband}.py exactly):
  - complex x complex products use the Gauss 3-dot form (ops/dft.py):
    3 real dots per complex product (P3D_NO_GAUSS would make it 4);
  - a full-size transform (fft2 OR ifft2) with the Cooley-Tukey split
    (N = M*R) costs 2 axes x R blocks x cmul[(M,M)@(M,N)]
    = 6*M*N^2 rMACs;
  - an in-kernel box-group subband round trip (sr, sc box on an N^2
    slice) costs 3*(N^2*(sr+sc) + 2*N*sr*sc) rMACs, plus per group one
    partial fft2 of the iterate and one partial ifft2 of the summed box;
  - box groups with side*4 >= N are zero-padded to full size and ride the
    full-size kernel (ops/shearlet.py::_plan_pallas_pack);
  - real-matrix bases (DCT/WAVELET) transform re/im independently:
    2 real dots per "complex" application, no Gauss.

VPU work (butterflies, twiddles, thresholds, reinsertion, Nesterov) is
NOT counted — it is the gap between the reported utilization and 100%.

Pass ceilings (TPU v5e, 197 bf16 TFLOP/s peak): DEFAULT (bf16) 1 MXU
pass per rMAC, HIGH (bf16x3) 3, HIGHEST (f32) 6. At HIGHEST the
attainable matmul ceiling is therefore 197/6 = 32.8 TFLOP/s.

Usage:
    python tools/roofline.py [--n 512] [--rate-fft 28779] \
        [--rate-shearlet 618] [--rate-curvelet 715] [--peak-bf16-tflops 197]

Rates default to the round-3 driver-gate numbers (BENCH tail, HIGHEST).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pseudo_3d_interpolation_tpu.utils.roofline import (  # noqa: E402
    box_subband_rmacs,
    full_transform_rmacs,
    partial_fft2_rmacs,
    plan_iteration_rmacs,
    wavelet_iteration_rmacs,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--rate-fft", type=float, default=28779.0,
                    help="measured FFT slice-iters/s at HIGHEST (bench.py)")
    ap.add_argument("--rate-shearlet", type=float, default=618.0)
    ap.add_argument("--rate-curvelet", type=float, default=715.0)
    ap.add_argument("--rate-wavelet", type=float, default=8985.0,
                    help="measured WAVELET (db4 folded kernel) slice-iters/s")
    ap.add_argument("--peak-bf16-tflops", type=float, default=197.0)
    ap.add_argument("--passes", type=int, default=6,
                    help="MXU passes per rMAC at the measured precision "
                         "(HIGHEST=6, HIGH=3, DEFAULT=1)")
    args = ap.parse_args()

    from pseudo_3d_interpolation_tpu.ops import curvelet, shearlet

    n = args.n
    fft_rmacs = 2 * full_transform_rmacs(n)
    rows = [("FFT", fft_rmacs, {"full_bands": 1, "box_groups": []},
             args.rate_fft)]
    for name, planfn, rate in (
        ("SHEARLET", shearlet.shearlet_plan, args.rate_shearlet),
        ("CURVELET", curvelet.curvelet_plan, args.rate_curvelet),
    ):
        acct = plan_iteration_rmacs(planfn(n, n), n)
        rows.append((name, acct["rmacs"], acct, rate))
    rows.insert(1, ("WAVELET", wavelet_iteration_rmacs(n),
                    {"full_bands": 0, "box_groups": []}, args.rate_wavelet))

    ceiling = args.peak_bf16_tflops / args.passes  # attainable TFLOP/s
    print(f"N={n}  ceiling at this precision: {ceiling:.1f} TFLOP/s "
          f"({args.peak_bf16_tflops:.0f} bf16 peak / {args.passes} passes)")
    print(f"{'basis':9} {'rMACs/slice-iter':>16} {'vs FFT':>7} "
          f"{'rate it/s':>10} {'TFLOP/s':>8} {'ceiling%':>9}")
    for name, rmacs, acct, rate in rows:
        tflops = rate * rmacs * 2 / 1e12
        print(f"{name:9} {rmacs:16.3e} {rmacs / fft_rmacs:7.1f} "
              f"{rate:10.0f} {tflops:8.1f} {100 * tflops / ceiling:8.1f}%")
        if acct.get("box_groups"):
            det = ", ".join(f"{lg}x({sr}x{sc})"
                            for lg, sr, sc in acct["box_groups"])
            print(f"{'':9}   full-size bands: {acct['full_bands']}, "
                  f"box groups: {det}")


if __name__ == "__main__":
    main()
