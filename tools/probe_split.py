"""Probe: radix-split choice (R in N = M·R) per axis length.

``fast_split`` defaults to the LARGEST R <= 8 (fewest MXU MACs: the
per-axis dot work is n²·M = n³/R), but the butterfly stage is O(n²·R) on
the VPU — so past some R the kernel goes VPU-bound and a smaller R wins.
At 512² the only choices are R=4/2; at 1024² the default R=8 (M=128) is
suspected VPU-bound (the fused subband kernel measures ~27% of the MXU
MAC roofline at 1024² vs ~42% at 512², docs/perf.md round 3e).

Each candidate R runs in its own SUBPROCESS with ``P3D_RADIX_SPLIT=n:R``
because the split fixes the permuted spectral layout shared by kernels,
window packs, and compiled programs — it must be constant per process
(ops/dft.py::_split_preference).

Run on the attached TPU:
    python tools/probe_split.py [n] [bases] [batch]
e.g.
    python tools/probe_split.py 1024 FFT-PALLAS,SHEARLET-PALLAS 2
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def candidates(n: int, min_m: int = 128):
    out = []
    for r in (8, 6, 5, 4, 3, 2):
        if n % r == 0 and n // r >= min_m:
            out.append(r)
    return out


def main(n: int = 1024, bases: str = "FFT-PALLAS,SHEARLET-PALLAS",
         batch: int | None = None, niter: int = 50):
    if batch is None:
        batch = 2 if n >= 1024 else 8
    for r in candidates(n):
        env = dict(os.environ)
        env.update({
            "P3D_RADIX_SPLIT": f"{n}:{r}",
            "BENCH_N": str(n),
            "BENCH_BATCH": str(batch),
            "BENCH_NITER": str(niter),
            "BENCH_BASES": bases,
        })
        print(f"=== n={n} R={r} (M={n // r}) batch={batch} ===", flush=True)
        subprocess.run([sys.executable, "bench_detail.py"], cwd=ROOT,
                       env=env, check=False, timeout=3600)


if __name__ == "__main__":
    main(n=int(sys.argv[1]) if len(sys.argv) > 1 else 1024,
         bases=sys.argv[2] if len(sys.argv) > 2 else
         "FFT-PALLAS,SHEARLET-PALLAS",
         batch=int(sys.argv[3]) if len(sys.argv) > 3 else None)
