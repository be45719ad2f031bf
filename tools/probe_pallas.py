"""Probe: folded Pallas kernel vs XLA scan, per basis and precision.

Reproduces the docs/perf.md "Pallas fused solve" table: 512², niter 50,
batch 32, FFT (DEFAULT + HIGHEST) and DCT (HIGHEST) — Mosaic has no HIGH
dot lowering, so HIGH rows are XLA-only. Run on the attached TPU:

    python tools/probe_pallas.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.models import POCSConfig
from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
from pseudo_3d_interpolation_tpu.models.transforms import (DCTTransform,
                                                           FFTTransform)
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache


def main(n=512, niter=50, b=32):
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    mask = np.ascontiguousarray(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :]
        * np.ones((n, n), np.float32))
    md = jnp.asarray(mask)
    obs = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
           ).astype(np.complex64)
    z = from_complex(obs)
    zd = type(z)(jnp.asarray(z.re), jnp.asarray(z.im))
    cases = [
        (FFTTransform(precision="default"), "fft/DEFAULT"),
        (FFTTransform(), "fft/HIGHEST"),
        (DCTTransform(), "dct/HIGHEST"),
    ]
    for tr, name in cases:
        for label, up in (("xla", False), ("pallas", True)):
            cfg = POCSConfig(niter=niter, thresh_op="hard", p_min=1e-3,
                             version="fast", alpha=0.75, eps=0.0,
                             use_pallas=up)
            fn = jax.jit(lambda a, m: jnp.sum(
                pocs_interpolate(a, m, tr, cfg).data.re))
            t0 = time.perf_counter()
            float(fn(zd, md))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            acc = fn(zd, md)
            for _ in range(2):
                acc = acc + fn(zd, md)
            float(acc)
            dt = (time.perf_counter() - t0) / 3
            print(f"{name:12s} {label:6s} b={b} {b * niter / dt:8.0f} "
                  f"slice-iters/s (compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
