"""Probe: box plan vs exact-support split plan for the shearlet transform.

Times forward and forward+inverse of the planned shearlet transform at 512²
(batch 8, HIGH precision) for ``split_threshold=None`` (default box plan)
and ``192`` (per-subband exact-support splitting). Records the measurement
behind docs/perf.md "Fine-scale support splitting (negative result)":
despite ~0.65× the matmul flops, the split plan LOSES on TPU — small
odd-shaped einsums underuse the MXU and the inverse pays ~17 scatter-adds.

Run on the attached TPU: ``python tools/probe_plan.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.ops import shearlet as sh
from pseudo_3d_interpolation_tpu.ops.cplx import Cplx, from_complex
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache


def main(b=8, n=512):
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
         ).astype(np.complex64)
    z = from_complex(x)
    prec = jax.lax.Precision.HIGH
    for label, thr in [("box", None), ("split", 192)]:
        plan = sh.shearlet_plan(n, n, None, thr)

        def fwd_sum(zz):
            c = sh.shearlet_transform_planned(zz, plan, precision=prec)
            return jnp.sum(c.re) + jnp.sum(c.im)

        def rt_sum(zz):
            c = sh.shearlet_transform_planned(zz, plan, precision=prec)
            c = Cplx(c.re * 0.9, c.im * 0.9)
            r = sh.inverse_shearlet_transform_planned(c, plan, precision=prec)
            return jnp.sum(r.re) + jnp.sum(r.im)

        for name, f in [("fwd", fwd_sum), ("fwd+inv", rt_sum)]:
            jf = jax.jit(f)
            t0 = time.perf_counter()
            float(jf(z))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                float(jf(z))
            dt = (time.perf_counter() - t0) / 3
            print(f"{label:6s} {name:8s} {dt * 1000:8.1f} ms  "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
