"""Measure padded-fused-kernel vs XLA-fallback solve rates on non-%128 grids.

VERDICT r3 #3 grounding: real surveys bin to arbitrary grid sizes; without
``pad_to_tile`` they silently take the XLA path. This probe measures both
paths per grid (same B/niter/basis, bench.py timing discipline: ramp burn,
scalar-fetch, varied scalar input) so the cube drivers can auto-enable
padding where the padded kernel wins. Results land in docs/perf.md round 4.

Usage: python tools/probe_pad_policy.py [HxW ...]   (defaults below)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
    from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx, from_complex
    from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache
    from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted
    from pseudo_3d_interpolation_tpu.utils.pad import pad_slices_to_tile

    enable_persistent_cache()
    grids = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]] or [
        (72, 40), (300, 200), (500, 380), (260, 150)]
    B, NITER = 8, 50
    cfg = POCSConfig(niter=NITER, thresh_op="hard", thresh_model="exponential",
                     p_min=1e-3, version="fast", alpha=0.75, eps=0.0,
                     use_pallas=True)
    transform = FFTTransform()

    def make_batch(h, w, seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        truth = np.zeros((B, h, w), np.complex64)
        for i in range(B):
            r = np.random.default_rng(i)
            for _ in range(6):
                fy, fx = r.integers(1, 16, size=2)
                truth[i] += r.uniform(0.5, 2.0) * np.exp(
                    2j * np.pi * (fy * yy / h + fx * xx / w)
                    + 1j * r.uniform(0, 6.28))
        mask = (rng.uniform(size=w) < 0.5).astype(np.float32)
        mask = np.ascontiguousarray(np.broadcast_to(mask[None, :], (h, w)))
        return truth * mask, mask

    def rate_of(obs, mask):
        def solve_sum(z, m, scale):
            z = type(z)(z.re * scale, z.im * scale)
            r = pocs_interpolate(z, m, transform, cfg)
            return jnp.sum(r.data.re) + jnp.sum(r.data.im)

        fn = jit_hoisted(solve_sum)
        z = from_complex(obs)
        m = jnp.asarray(mask)
        float(fn(z, m, jnp.float32(1.0)))  # compile
        acc = fn(z, m, jnp.float32(1.0))
        for i in range(3):  # ramp burn
            acc = acc + fn(z, m, jnp.float32(1.0 + 1e-4 * i))
        float(acc)
        reps = 5
        t0 = time.perf_counter()
        acc = fn(z, m, jnp.float32(1.0))
        for i in range(1, reps):
            acc = acc + fn(z, m, jnp.float32(1.0 + 0.001 * i))
        float(acc)
        return B * NITER / ((time.perf_counter() - t0) / reps)

    print(f"device: {jax.devices()[0]}, B={B}, niter={NITER}, FFT basis")
    for h, w in grids:
        obs, mask = make_batch(h, w)
        r_raw = rate_of(obs, mask)
        pobs, pmask, _ = pad_slices_to_tile(obs, mask)
        r_pad = rate_of(pobs, pmask)
        hp, wp = pobs.shape[-2:]
        area = hp * wp / (h * w)
        print(f"{h}x{w:<4} -> {hp}x{wp}: raw(XLA) {r_raw:8.1f} it/s | "
              f"padded(kernel) {r_pad:8.1f} it/s | speedup {r_pad / r_raw:5.2f}x"
              f" | pad area {area:.2f}x", flush=True)


if __name__ == "__main__":
    main()
