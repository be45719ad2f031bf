"""Detailed performance study (run manually on a healthy TPU; bench.py is
the driver-facing single-line benchmark).

Measures POCS slice-iterations/sec at 512x512 across:
  - matmul precision: HIGHEST (6-pass bf16 ~ f32) / HIGH (3-pass) / DEFAULT
  - XLA scan path vs fused Pallas iteration
  - batch sizes

and reports reconstruction SNR per precision so speed/quality trade-offs
are explicit. Timing uses scalar-fetch round-trips (see
.claude/skills/verify/SKILL.md for why block_until_ready is insufficient
on the remote-TPU tunnel).
"""

from __future__ import annotations

import time

import numpy as np


def make_problem(b, n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    truth = np.zeros((b, n, n), np.complex64)
    for i in range(b):
        r = np.random.default_rng(seed + i)
        for _ in range(6):
            fy, fx = r.integers(1, max(n // 20, 2), size=2)
            truth[i] += r.uniform(0.5, 2.0) * np.exp(
                2j * np.pi * (fy * yy / n + fx * xx / n) + 1j * r.uniform(0, 6.28))
    mask = (rng.uniform(size=n) < 0.5).astype(np.float32)
    mask = np.ascontiguousarray(np.broadcast_to(mask[None, :], (n, n)))
    return truth, truth * mask, mask


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
    from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform
    from pseudo_3d_interpolation_tpu.ops import dft, metrics
    from pseudo_3d_interpolation_tpu.ops.cplx import from_complex, to_complex

    import os

    N = int(os.environ.get("BENCH_N", 512))
    NITER = int(os.environ.get("BENCH_NITER", 50))
    truth, obs, mask = make_problem(8, N)

    def timed_solve(cfg, b, precision, reps=3):
        dft_prec = precision

        @dataclasses.dataclass(frozen=True)
        class PrecFFT(FFTTransform):
            def forward(self, z):
                return dft.fft2(z, precision=dft_prec)

            def inverse(self, c):
                return dft.ifft2(c, precision=dft_prec)

        tr = PrecFFT()
        t2, o2, m2 = make_problem(b, N)

        def solve_sum(z, m):
            r = pocs_interpolate(z, m, tr, cfg)
            return jnp.sum(r.data.re) + jnp.sum(r.data.im)

        fn = jax.jit(lambda z, m, s: solve_sum(type(z)(z.re * s, z.im * s), m))
        m = jnp.asarray(m2)
        z = from_complex(o2)
        float(fn(z, m, jnp.float32(1.0)))  # compile
        t0 = time.perf_counter()
        acc = fn(z, m, jnp.float32(1.0))
        for i in range(1, reps):
            acc = acc + fn(z, m, jnp.float32(1.0 + 1e-3 * i))
        float(acc)
        dt = (time.perf_counter() - t0) / reps
        # quality on the same problem
        full = jax.jit(lambda z, mm: pocs_interpolate(z, mm, tr, cfg))(from_complex(o2), m)
        rec = to_complex(full.data)
        snr = float(metrics.snr(np.abs(t2), np.abs(rec)))
        return b * NITER / dt, snr

    base = POCSConfig(niter=NITER, thresh_op="hard", p_min="adaptive",
                      version="fast", alpha=0.75, eps=0.0)

    print(f"{'config':<44s} {'slice-iters/s':>14s} {'SNR dB':>8s}")
    P = jax.lax.Precision
    for prec, name in [(P.HIGHEST, "HIGHEST"), (P.HIGH, "HIGH"), (P.DEFAULT, "DEFAULT")]:
        for b in (8, 32):
            rate, snr = timed_solve(base, b, prec)
            print(f"XLA  {name:<8s} batch={b:<3d}{'':<24s} {rate:>14.0f} {snr:>8.2f}")

    pcfg = dataclasses.replace(base, use_pallas=True)
    for b in (8, 32):
        try:
            rate, snr = timed_solve(pcfg, b, P.HIGHEST)
            print(f"PALLAS fused    batch={b:<3d}{'':<22s} {rate:>14.0f} {snr:>8.2f}")
        except Exception as e:
            print(f"PALLAS fused    batch={b}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
