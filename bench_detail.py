"""Detailed performance study (run manually on a healthy TPU; bench.py is
the driver-facing single-line benchmark).

Two parts:

1. Per-basis gate (default): measures POCS slice-iterations/sec AND
   reconstruction SNR at 512x512 for every sparse basis — FFT, DCT,
   WAVELET, SHEARLET (the reference's production basis,
   cube_POCS_interpolation_3D.py:269-274), and CURVELET at
   both HIGHEST and HIGH matmul precision (DCT/WAVELET: default). Emits ONE JSON line per entry so regressions in any basis
   are visible, not just the FFT headline.

2. Precision x batch x Pallas study (BENCH_STUDY=1): the round-1 table.

Timing uses scalar-fetch round-trips (see .claude/skills/verify/SKILL.md
for why block_until_ready is insufficient on the remote-TPU tunnel).

Env overrides: BENCH_N (512), BENCH_NITER (50), BENCH_BATCH (8),
BENCH_BASES (comma list), BENCH_STUDY=1 for part 2 only.
"""

from __future__ import annotations

import json
import os
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


def _timed_solve(transform, cfg, truth, obs, mask, niter, reps=3):
    # cfg may carry use_pallas=True: the folded-kernel production path
    import jax
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.models import pocs_interpolate
    from pseudo_3d_interpolation_tpu.ops import metrics
    from pseudo_3d_interpolation_tpu.ops.cplx import from_complex, to_complex
    from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted

    def solve_sum(z, m, s):
        z = type(z)(z.re * s, z.im * s)
        r = pocs_interpolate(z, m, transform, cfg)
        return jnp.sum(r.data.re) + jnp.sum(r.data.im)

    fn = jit_hoisted(solve_sum)
    m = jnp.asarray(mask)
    z = from_complex(obs)
    t0 = time.perf_counter()
    float(fn(z, m, jnp.float32(1.0)))  # compile + first run
    compile_s = time.perf_counter() - t0
    # burn the device ramp: the chip's first ~4 executions in a process run
    # 30-50% below steady state (tools/probe_ramp.py), which silently
    # penalized whichever gate entry ran first
    acc = fn(z, m, jnp.float32(1.0))
    for i in range(3):
        acc = acc + fn(z, m, jnp.float32(1.0 + 1e-4 * i))
    float(acc)
    t0 = time.perf_counter()
    acc = fn(z, m, jnp.float32(1.0))
    for i in range(1, reps):
        acc = acc + fn(z, m, jnp.float32(1.0 + 1e-3 * i))
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    # SNR pass reuses the already-uploaded z (a second from_complex(obs)
    # would pay another h2d over the slow tunnel per gate entry)
    full = jit_hoisted(lambda zz, mm: pocs_interpolate(zz, mm, transform, cfg))(
        z, m)
    rec = to_complex(full.data)
    snr = float(metrics.snr(np.abs(truth), np.abs(rec)))
    b = truth.shape[0]
    return b * niter / dt, snr, compile_s


def run_basis_gate():
    from pseudo_3d_interpolation_tpu.models import POCSConfig
    from pseudo_3d_interpolation_tpu.models.transforms import get_transform
    from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    n = int(os.environ.get("BENCH_N", 512))
    niter = int(os.environ.get("BENCH_NITER", 50))
    batch = int(os.environ.get("BENCH_BATCH", 8))
    bases = os.environ.get(
        "BENCH_BASES",
        "FFT,FFT-PALLAS,DCT,DCT-PALLAS,WAVELET,WAVELET-PALLAS,"
        "SHEARLET,SHEARLET-PALLAS,CURVELET,CURVELET-PALLAS").split(",")
    truth, obs, mask = make_problem(batch, n)

    for kind in bases:
        kind = kind.strip().upper()
        pallas = kind.endswith("-PALLAS")
        base_kind = kind[:-7] if pallas else kind
        # precision sweep applies to every matmul-backed basis; the XLA
        # WAVELET conv path ignores precision, so sweep it only with the
        # folded (matmul-form) kernel
        sweep = base_kind != "WAVELET" or pallas
        precisions = ["highest", "high"] if sweep else [None]
        for prec in precisions:
            kw = {"precision": prec} if prec else {}
            if base_kind == "WAVELET":
                kw = {"wavelet": "db4", **kw}
            tr = get_transform(base_kind, **kw)
            if hasattr(tr, "with_shape"):
                tr = tr.with_shape((n, n))
            p_min = "adaptive" if base_kind in ("FFT", "DCT", "SHEARLET") else 1e-3
            cfg = POCSConfig(niter=niter, thresh_op="hard",
                             thresh_model="exponential", p_min=p_min,
                             version="fast", alpha=0.75, eps=0.0,
                             use_pallas=pallas)
            try:
                rate, snr, compile_s = _timed_solve(tr, cfg, truth, obs, mask,
                                                    niter)
                label = kind
                if pallas:
                    from pseudo_3d_interpolation_tpu.ops.pallas import (
                        pallas_supported,
                    )

                    if not pallas_supported((batch, n, n)):
                        # the solver silently ran the XLA path — label it
                        label += " (XLA fallback: gates reject shape)"
                print(json.dumps({
                    "basis": label, "precision": prec or "highest", "n": n,
                    "batch": batch, "niter": niter,
                    "slice_iters_per_sec": round(rate, 1),
                    "snr_db": round(snr, 2),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            except Exception as e:  # keep the gate running past one basis
                print(json.dumps({"basis": kind, "precision": prec,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)


def run_study():
    import dataclasses

    import jax

    from pseudo_3d_interpolation_tpu.models import POCSConfig
    from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform

    n = int(os.environ.get("BENCH_N", 512))
    niter = int(os.environ.get("BENCH_NITER", 50))
    base = POCSConfig(niter=niter, thresh_op="hard", p_min="adaptive",
                      version="fast", alpha=0.75, eps=0.0)
    print(f"{'config':<44s} {'slice-iters/s':>14s} {'SNR dB':>8s}")
    for prec in ("highest", "high", "default"):
        for b in (8, 32):
            truth, obs, mask = make_problem(b, n)
            tr = FFTTransform(precision=prec)
            rate, snr, _ = _timed_solve(tr, base, truth, obs, mask, niter)
            print(f"XLA  {prec:<8s} batch={b:<3d}{'':<24s} {rate:>14.0f} {snr:>8.2f}")
    pcfg = dataclasses.replace(base, use_pallas=True)
    for b in (8, 32):
        truth, obs, mask = make_problem(b, n)
        try:
            rate, snr, _ = _timed_solve(FFTTransform(), pcfg, truth, obs, mask, niter)
            print(f"PALLAS fused    batch={b:<3d}{'':<22s} {rate:>14.0f} {snr:>8.2f}")
        except Exception as e:
            print(f"PALLAS fused    batch={b}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    if os.environ.get("BENCH_STUDY") == "1":
        run_study()
    else:
        run_basis_gate()
