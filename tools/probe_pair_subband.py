"""A/B probe: two SUBBANDS per Pallas program in the fused directional
subband kernel (MXU/VPU instruction-level overlap).

Sibling of tools/probe_pair.py for the directional hot loop: the fused
subband kernel (ops/pallas/subband.py, 'permuted' layout) runs one
ifft2→threshold→fft2 round trip per grid step; the elementwise stages
(psi multiplies, threshold, accumulate — ~20% of the step at HIGHEST,
docs/perf.md round 3h) serialize against the step's own transforms.
Processing two subbands per program gives the scheduler two mostly
independent chains (they share only the final accumulate).

Exactness pinned vs subband_update_fused in interpret mode (--check);
device A/B interleaves both programs to cancel tunnel drift.

Usage:
    python tools/probe_pair_subband.py --check
    python tools/probe_pair_subband.py          # device A/B (512², L=32)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_pair_subband():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pseudo_3d_interpolation_tpu.ops import dft
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
    from pseudo_3d_interpolation_tpu.ops.pallas import pocs_iter as pk

    def pair_subband(x_spec: Cplx, psi, tau, thresh_op="hard",
                     precision=None, interpret=False):
        b, n, w = x_spec.re.shape
        assert n == w
        lcount = psi.shape[0]
        assert lcount % 2 == 0
        prec = (precision if precision is not None
                else jax.lax.Precision.HIGHEST)
        m, r, w_r, fmr, fmi, twl, twr_pack = pk._radix_kernel_constants(n)

        def kernel(tau_ref, xr, xi, psi_r, fmr_r, fmi_r, twl_r, twr_r,
                   accr, acci):
            bidx = pl.program_id(0)
            l2 = pl.program_id(1)
            fmrv = fmr_r[...]
            fmiv = fmi_r[...]
            twlv = twl_r[...]
            twrv = twr_r[...]
            gauss = pk._gauss_enabled()
            fms = fmrv + fmiv if gauss else None
            fmd = fmrv - fmiv if gauss else None
            dot = pk._make_dot(prec, fmrv, fmiv,
                               *[c for c in (fms, fmd) if c is not None])
            xrv = xr.at[0][...]
            xiv = xi.at[0][...]
            scale = 1.0 / (n * n)

            def band(k):
                p = psi_r.at[k][...]
                tau_v = tau_ref[bidx, 2 * l2 + k]
                prod_r = xrv * p
                prod_i = xiv * p
                br, bi = pk._fast_inv_right(prod_r, prod_i, dot, fmrv, fmiv,
                                            twrv, w_r, m, r, fmd)
                cr, ci = pk._fast_inv_left(br, bi, dot, fmrv, fmiv, twlv,
                                           w_r, m, r, fmd)
                cr = cr * scale
                ci = ci * scale
                shrink = pk._shrink(cr * cr + ci * ci, tau_v, thresh_op)
                cr = cr * shrink
                ci = ci * shrink
                ar, ai = pk._fast_fwd_left(cr, ci, dot, fmrv, fmiv, twlv,
                                           w_r, m, r, fms)
                vr, vi = pk._fast_fwd_right(ar, ai, dot, fmrv, fmiv, twrv,
                                            w_r, m, r, fms)
                return vr * p, vi * p

            # two independent chains; only the accumulate is shared
            ar0, ai0 = band(0)
            ar1, ai1 = band(1)
            sr = ar0 + ar1
            si = ai0 + ai1

            @pl.when(l2 == 0)
            def _init():
                accr.at[0][...] = sr
                acci.at[0][...] = si

            @pl.when(l2 > 0)
            def _accum():
                accr.at[0][...] = accr.at[0][...] + sr
                acci.at[0][...] = acci.at[0][...] + si

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, lcount // 2),
            in_specs=[
                pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n, n), lambda i, j, tau: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, 16), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, m), lambda i, j, tau: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, n), lambda i, j, tau: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
        )

        accr, acci = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, n, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024)
            if not interpret else None,
            interpret=interpret,
        )(jnp.asarray(tau, jnp.float32), x_spec.re, x_spec.im,
          jnp.asarray(psi, jnp.float32), jnp.asarray(fmr), jnp.asarray(fmi),
          jnp.asarray(twl), jnp.asarray(twr_pack))
        return Cplx(accr, acci)

    return pair_subband


def make_inputs(n, b, lcount, seed=0):
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(seed)
    x = Cplx(jnp.asarray(rng.normal(size=(b, n, n)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(b, n, n)).astype(np.float32)))
    psi = rng.uniform(0.0, 1.0, (lcount, n, n)).astype(np.float32)
    tau = rng.uniform(0.5, 2.0, (b, lcount)).astype(np.float32)
    return x, psi, tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--interleave", action="store_true",
                    help="rep-level A/B interleave (drift-robust)")
    ap.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"])
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.ops.pallas.subband import \
        subband_update_fused

    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]
    pair = build_pair_subband()

    if args.check:
        n, b, lcount = 256, 2, 4
        x, psi, tau = make_inputs(n, b, lcount)
        ref = subband_update_fused(x, psi, tau, precision=prec,
                                   interpret=True)
        got = pair(x, psi, tau, precision=prec, interpret=True)
        err = max(float(jnp.abs(ref.re - got.re).max()),
                  float(jnp.abs(ref.im - got.im).max()))
        print(f"interpret equality: max|d|={err:.3e}")
        assert err < 1e-4, "pair subband kernel diverges"
        print("OK")
        return

    x, psi, tau = make_inputs(args.n, args.batch, args.bands)
    f1 = jax.jit(lambda a, p, t: subband_update_fused(a, p, t,
                                                      precision=prec))
    f2 = jax.jit(lambda a, p, t: pair(a, p, t, precision=prec))

    def rate(fn, label):
        out = fn(x, psi, tau)
        float(jnp.sum(out.re))
        for _ in range(3):
            float(jnp.sum(fn(x, psi, tau).re))
        t0 = time.time()
        for _ in range(args.reps):
            float(jnp.sum(fn(x, psi, tau).re))
        dt = (time.time() - t0) / args.reps
        print(f"{label:8} {dt * 1e3:8.2f} ms/apply")
        return dt

    if args.interleave:
        # rep-level A/B interleave: tunnel drift hits both programs
        # equally inside one window (probe_gauss methodology, finer)
        for f in (f1, f2):  # compile + burn ramp
            for _ in range(4):
                float(jnp.sum(f(x, psi, tau).re))
        t1 = t2 = 0.0
        for _ in range(args.reps):
            t0 = time.time()
            float(jnp.sum(f1(x, psi, tau).re))
            t1 += time.time() - t0
            t0 = time.time()
            float(jnp.sum(f2(x, psi, tau).re))
            t2 += time.time() - t0
        d1, d2 = t1 / args.reps, t2 / args.reps
        print(f"single {d1 * 1e3:8.2f} ms/apply")
        print(f"pair   {d2 * 1e3:8.2f} ms/apply")
        print(f"interleaved: single/pair = {d1 / d2:.3f}x "
              f"({'pair wins' if d2 < d1 else 'single wins'})")
        return

    for round_ in range(2):
        d1 = rate(f1, "single")
        d2 = rate(f2, "pair")
        print(f"round {round_}: single/pair = {d1 / d2:.3f}x "
              f"({'pair wins' if d2 < d1 else 'single wins'})")


if __name__ == "__main__":
    main()
