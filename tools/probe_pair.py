"""A/B probe: two POCS slices per Pallas program (instruction-level
MXU/VPU overlap) vs the production one-slice folded solve.

Hypothesis (docs/perf.md round 3h): the folded FFT kernel sits at ~70%
of the f32 matmul ceiling, the missing ~30% being VPU stages (threshold,
reinsertion, cost, butterflies/twiddles) serialized against only two
transforms per iteration. Running TWO independent slices per program
gives the Mosaic scheduler co-resident independent dataflow chains whose
VPU work can hide under the other chain's MXU passes. Cost: ~2x the
VMEM per program (two slice states + both chains' matmul temporaries).

The pair kernel mirrors ops/pallas/pocs_iter._solve_kernel's FFT
Cooley-Tukey split arm exactly (regular/fast versions, hard/soft/garrote
thresholds, Gauss products, adaptive restart); exactness is pinned
against pocs_solve_fused in interpret mode by --check (run on CPU).

Usage:
    python tools/probe_pair.py --check            # CPU interpret equality
    python tools/probe_pair.py                    # device A/B (512², b=8)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_pair_solve():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pseudo_3d_interpolation_tpu.ops import dft
    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
    from pseudo_3d_interpolation_tpu.ops.pallas import pocs_iter as pk

    def pair_solve(obs: Cplx, mask, decay, alpha=0.75, thresh_op="hard",
                   version="fast", interpret=False, precision=None):
        b, h, w = obs.re.shape
        assert h == w and b % 2 == 0
        n = h
        decay = jnp.asarray(decay, jnp.float32)
        niter = decay.shape[0]
        m_, r_, w_r, fr, fi, twl, twr_pack = pk._radix_kernel_constants(n)
        prec = precision if precision is not None else jax.lax.Precision.HIGHEST
        fast = version == "fast"

        def kernel(tau_ref, xr, xi, mask_r, fr_r, fi_r, twl_r, twr_r,
                   outr, outi, cost_ref):
            i = pl.program_id(0)
            frv = fr_r[...]
            fiv = fi_r[...]
            twlv = twl_r[...]
            twrv = twr_r[...]
            mask_v = mask_r[...]
            keep = 1.0 - alpha * mask_v
            gauss = pk._gauss_enabled()
            fs = frv + fiv if gauss else None
            fd = frv - fiv if gauss else None
            dot = pk._make_dot(prec, frv, fiv,
                               *[c for c in (fs, fd) if c is not None])

            obs_pair = [(xr.at[0][...], xi.at[0][...]),
                        (xr.at[1][...], xi.at[1][...])]

            def step(state, obr, obi, tau):
                xr_prev, xi_prev, x_r, x_i, v, cost_prev = state
                v1 = (1.0 + jnp.sqrt(1.0 + 4.0 * v * v)) / 2.0
                f = (v - 1.0) / (v1 + 1.0) if fast else jnp.float32(0.0)
                yr_in = x_r + f * (x_r - xr_prev)
                yi_in = x_i + f * (x_i - xi_prev)
                ar, ai = pk._fast_fwd_left(yr_in, yi_in, dot, frv, fiv,
                                           twlv, w_r, m_, r_, fs)
                Xr, Xi = pk._fast_fwd_right(ar, ai, dot, frv, fiv,
                                            twrv, w_r, m_, r_, fs)
                shrink = pk._shrink(Xr * Xr + Xi * Xi, tau, thresh_op)
                Xr = Xr * shrink
                Xi = Xi * shrink
                br, bi = pk._fast_inv_right(Xr, Xi, dot, frv, fiv,
                                            twrv, w_r, m_, r_, fd)
                rr, ri = pk._fast_inv_left(br, bi, dot, frv, fiv,
                                           twlv, w_r, m_, r_, fd)
                scale = 1.0 / (n * n)
                new_r = rr * scale * keep + alpha * obr
                new_i = ri * scale * keep + alpha * obi
                mag_new = jnp.sqrt(new_r * new_r + new_i * new_i)
                mag_old = jnp.sqrt(x_r * x_r + x_i * x_i)
                d = jnp.sum(mag_new - mag_old)
                s = jnp.sum(mag_new)
                cost = (d * d) / jnp.where(s == 0.0, 1.0, s * s)
                if fast:
                    restart = cost > cost_prev
                    pr = jnp.where(restart, new_r, x_r)
                    pi = jnp.where(restart, new_i, x_i)
                    v_next = jnp.where(restart, 1.0, v1)
                else:
                    pr, pi, v_next = x_r, x_i, v1
                return (pr, pi, new_r, new_i, v_next, cost)

            def one(j, carry):
                sa, sb = carry
                # the two chains are fully independent: Mosaic may
                # interleave chain B's VPU stages under chain A's MXU
                # passes and vice versa
                sa = step(sa, *obs_pair[0], tau_ref[2 * i, j])
                sb = step(sb, *obs_pair[1], tau_ref[2 * i + 1, j])
                return (sa, sb)

            def init(o):
                return (o[0], o[1], o[0], o[1], jnp.float32(1.0),
                        jnp.float32(jnp.inf))

            (sa, sb) = jax.lax.fori_loop(
                0, int(niter), one, (init(obs_pair[0]), init(obs_pair[1])))
            outr.at[0][...] = sa[2]
            outi.at[0][...] = sa[3]
            outr.at[1][...] = sb[2]
            outi.at[1][...] = sb[3]
            cost_ref[2 * i] = sa[5]
            cost_ref[2 * i + 1] = sb[5]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // 2,),
            in_specs=[
                pl.BlockSpec((2, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, w), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_, m_), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_, m_), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_, 16), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((16, m_), lambda i, tau: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((2, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, h, w), lambda i, tau: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b,), lambda i, tau: (0,), memory_space=pltpu.SMEM),
            ],
        )

        outr, outi, cost = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                jax.ShapeDtypeStruct((b,), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024)
            if not interpret else None,
            interpret=interpret,
        )(decay.T, obs.re, obs.im, jnp.asarray(mask, jnp.float32),
          jnp.asarray(fr), jnp.asarray(fi), jnp.asarray(twl),
          jnp.asarray(twr_pack))
        return Cplx(outr, outi), cost

    return pair_solve


def make_problem(n, b, niter, seed=0):
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    re = np.zeros((b, n, n), np.float32)
    im = np.zeros((b, n, n), np.float32)
    for i in range(b):
        for _ in range(6):
            fy, fx = rng.integers(1, 12, 2)
            ph = rng.uniform(0, 2 * np.pi)
            re[i] += np.cos(2 * np.pi * (fy * yy / n + fx * xx / n) + ph)
            im[i] += np.sin(2 * np.pi * (fy * yy / n + fx * xx / n) + ph)
    mask = (rng.uniform(size=(n,)) < 0.5).astype(np.float32)
    mask = np.ascontiguousarray(np.broadcast_to(mask[None, :], (n, n)))
    obs = Cplx(jnp.asarray(re * mask), jnp.asarray(im * mask))
    decay = np.geomspace(np.abs(re).max() * n, 1e-3, niter)
    decay = np.broadcast_to(decay[:, None], (niter, b)).copy()
    return obs, jnp.asarray(mask), decay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="CPU interpret-mode equality vs pocs_solve_fused")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--niter", type=int, default=50)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"])
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pseudo_3d_interpolation_tpu.ops.pallas.pocs_iter import \
        pocs_solve_fused

    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.precision]
    pair_solve = build_pair_solve()

    if args.check:
        n, b, niter = 256, 4, 8
        obs, mask, decay = make_problem(n, b, niter)
        ref, cost_ref = pocs_solve_fused(obs, mask, decay, interpret=True,
                                         precision=prec)
        got, cost_got = pair_solve(obs, mask, decay, interpret=True,
                                   precision=prec)
        err = max(float(jnp.abs(ref.re - got.re).max()),
                  float(jnp.abs(ref.im - got.im).max()))
        cerr = float(jnp.abs(cost_ref - cost_got).max())
        print(f"interpret equality: max|dx|={err:.3e} max|dcost|={cerr:.3e}")
        assert err < 5e-5 and cerr < 1e-10, "pair kernel diverges"
        print("OK")
        return

    n, b, niter = args.n, args.batch, args.niter
    obs, mask, decay = make_problem(n, b, niter)

    def rate(fn, label):
        out, cost = fn(obs, mask, decay, precision=prec)
        float(jnp.sum(out.re))  # force execution (tunnel-safe readback)
        for _ in range(3):  # burn device ramp
            out, cost = fn(obs, mask, decay, precision=prec)
            float(jnp.sum(out.re))
        t0 = time.time()
        for _ in range(args.reps):
            out, cost = fn(obs, mask, decay, precision=prec)
            float(jnp.sum(out.re))
        dt = (time.time() - t0) / args.reps
        r = b * niter / dt
        print(f"{label:8} {dt * 1e3:8.1f} ms/solve  {r:10.0f} slice-iters/s")
        return r

    f1 = jax.jit(lambda o, m, d, precision=prec: pocs_solve_fused(
        o, m, d, precision=precision))
    f2 = jax.jit(lambda o, m, d, precision=prec: pair_solve(
        o, m, d, precision=precision))
    # interleave to cancel tunnel drift (probe_gauss methodology)
    for round_ in range(2):
        r1 = rate(lambda o, m, d, precision=prec: f1(o, m, d), "single")
        r2 = rate(lambda o, m, d, precision=prec: f2(o, m, d), "pair")
        print(f"round {round_}: pair/single = {r2 / r1:.3f}")


if __name__ == "__main__":
    main()
