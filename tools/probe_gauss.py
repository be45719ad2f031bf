"""A/B probe: Gauss 3-dot complex products vs the exact 4-dot form.

The tunnel's throughput drifts between runs, so cross-run comparisons of
bench_detail numbers are unreliable for a ~25% effect. This probe traces
BOTH forms in ONE process (``P3D_NO_GAUSS`` is read at trace time) and
times them interleaved on the same device state:

  A  subband kernel alone (permuted layout, K folded applies per launch)
  F  folded FFT solve (batch 8, niter 50)

Run on the attached TPU: ``python tools/probe_gauss.py [HIGH|HIGHEST] [B]``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.ops import dft
from pseudo_3d_interpolation_tpu.ops import shearlet as sh
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.ops.pallas.pocs_iter import pocs_solve_fused
from pseudo_3d_interpolation_tpu.ops.pallas.subband import subband_update_fused
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache


def main(prec_name="HIGH", b=8, n=512, niter=50):
    enable_persistent_cache()
    prec = getattr(jax.lax.Precision, prec_name)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
         ).astype(np.complex64)
    z = from_complex(x)
    mask = np.ascontiguousarray(np.broadcast_to(
        (rng.uniform(size=n) < 0.5).astype(np.float32)[None, :], (n, n)))
    m = jnp.asarray(mask)

    plan = sh.shearlet_plan(n, n)
    lcount = sum(g.psi.shape[0] for g in plan)
    tau = jnp.full((b, lcount), 0.05, jnp.float32)
    psi_full, full_idx, _boxes = sh._plan_pallas_pack(plan, n, n, "permuted")
    zf = jax.jit(lambda zz: dft.fft2_permuted(zz, precision=prec))(z)
    tau_full = tau[:, jnp.asarray(full_idx)]
    decay = jnp.linspace(0.5, 0.01, niter)[:, None] * jnp.ones((1, b))

    K = 25

    def make_kern():
        # traced lazily on first call -> bakes the CURRENT env flag
        def kern(zz, tt, s):
            def body(_, carry):
                out = subband_update_fused(carry, psi_full, tt,
                                           thresh_op="hard", precision=prec)
                return type(out)(out.re * s, out.im * s)

            out = jax.lax.fori_loop(0, K, body, type(zz)(zz.re * s, zz.im * s))
            return jnp.sum(out.re) + jnp.sum(out.im)

        return jax.jit(kern)

    def make_solve():
        def solve(zz, mm, dd, s):
            out, cost = pocs_solve_fused(
                type(zz)(zz.re * s, zz.im * s), mm, dd,
                alpha=0.75, thresh_op="hard", version="fast",
                precision=prec)
            return jnp.sum(out.re) + jnp.sum(out.im) + jnp.sum(cost)

        return jax.jit(solve)

    variants = {}
    for name, flag in (("gauss", None), ("4dot", "1")):
        if flag is None:
            os.environ.pop("P3D_NO_GAUSS", None)
        else:
            os.environ["P3D_NO_GAUSS"] = flag
        kern = make_kern()
        solve = make_solve()
        t0 = time.time()
        float(kern(zf, tau_full, jnp.float32(1.0)))
        ck = time.time() - t0
        t0 = time.time()
        float(solve(z, m, decay, jnp.float32(1.0)))
        cs = time.time() - t0
        variants[name] = (kern, solve)
        print(f"[{name}] compiled: kern {ck:.0f}s solve {cs:.0f}s", flush=True)
    os.environ.pop("P3D_NO_GAUSS", None)

    # burn ramp
    for name, (kern, solve) in variants.items():
        float(kern(zf, tau_full, jnp.float32(1.0)))
        float(solve(z, m, decay, jnp.float32(1.0)))

    # interleaved timing, 3 rounds
    acc = {(nm, which): [] for nm in variants for which in ("kern", "solve")}
    for rnd in range(3):
        for name, (kern, solve) in variants.items():
            t0 = time.perf_counter()
            a = kern(zf, tau_full, jnp.float32(1.0))
            a = a + kern(zf, tau_full, jnp.float32(1.001))
            float(a)
            acc[(name, "kern")].append((time.perf_counter() - t0) / 2 / K)
            t0 = time.perf_counter()
            a = solve(z, m, decay, jnp.float32(1.0))
            a = a + solve(z, m, decay, jnp.float32(1.001))
            float(a)
            acc[(name, "solve")].append((time.perf_counter() - t0) / 2)
    print(f"precision={prec_name} batch={b} n={n} niter={niter}")
    for (name, which), ts in sorted(acc.items()):
        best = min(ts)
        if which == "kern":
            print(f"{name:6s} subband kernel : {best * 1e3:8.2f} ms/apply "
                  f"(all {['%.2f' % (t * 1e3) for t in ts]})", flush=True)
        else:
            rate = b * niter / best
            print(f"{name:6s} FFT fold solve : {best * 1e3:8.2f} ms "
                  f"({rate:.0f} slice-iters/s; all "
                  f"{['%.0f' % (b * niter / t) for t in ts]})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "HIGH",
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
