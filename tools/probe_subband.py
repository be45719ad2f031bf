"""Probe: where a directional (SHEARLET) POCS iteration spends its time.

Decomposes the fused-subband solve at 512² (batch 8) into
  A. the Pallas full-size-subband kernel alone (ops/pallas/subband.py),
  B. one whole subband apply  = fft2_permuted + kernel + box groups +
     ifft2_from_permuted      (ops/shearlet.py::pocs_subband_apply),
  C. one full solve iteration = B + momentum/reinsert/cost XLA glue
     (models/pocs.py scan body), amortized from a 50-iteration solve.

C−B is the per-iteration XLA glue, B−A the box groups plus the top-level
spectral round trip. Whichever dominates is the next fold target.

Run on the attached TPU: ``python tools/probe_subband.py [HIGH|HIGHEST]``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
from pseudo_3d_interpolation_tpu.models.transforms import get_transform
from pseudo_3d_interpolation_tpu.ops import dft
from pseudo_3d_interpolation_tpu.ops import shearlet as sh
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.ops.pallas.subband import subband_update_fused
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache
from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted


def timed(jf, args, reps=10):
    """Scalar-fetch chained timing (see bench.py for why)."""
    t0 = time.perf_counter()
    float(jf(*args, jnp.float32(1.0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = jf(*args, jnp.float32(1.0))
    for i in range(1, reps):
        acc = acc + jf(*args, jnp.float32(1.0 + 1e-3 * i))
    float(acc)
    return (time.perf_counter() - t0) / reps, compile_s


def main(b=8, n=512, niter=50, prec_name="HIGH"):
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

    # Single ops are dispatch-RPC-bound through the tunnel (~0.1-0.5 s per
    # launch), so A and B iterate the op K times INSIDE one jit (output fed
    # back as input — the op is shape-preserving) and divide by K.
    K = 25

    # --- A: kernel alone on the permuted spectrum -------------------------
    psi_full, full_idx, _boxes = sh._plan_pallas_pack(plan, n, n, "permuted")
    zf = jax.jit(lambda zz: dft.fft2_permuted(zz, precision=prec))(z)
    tau_full = tau[:, jnp.asarray(full_idx)]

    def kern(zz, tt, s):
        def body(_, carry):
            out = subband_update_fused(carry, psi_full, tt,
                                       thresh_op="hard", precision=prec)
            # renormalize so K rounds of thresholding don't underflow
            return type(out)(out.re * s, out.im * s)

        out = jax.lax.fori_loop(0, K, body, type(zz)(zz.re * s, zz.im * s))
        return jnp.sum(out.re) + jnp.sum(out.im)

    t_a, c_a = timed(jit_hoisted(kern), (zf, tau_full))
    t_a /= K

    # --- B: full subband apply (kernel + boxes + spectral round trip) ----
    def apply_once(zz, tt, s):
        def body(_, carry):
            out = sh.pocs_subband_apply(carry, plan, tt, "hard",
                                        precision=prec, use_pallas=True)
            return type(out)(out.re * s, out.im * s)

        out = jax.lax.fori_loop(0, K, body, type(zz)(zz.re * s, zz.im * s))
        return jnp.sum(out.re) + jnp.sum(out.im)

    t_b, c_b = timed(jit_hoisted(apply_once), (z, tau))
    t_b /= K

    # --- B2: same, with the biggest box group STREAMED over subbands ----
    def apply_stream(zz, tt, s):
        def body(_, carry):
            out = sh.pocs_subband_apply(carry, plan, tt, "hard",
                                        precision=prec, use_pallas=True,
                                        stream_min_side=129)
            return type(out)(out.re * s, out.im * s)

        out = jax.lax.fori_loop(0, K, body, type(zz)(zz.re * s, zz.im * s))
        return jnp.sum(out.re) + jnp.sum(out.im)

    t_b2, c_b2 = timed(jit_hoisted(apply_stream), (z, tau))
    t_b2 /= K

    # --- C: full solve, amortized per iteration ---------------------------
    tr = get_transform("shearlet", precision=prec_name.lower())
    cfg = POCSConfig(niter=niter, thresh_op="hard", thresh_model="exponential",
                     p_min="adaptive", version="fast", alpha=0.75, eps=0.0,
                     use_pallas=True)

    def solve(zz, mm, s):
        r = pocs_interpolate(type(zz)(zz.re * s, zz.im * s), mm, tr, cfg)
        return jnp.sum(r.data.re) + jnp.sum(r.data.im)

    t_c, c_c = timed(jit_hoisted(solve), (z, m), reps=3)
    t_c_iter = t_c / niter

    print(f"precision={prec_name} batch={b} n={n}")
    print(f"A kernel-only        : {t_a * 1e3:8.2f} ms/iter (compile {c_a:.0f}s)")
    print(f"B subband apply      : {t_b * 1e3:8.2f} ms/iter (compile {c_b:.0f}s)")
    print(f"B2 apply, boxes scan : {t_b2 * 1e3:8.2f} ms/iter (compile {c_b2:.0f}s)")
    print(f"C solve/iter         : {t_c_iter * 1e3:8.2f} ms/iter (compile {c_c:.0f}s)")
    print(f"  boxes+spectral (B-A): {(t_b - t_a) * 1e3:8.2f} ms/iter")
    print(f"  XLA glue      (C-B): {(t_c_iter - t_b) * 1e3:8.2f} ms/iter")
    print(f"  solve rate         : {b * niter / t_c:8.1f} slice-iters/s")


if __name__ == "__main__":
    main(prec_name=sys.argv[1] if len(sys.argv) > 1 else "HIGH",
         b=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
