"""Probe: box-group (support-cropped) POCS update cost vs box-size padding.

The scale-2 shearlet group at 512² has a 129-wide frequency box — an
odd size the MXU must pad. Extending the index set with zero-psi
frequencies changes no math but makes the matmul shapes explicit
multiples of 8/128. This times `_box_group_spatial` for the group as
planned (S=129) and zero-extended to 136/160/256, batch 8, HIGH.

Run on the attached TPU: ``python tools/probe_box.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.ops import shearlet as sh
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache


def extend_group(g, h, w, s_target):
    """Zero-psi extension of a box group's index sets to side s_target."""
    idx_h, idx_w = g.idx_h, g.idx_w
    extra = s_target - len(idx_h)
    if extra <= 0:
        return g
    used_h = set(int(i) for i in idx_h)
    used_w = set(int(i) for i in idx_w)
    add_h = [i for i in range(h) if i not in used_h][:extra]
    add_w = [i for i in range(w) if i not in used_w][:extra]
    new_h = np.concatenate([idx_h, np.asarray(add_h, idx_h.dtype)])
    new_w = np.concatenate([idx_w, np.asarray(add_w, idx_w.dtype)])
    lg, s0, _ = g.psi.shape
    psi = np.zeros((lg, s_target, s_target), g.psi.dtype)
    psi[:, :s0, :s0] = g.psi
    return type(g)(new_h, new_w, psi)


def main(b=8, n=512, prec_name="HIGH", reps_in_graph=25):
    enable_persistent_cache()
    prec = getattr(jax.lax.Precision, prec_name)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))
         ).astype(np.complex64)
    z = from_complex(x)
    plan = sh.shearlet_plan(n, n)
    big = max((g for g in plan if g.idx_h is not None),
              key=lambda g: len(g.idx_h))
    lg = big.psi.shape[0]
    print(f"group: {lg} subbands, box {len(big.idx_h)}x{len(big.idx_w)}")
    tau = jnp.full((b, lg), 0.05, jnp.float32)

    base = None
    # the plan's own side is the 1.00x base; since _box_indices rounds
    # group sides up to a multiple of 8 the base IS 136 at 512² (the
    # pre-extension S=129 cited in _box_indices' docstring predates that
    # rounding and can no longer be constructed from shearlet_plan) —
    # dedupe so the sweep doesn't time the same side twice
    for s_target in dict.fromkeys((len(big.idx_h), 136, 160, 256)):
        g = extend_group(big, n, n, s_target)

        def fn(zz, tt, s):
            def body(_, carry):
                out = sh._box_group_spatial(carry, tt, g, n, n, "hard", prec)
                return type(out)(out.re * s, out.im * s)

            out = jax.lax.fori_loop(0, reps_in_graph, body,
                                    type(zz)(zz.re * s, zz.im * s))
            return jnp.sum(out.re) + jnp.sum(out.im)

        jf = jax.jit(fn)
        float(jf(z, tau, jnp.float32(1.0)))
        t0 = time.perf_counter()
        acc = jf(z, tau, jnp.float32(1.0))
        for i in range(1, 6):
            acc = acc + jf(z, tau, jnp.float32(1.0 + 1e-3 * i))
        float(acc)
        dt = (time.perf_counter() - t0) / 6 / reps_in_graph
        if base is None:
            base = dt
        print(f"S={s_target:>3d}: {dt * 1e3:7.3f} ms/iter  ({dt / base:.2f}x)")


if __name__ == "__main__":
    main(prec_name=sys.argv[1] if len(sys.argv) > 1 else "HIGH")
