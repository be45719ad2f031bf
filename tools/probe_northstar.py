"""Phase-timing probe for the device-resident north-star driver.

Times upload / fwd rfft / each solve launch / inverse / download separately
(scalar fetches between phases so each number is a real wall time, not an
async dispatch artifact). Run on the attached TPU.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pseudo_3d_interpolation_tpu.models import POCSConfig
from pseudo_3d_interpolation_tpu.models.transforms import get_transform
from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
from pseudo_3d_interpolation_tpu.ops import dft
from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache


def sync(x):
    return float(jnp.sum(x[..., :2, :2]))


def main(h=512, w=512, t=1024, niter=50, batch=8, n_probe=6):
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(h, w, t)).astype(np.float32)
    mask2d = (rng.uniform(size=(h, w)) < 0.5).astype(np.float32)
    obs *= mask2d[:, :, None]
    cfg = POCSConfig(niter=niter, thresh_op="hard", p_min="adaptive",
                     version="fast", alpha=0.75, eps=0.0)
    transform = get_transform("SHEARLET", precision="high")
    nslices = t // 2 + 1
    npad = -(-nslices // batch) * batch

    @jax.jit
    def fwd(x):
        spec = dft.rfft1(x, axis=-1)
        z = Cplx(jnp.moveaxis(spec.re, -1, 0), jnp.moveaxis(spec.im, -1, 0))
        pad = [(0, npad - nslices), (0, 0), (0, 0)]
        return Cplx(jnp.pad(z.re, pad), jnp.pad(z.im, pad))

    @functools.partial(jax.jit, donate_argnums=0)
    def solve_batch(rec, z, m, start):
        zb = Cplx(jax.lax.dynamic_slice_in_dim(z.re, start, batch, 0),
                  jax.lax.dynamic_slice_in_dim(z.im, start, batch, 0))
        r = pocs_interpolate(zb, m, transform, cfg).data
        return Cplx(jax.lax.dynamic_update_slice_in_dim(rec.re, r.re, start, 0),
                    jax.lax.dynamic_update_slice_in_dim(rec.im, r.im, start, 0))

    t0 = time.time()
    xd = jnp.asarray(obs)
    sync(xd)
    print(f"upload {obs.nbytes/2**20:.0f} MB: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    md = jnp.asarray(mask2d)
    z_all = fwd(xd)
    sync(z_all.re)
    print(f"fwd rfft (incl compile): {time.time()-t0:.1f}s", flush=True)
    del xd

    rec = Cplx(jnp.zeros_like(z_all.re), jnp.zeros_like(z_all.im))
    t0 = time.time()
    rec = solve_batch(rec, z_all, md, jnp.int32(0))
    sync(rec.re)
    print(f"solve launch 0 (incl compile): {time.time()-t0:.1f}s", flush=True)
    for i in range(1, n_probe):
        t0 = time.time()
        rec = solve_batch(rec, z_all, md, jnp.int32(i * batch))
        sync(rec.re)
        dt = time.time() - t0
        print(f"solve launch {i}: {dt:.2f}s "
              f"({batch*niter/dt:.0f} slice-iters/s)", flush=True)

    t0 = time.time()
    out = np.asarray(rec.re[:4])
    print(f"fetch 4 slices: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
