import sys, os
sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp
from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform
from pseudo_3d_interpolation_tpu.ops.cplx import from_complex
from pseudo_3d_interpolation_tpu.utils.compcache import enable_persistent_cache
from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted
enable_persistent_cache()
H=W=512; B=32; NITER=50
rng = np.random.default_rng(0)
yy,xx = np.mgrid[0:H,0:W]
truth = np.zeros((B,H,W), np.complex64)
for i in range(B):
    r = np.random.default_rng(i)
    for _ in range(6):
        fy,fx = r.integers(1,24,size=2)
        truth[i] += r.uniform(0.5,2.0)*np.exp(2j*np.pi*(fy*yy/H+fx*xx/W)+1j*r.uniform(0,6.28))
mask = (rng.uniform(size=W)<0.5).astype(np.float32)
mask = np.ascontiguousarray(np.broadcast_to(mask[None,:],(H,W)))
obs = truth*mask
z = from_complex(obs); m = jnp.asarray(mask)
transform = FFTTransform()
cfg = POCSConfig(niter=NITER, thresh_op="hard", thresh_model="exponential",
            p_min="adaptive", version="fast", alpha=0.75, eps=0.0, use_pallas=True)
def solve_sum(z, m, scale):
    zz = type(z)(z.re*scale, z.im*scale)
    r = pocs_interpolate(zz, m, transform, cfg)
    return jnp.sum(r.data.re)+jnp.sum(r.data.im)
fn = jit_hoisted(solve_sum)
t0=time.perf_counter(); float(fn(z,m,jnp.float32(1.0))); print(f"warmup(compile) {time.perf_counter()-t0:.1f}s", flush=True)
# ten windows of 3 reps each, per-window rate
for wnd in range(10):
    t0=time.perf_counter()
    acc = fn(z,m,jnp.float32(1.0))
    for i in range(1,3):
        acc = acc + fn(z,m,jnp.float32(1.0+0.001*(wnd*3+i)))
    float(acc)
    dt=(time.perf_counter()-t0)/3
    print(f"window {wnd}: {B*NITER/dt:>8.0f} it/s", flush=True)
