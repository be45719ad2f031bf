import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax, jax.numpy as jnp
from pseudo_3d_interpolation_tpu.models import POCSConfig, pocs_interpolate
from pseudo_3d_interpolation_tpu.models.transforms import FFTTransform
from pseudo_3d_interpolation_tpu.ops.cplx import Cplx, from_complex
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

def bench(tag, cfg, reps=6):
    def solve_sum(z, m, scale):
        zz = type(z)(z.re*scale, z.im*scale)
        r = pocs_interpolate(zz, m, transform, cfg)
        return jnp.sum(r.data.re)+jnp.sum(r.data.im)
    fn = jit_hoisted(solve_sum)
    float(fn(z,m,jnp.float32(1.0)))
    t0=time.perf_counter()
    acc = fn(z,m,jnp.float32(1.0))
    for i in range(1,reps):
        acc = acc + fn(z,m,jnp.float32(1.0+0.001*i))
    float(acc)
    dt=(time.perf_counter()-t0)/reps
    # quality check: reconstruct once and SNR vs truth
    r = jax.jit(lambda z,m: pocs_interpolate(z,m,transform,cfg).data)(z,m)
    rec = np.asarray(r.re) + 1j*np.asarray(r.im)
    err = rec-truth
    snr = 10*np.log10((np.abs(truth)**2).sum()/ (np.abs(err)**2).sum())
    print(f"{tag:<44s} {B*NITER/dt:>8.0f} it/s  SNR {snr:6.2f} dB", flush=True)

base = dict(niter=NITER, thresh_op="hard", thresh_model="exponential",
            version="fast", alpha=0.75, eps=0.0, use_pallas=True)
order = sys.argv[1] if len(sys.argv)>1 else "a"
runs = [
  ("1e-3 fast", POCSConfig(p_min=1e-3, **base)),
  ("adaptive fast", POCSConfig(p_min="adaptive", **base)),
  ("1e-5 fast", POCSConfig(p_min=1e-5, **base)),
  ("adaptive regular", POCSConfig(p_min="adaptive", **{**base, "version":"regular"})),
  ("adaptive fast (again)", POCSConfig(p_min="adaptive", **base)),
]
if order=="b": runs = runs[::-1]
for t,c in runs: bench(t,c)
