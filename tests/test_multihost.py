"""Multi-host (DCN) execution: two coordinated jax processes form one
global mesh and run the sharded POCS solve.

The reference scales across hosts with dask distributed
(cube_POCS_interpolation_3D.py:291-305); here hosts join a jax process
group over DCN (`parallel.mesh.initialize_distributed`) and the SAME
sharded program runs unchanged — this test exercises that path on two
local CPU processes (4 virtual devices each → one 8-device global mesh),
which uses the identical distributed runtime (coordination service +
cross-process collectives) a TPU pod uses, minus the ICI fabric.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())  # repo root (script lives in tmp)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from pseudo_3d_interpolation_tpu.parallel import initialize_distributed

port, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator=f"localhost:{port}", num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()       # global
assert len(jax.local_devices()) == 4                     # per host

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pseudo_3d_interpolation_tpu.models import POCSConfig
from pseudo_3d_interpolation_tpu.models.transforms import get_transform
from pseudo_3d_interpolation_tpu.models.pocs import pocs_interpolate
from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
from pseudo_3d_interpolation_tpu.parallel import make_mesh

# identical data on every host (deterministic seed), sharded over slices
rng = np.random.default_rng(0)
F, n = 8, 32
truth = (rng.normal(size=(F, n, n)) + 1j*rng.normal(size=(F, n, n))).astype(np.complex64)
mask = np.ascontiguousarray(np.broadcast_to(
    (rng.uniform(size=n) < 0.6).astype(np.float32)[None, :], (n, n)))
obs = truth * mask

mesh = make_mesh()
sh = NamedSharding(mesh, P("slices"))
rep = NamedSharding(mesh, P())
z = Cplx(jax.make_array_from_callback((F, n, n), sh,
                                      lambda idx: obs.real[idx].astype(np.float32)),
         jax.make_array_from_callback((F, n, n), sh,
                                      lambda idx: obs.imag[idx].astype(np.float32)))
m = jax.make_array_from_callback((n, n), rep, lambda idx: mask[idx])

cfg = POCSConfig(niter=6, p_min=1e-3, version="fast", eps=0.0)
tr = get_transform("FFT")

@jax.jit
def solve(z_, m_):
    r = pocs_interpolate(z_, m_, tr, cfg)
    return jnp.sum(r.data.re ** 2 + r.data.im ** 2)

energy = float(solve(z, m))
assert np.isfinite(energy) and energy > 0
print(f"RESULT {pid} {energy:.6e}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(port), str(pid)],
                         cwd=REPO, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    energies = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out
        energies.append(float(lines[0].split()[2]))
    # both hosts observe the same global result of the one sharded solve
    np.testing.assert_allclose(energies[0], energies[1], rtol=1e-6)
