"""TPU-native pseudo-3D seismic interpolation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``fwrnke/pseudo-3D-interpolation`` (Warnke et al., 2023, GEOPHYSICS): turn many
densely spaced 2D sub-bottom profiler SEG-Y lines into an interpolated
pseudo-3D seismic cube, with the POCS sparse-inversion solver as the
computational heart.

Architecture (TPU-first, not a port):

- ``ops``       pure-functional jit/vmap/pjit-compatible numerics (thresholds,
                decay schedules, spectral transforms, gain/AGC/filters,
                geometry) + Pallas kernels for the hot elementwise fusions.
- ``models``    the POCS solver family (regular / fast / adaptive) expressed as
                ``lax.scan`` over batched transform->threshold->inverse->
                reinsertion steps, transform-agnostic via a SparseTransform
                protocol (FFT / DCT / wavelet / shearlet).
- ``parallel``  device-mesh sharding: thousands of independent frequency-slice
                problems pjit-sharded over a ``jax.sharding.Mesh``.
- ``io``        host-side SEG-Y (native C++-accelerated rev0/rev1 codec built
                in-repo; no segyio dependency) and netCDF4-compatible HDF5
                cube store (h5py), streaming into fixed-shape device batches.
- ``pipeline``  the 16 workflow steps of the reference as composable library
                calls + one ``p3d`` CLI.
- ``utils``     logging, unit conversions, padding, config plumbing.

Reference parity map: see SURVEY.md at the repo root; individual modules cite
the reference behavior they re-implement as ``reference: file:line``.
"""

__version__ = "0.2.0"

from . import utils  # noqa: F401

__all__ = ["ops", "models", "parallel", "io", "pipeline", "utils", "__version__"]
