"""Workflow steps (the reference's 16 numbered console scripts as library
functions + the ``p3d`` CLI).

Stage 1 (SEG-Y in/out, per profile):
  01 merge        02 reproject     03 delrt_correct  04 delrt_pad
  05 static       06 tide          07 mistie         08 despike
Stage 2 (cube, netCDF-compatible HDF5):
  09 segy2cube    10 binning       11 preprocess     12 fft
  13 pocs         14 ifft          15 postprocess    16 cube2segy
"""

from . import binning  # noqa: F401
from . import fft  # noqa: F401
from . import pocs  # noqa: F401
from . import ifft  # noqa: F401
from . import stage2  # noqa: F401  (sharded device-resident 12-14 span)
