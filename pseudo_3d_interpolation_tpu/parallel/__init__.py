"""Device-mesh parallelism for slice-parallel cube interpolation."""

from .mesh import (make_mesh, slice_sharding, replicated_sharding,
                   initialize_distributed)
from .solver import pocs_interpolate_sharded, interpolate_cube

__all__ = [
    "make_mesh",
    "initialize_distributed",
    "slice_sharding",
    "replicated_sharding",
    "pocs_interpolate_sharded",
    "interpolate_cube",
]
