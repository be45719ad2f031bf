"""Mesh construction and sharding specs.

The workload (SURVEY.md §2.4, §5.7): thousands of independent (iline, xline)
frequency-slice POCS problems. The TPU-native layout shards the *frequency*
axis across a 1-D device mesh — the analogue of the reference's dask
slice-parallelism (cube_POCS_interpolation_3D.py:291-340), with ICI
collectives needed only for mask broadcast (XLA inserts it from the
replicated spec) and optional stats gathers. The solver itself runs with
zero inter-chip communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SLICE_AXIS = "slices"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host setup: one jax process group over DCN.

    Call once per host before :func:`make_mesh` on TPU pods spanning hosts
    (``jax.distributed.initialize``); single-host runs skip this. Arguments
    default to the TPU environment's auto-detection.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis_name: str = SLICE_AXIS) -> Mesh:
    """1-D mesh over available devices (or the first ``n_devices``)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(n_slices: int, n_space: int,
                 axis_names=(SLICE_AXIS, "space")) -> Mesh:
    """2-D mesh: slice-data-parallel × spatial model-parallel.

    For cubes whose slices are too large for one chip's HBM (or to scale
    past the number of frequency slices), the second axis shards the iline
    dimension of every slice; XLA partitions the DFT matmuls over it and
    inserts the ICI collectives for the contractions. Verified equal to the
    single-device solve in tests.
    """
    devs = jax.devices()
    if n_slices * n_space > len(devs):
        raise ValueError(f"mesh {n_slices}x{n_space} needs more than "
                         f"{len(devs)} devices")
    arr = np.asarray(devs[: n_slices * n_space]).reshape(n_slices, n_space)
    return Mesh(arr, axis_names)


def slice_sharding(mesh: Mesh, ndim: int, axis_name: str = SLICE_AXIS) -> NamedSharding:
    """Shard the leading (frequency/batch) axis; slice axes stay local."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (e.g. the shared sampling mask)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Batch size padded so it divides evenly across ``m`` shards."""
    return -(-n // m) * m


def reshard_axis(x, mesh: Mesh, axis: int, axis_name: str = SLICE_AXIS):
    """Re-lay an array so that ``axis`` is the sharded one.

    The device-resident replacement for the reference's on-disk time-major /
    slice-major transpose (cube_binning_3D.py:1313-1351): moving the sharded
    axis makes XLA insert the ICI ``all_to_all`` between stages that want
    different parallel axes (e.g. trace-parallel time FFT -> slice-parallel
    POCS), with no host round-trip.
    """
    spec = [None] * np.ndim(x)
    spec[axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
