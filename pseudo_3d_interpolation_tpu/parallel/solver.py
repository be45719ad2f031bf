"""Sharded slice-parallel POCS: the TPU equivalent of the reference's dask
LocalCluster + apply_ufunc driver (cube_POCS_interpolation_3D.py:291-340).

Design: frequency slices are embarrassingly parallel, so the batch axis is
sharded over a 1-D mesh with ``jax.jit`` + ``NamedSharding``; XLA partitions
the batched matmul-DFT/threshold/reinsert chain with no collectives in the
hot loop (the replicated mask broadcast happens once at transfer).
``interpolate_cube`` adds host-side chunking over the frequency axis — the
analogue of the reference's ``batch_chunk`` output batching — to bound HBM
use and overlap host I/O with device compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pocs import POCSConfig, POCSResult, pocs_interpolate
from ..models.transforms import get_transform
from ..ops.cplx import Cplx, from_complex, to_complex
from ..utils.pad import auto_pad_to_tile, pad_slices_to_tile
from . import mesh as mesh_lib


@functools.lru_cache(maxsize=32)
def _sharded_solver(mesh: "jax.sharding.Mesh", transform, cfg: POCSConfig):
    """Build + cache a jitted solver with slice-axis input/output shardings.

    Plan constants (directional window stacks, DFT matrices) ride as
    replicated runtime parameters instead of inline HLO literals
    (utils/hoist.py) — bounds the compile payload on tunnel-attached
    workers and keeps one device copy per constant.
    """
    from ..utils.hoist import jit_hoisted

    in_z = mesh_lib.slice_sharding(mesh, 3)
    in_mask = mesh_lib.replicated_sharding(mesh)
    out_z = mesh_lib.slice_sharding(mesh, 3)
    out_scalar = mesh_lib.slice_sharding(mesh, 1)

    def solve(z: Cplx, mask: jnp.ndarray):
        return pocs_interpolate(z, mask, transform, cfg)

    return jit_hoisted(
        solve,
        in_shardings=(Cplx(in_z, in_z), in_mask),
        out_shardings=POCSResult(Cplx(out_z, out_z), out_scalar, out_scalar, None),
        const_sharding=mesh_lib.replicated_sharding(mesh),
    )


def pocs_interpolate_sharded(
    z: Cplx,
    mask,
    mesh=None,
    transform=None,
    config: POCSConfig = POCSConfig(),
):
    """Solve a batch of slices sharded over the mesh's slice axis.

    ``z`` is a ``Cplx`` of shape (B, H, W); B must divide evenly across the
    mesh (pad with zero slices host-side — they short-circuit to zero output,
    reference POCS.py:515-521, so padding is free).

    ``config.pad_to_tile`` is ignored at this layer (driver-level option —
    the cube drivers pad host-side before calling in).
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    if transform is None:
        transform = get_transform(config.transform_kind)
    n_dev = mesh.devices.size
    b = z.shape[0]
    if b % n_dev:
        raise ValueError(f"batch {b} not divisible by mesh size {n_dev}; pad first")
    solver = _sharded_solver(mesh, transform, config)
    return solver(z, jnp.asarray(mask, jnp.float32))


def interpolate_cube(
    data,
    mask,
    config: POCSConfig = POCSConfig(),
    mesh=None,
    transform=None,
    batch: int = 128,
    progress=None,
):
    """Interpolate a full cube (freq/twt, iline, xline) slice-by-slice.

    Host-side driver: chunks the leading axis into device batches (padded to
    the mesh size), streams each chunk through the sharded solver, and
    reassembles numpy outputs plus per-slice telemetry. This replaces the
    reference's dask batch loop + per-batch netCDF writes + .out runtime
    files (cube_POCS_interpolation_3D.py:303-390).

    Parameters
    ----------
    data : np.ndarray (complex64 or float32), shape (F, H, W)
    mask : np.ndarray (H, W) — shared sampling mask from the fold
    batch : slices per device dispatch (bounds HBM residency)
    progress : optional callable(done, total)

    Returns
    -------
    (recon, n_iterations, cost) numpy arrays: (F, H, W), (F,), (F,)
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    data = np.asarray(data)
    was_complex = np.iscomplexobj(data)
    f_total = data.shape[0]
    if f_total == 0:  # empty cube: empty results, not range(0, 0, 0)
        return (np.empty(data.shape, np.complex64 if was_complex
                         else np.float32),
                np.empty((0,), np.int32), np.empty((0,), np.float32))
    crop = None
    if auto_pad_to_tile(config, data.shape[-2], data.shape[-1], transform):
        data, mask, crop = pad_slices_to_tile(data, mask)
    batch = mesh_lib.pad_to_multiple(min(batch, f_total), n_dev)

    out = np.empty(data.shape, np.complex64 if was_complex else np.float32)
    n_iters = np.empty((f_total,), np.int32)
    costs = np.empty((f_total,), np.float32)
    mask32 = np.asarray(mask, np.float32)

    def _dispatch(start):
        stop = min(start + batch, f_total)
        chunk = data[start:stop]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        res = pocs_interpolate_sharded(
            from_complex(chunk), mask32, mesh=mesh, transform=transform, config=config
        )
        return start, stop, res

    def _collect(item):
        start, stop, res = item
        rec = to_complex(res.data) if was_complex else np.asarray(res.data.re)
        out[start:stop] = rec[: stop - start]
        n_iters[start:stop] = np.asarray(res.n_iterations)[: stop - start]
        costs[start:stop] = np.asarray(res.cost)[: stop - start]
        if progress is not None:
            progress(stop, f_total)

    # jax dispatch is async: keep one chunk in flight ahead of the one being
    # materialized, overlapping host<->device transfers with device compute
    # (the reference overlaps via threaded dask writes instead)
    in_flight = None
    for start in range(0, f_total, batch):
        nxt = _dispatch(start)
        if in_flight is not None:
            _collect(in_flight)
        in_flight = nxt
    if in_flight is not None:
        _collect(in_flight)
    if crop is not None:
        out = np.ascontiguousarray(out[..., :crop[0], :crop[1]])
    return out, n_iters, costs


def interpolate_cube_resident(
    data,
    mask,
    config: POCSConfig = POCSConfig(),
    transform=None,
    batch: int = 8,
    progress=None,
    _max_launches: int | None = None,
):
    """Device-resident cube driver: ONE upload, short per-batch launches
    with donated buffers, ONE download.

    The measured-fastest robust shape for remote-attached chips
    (docs/perf.md): the whole spectrum and the growing result live in HBM
    across launches, each launch solves one batch (~2 s at 512²/SHEARLET/
    HIGH — far under the remote worker's ~60-90 s execution ceiling), and
    host<->device traffic happens exactly twice. Single-device by design;
    for mesh-sharded or larger-than-HBM cubes use :func:`interpolate_cube`
    (host-chunked) or the checkpointed streaming driver.

    Same signature/returns as :func:`interpolate_cube` minus ``mesh``.
    """
    if transform is None:
        transform = get_transform(config.transform_kind)
    data = np.asarray(data)
    was_complex = np.iscomplexobj(data)
    f_total = data.shape[0]
    if f_total == 0:  # empty cube: empty results, not a ZeroDivisionError
        return (np.empty(data.shape, np.complex64 if was_complex
                         else np.float32),
                np.empty((0,), np.int32), np.empty((0,), np.float32))
    crop = None
    if auto_pad_to_tile(config, data.shape[-2], data.shape[-1], transform):
        data, mask, crop = pad_slices_to_tile(data, mask)
    batch = min(batch, f_total)
    npad = mesh_lib.pad_to_multiple(f_total, batch)
    if npad != f_total:
        data = np.concatenate(
            [data, np.zeros((npad - f_total,) + data.shape[1:], data.dtype)])
    zh = from_complex(data)
    zd = Cplx(jnp.asarray(zh.re), jnp.asarray(zh.im))
    md = jnp.asarray(np.asarray(mask, np.float32))

    from ..utils.hoist import jit_hoisted

    @functools.partial(jit_hoisted, donate_argnums=(0, 1, 2))
    def step(rec, iters, cost, zall, m, start):
        zb = Cplx(jax.lax.dynamic_slice_in_dim(zall.re, start, batch, 0),
                  jax.lax.dynamic_slice_in_dim(zall.im, start, batch, 0))
        res = pocs_interpolate(zb, m, transform, config)
        rec = Cplx(
            jax.lax.dynamic_update_slice_in_dim(rec.re, res.data.re, start, 0),
            jax.lax.dynamic_update_slice_in_dim(rec.im, res.data.im, start, 0))
        iters = jax.lax.dynamic_update_slice_in_dim(
            iters, res.n_iterations.astype(jnp.int32), start, 0)
        cost = jax.lax.dynamic_update_slice_in_dim(
            cost, res.cost.astype(jnp.float32), start, 0)
        return rec, iters, cost

    rec = Cplx(jnp.zeros_like(zd.re), jnp.zeros_like(zd.im))
    iters = jnp.zeros((npad,), jnp.int32)
    cost = jnp.zeros((npad,), jnp.float32)
    # _max_launches: compile-only callers (pipeline.pocs.warmup) run a
    # single launch against production-shaped buffers — step()'s HLO keys
    # on the FULL padded cube shape, so warming a toy cube misses the cache
    starts = range(0, npad, batch)
    if _max_launches is not None:
        starts = list(starts)[:_max_launches]
    for s in starts:
        rec, iters, cost = step(rec, iters, cost, zd, md, jnp.int32(s))
        if progress is not None:
            progress(min(s + batch, f_total), f_total)
    out = to_complex(rec) if was_complex else np.asarray(rec.re)
    if crop is not None:
        out = np.ascontiguousarray(out[..., :crop[0], :crop[1]])
    return out[:f_total], np.asarray(iters)[:f_total], np.asarray(cost)[:f_total]


def pocs_interpolate_scanned(
    z: Cplx,
    mask,
    transform=None,
    config: POCSConfig = POCSConfig(),
    batch: int = 8,
):
    """Whole-cube solve as ONE jittable program: ``lax.scan`` over batches.

    For multiscale bases (SHEARLET/WAVELET) the per-slice coefficient stack
    is too large to materialize for all slices at once; scanning over
    batches inside a single jit keeps transients batch-sized while the
    entire cube solve is one dispatch, and inputs/outputs stay
    device-resident either side.

    **Measured caveats on the v5e (docs/perf.md)**: for the 61-subband
    shearlet body XLA compiles this scan to a ~4x SLOWER program than
    per-batch dispatch (441 s vs 129 s for the north-star cube), and the
    remote worker kills single executions beyond ~60-90 s — so production
    drivers (pipeline/pocs.py, examples/northstar_run.py) dispatch one
    short jitted launch per batch with donated output buffers instead.
    This entry point remains for cheap bases/small cubes where one launch
    fits the ceiling and per-launch latency dominates.

    ``z``: (F, H, W) pair with F divisible by ``batch`` (pad with zero
    slices — they short-circuit). Returns (data, n_iterations, cost) like
    :func:`pocs_interpolate`, but F-length. ``config.pad_to_tile`` is
    ignored at this layer (driver-level option — the cube drivers pad
    host-side before calling in).
    """
    if transform is None:
        transform = get_transform(config.transform_kind)
    f_total = z.shape[0]
    if f_total % batch:
        raise ValueError(f"slices {f_total} not divisible by batch {batch}; pad first")
    nb = f_total // batch
    h, w = z.shape[-2], z.shape[-1]
    zr = z.re.reshape(nb, batch, h, w)
    zi = z.im.reshape(nb, batch, h, w)
    mask = jnp.asarray(mask, z.dtype)

    def body(carry, zb):
        res = pocs_interpolate(Cplx(zb[0], zb[1]), mask, transform, config)
        return carry, (res.data.re, res.data.im, res.n_iterations, res.cost)

    _, (rr, ri, ni, cost) = jax.lax.scan(body, None, (zr, zi))
    return (Cplx(rr.reshape(f_total, h, w), ri.reshape(f_total, h, w)),
            ni.reshape(f_total), cost.reshape(f_total))
