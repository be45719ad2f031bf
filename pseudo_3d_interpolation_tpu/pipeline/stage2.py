"""Sharded device-resident stage-2 core: FFT -> POCS -> IFFT on one mesh.

replaces: the reference running its whole stage 2 under one dask cluster
(cube_POCS_interpolation_3D.py:291-340) — every step chunked over the same
worker pool with on-disk transposes between layout-incompatible stages
(cube_binning_3D.py:1313-1351). Here the span between the host steps
(binning/preprocess before, postprocess/export after) executes as three
short device programs over one ``jax.sharding.Mesh``:

1. **time->frequency DFT, trace-parallel**: the (iline, xline, twt) cube is
   sharded over ilines; the matmul-DFT along time needs no communication.
   The frequency filter window and the slice-major transpose happen in the
   same program; XLA inserts the ICI ``all_to_all`` at the output-sharding
   boundary (frequency-sharded) instead of a host/disk transpose.
2. **POCS, slice-parallel**: the standard sharded solver
   (parallel/solver.pocs_interpolate_sharded) over the frequency axis.
3. **frequency->time inverse DFT, trace-parallel**: the mirror of (1) with
   the ``all_to_all`` on the way in.

The whole span keeps the cube in device memory — nothing touches the host
between the upload of the time cube and the download of the reconstruction.
For cubes larger than mesh HBM use the out-of-core checkpointed driver
(pipeline/pocs.interpolate_checkpointed) instead; this driver is the
pod-resident fast path and the multi-chip parity gate
(tests/test_stage2_sharded.py, __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import numpy as np

from ..io.ncio import Cube, read_cube, write_cube
from ..models.pocs import POCSConfig
from ..ops import spectral
from ..ops.cplx import Cplx
from ..parallel import mesh as mesh_lib
from ..utils.logging import xprint


def interpolate_time_cube_sharded(
    cube: Cube | str,
    config: POCSConfig,
    mesh=None,
    var: str | None = None,
    real: bool = True,
    upsample: int = 1,
    filter_type: str | None = None,
    filter_freqs=None,
    drop_filtered: bool = False,
    envelope_clip: bool = False,
    rescale_minmax: tuple[float, float] | None = None,
    transform_kwargs: dict | None = None,
    out_path: str | None = None,
    verbose: int = 0,
) -> Cube:
    """Run steps 12-14 (FFT, POCS, IFFT) device-resident over ``mesh``.

    Equivalent to ``apply_ifft(interpolate(apply_fft(cube)))`` (same ops,
    same scaling, same solver) but sharded end to end: tolerance-equality
    against the single-device chain is asserted by
    tests/test_stage2_sharded.py. Returns a time-domain cube with the
    interpolated variable named like the input ``var`` (as apply_ifft
    names it) plus ``fold``; postprocess/export consume it directly.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.solver import pocs_interpolate_sharded
    from ..utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    if isinstance(cube, str):
        cube = read_cube(cube)
    if var is None:
        var = cube.primary_var()
    dims, data = cube.data_vars[var]
    if dims[-1] != "twt":
        raise ValueError(f"{var} must have twt as its last axis, has {dims}")
    if "fold" not in cube.data_vars:
        raise ValueError("cube needs a 'fold' variable to derive the sampling mask")
    twt = np.asarray(cube.coords["twt"], np.float64)
    data = np.asarray(data, np.float32)
    fold = np.asarray(cube.data_vars["fold"][1])
    mask = (fold > 0).astype(np.float32)

    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    # same driver-level production precision defaults as pipeline.pocs
    from .pocs import _production_transform

    transform, _ = _production_transform(config, transform_kwargs or {})

    # same pad_to_tile policy as the single-device cube drivers (explicit
    # or measured-auto): an observed-zero frame of zero TIME traces with
    # mask 1 — a zero trace transforms to zero in every frequency slice,
    # so the POCS problem is exactly the frequency-domain frame
    # pad_slices_to_tile builds, and both chains stay tolerance-equal
    from ..utils.pad import auto_pad_to_tile, next_multiple

    il0, xl0 = data.shape[0], data.shape[1]
    if auto_pad_to_tile(config, il0, xl0, transform):
        il_t, xl_t = next_multiple(il0, 128), next_multiple(xl0, 128)
        data = np.pad(data, ((0, il_t - il0), (0, xl_t - xl0), (0, 0)))
        mask = np.pad(mask, ((0, il_t - il0), (0, xl_t - xl0)),
                      constant_values=1.0)

    # ---- host-side spectral bookkeeping (mirrors ops/spectral exactly) ----
    n = data.shape[-1]
    if n % 2 != 0:
        n -= 1
        twt = twt[:n]
    nfft = int(upsample) * n
    dt = float(np.mean(np.diff(twt)))
    t0 = float(twt[0])
    freqs_full = (np.fft.rfftfreq(nfft, dt) if real else np.fft.fftfreq(nfft, dt))
    if filter_type is not None:
        if filter_freqs is None:
            raise ValueError("filter frequencies must be specified")
        window = spectral.freq_filter_window(freqs_full, list(filter_freqs),
                                             filter_type)
        if drop_filtered:
            # exact apply_freq_filter semantics: contiguous lowpass passband
            if filter_type != "lowpass":
                raise ValueError("drop_filtered only supported for lowpass filters")
            if not real:
                raise ValueError("drop_filtered requires the rfft layout (real=True)")
            f_kept = int(np.count_nonzero(freqs_full <= max(filter_freqs)))
        else:
            f_kept = len(freqs_full)
    else:
        window, f_kept = None, len(freqs_full)
    freqs = freqs_full[:f_kept]  # dropped bins are a contiguous tail
    f_pad = mesh_lib.pad_to_multiple(f_kept, n_dev)  # zero slices short-circuit
    # trace-parallel stages shard the iline axis, which real grids rarely
    # size to a device multiple: pad with zero ilines host-side for the DFT
    # (zeros transform to zeros) and crop them in-program right after the
    # all_to_all — the POCS problem the solver sees is exactly the unpadded
    # one, so numerics match the single-device chain bit-for-bit in layout
    il = data.shape[0]
    il_pad = mesh_lib.pad_to_multiple(il, n_dev)
    if il_pad != il:
        data = np.concatenate(
            [data, np.zeros((il_pad - il,) + data.shape[1:], data.dtype)])

    il_sharded = NamedSharding(mesh, P(axis, None, None))
    f_sharded = NamedSharding(mesh, P(axis, None, None))

    # ---- program 1: trace-parallel forward DFT + reshard to slice-major ----
    def _fwd(x):
        spec = spectral.forward_fft(x[..., :n], twt, real=real,
                                    upsample=upsample)
        z = spec.data
        if window is not None:
            w = jnp.asarray(window, jnp.float32)
            z = Cplx(z.re * w, z.im * w)
        zre, zim = z.re[..., :f_kept], z.im[..., :f_kept]
        zre = jnp.moveaxis(zre, -1, 0)  # (F, il_pad, xl): slice-major
        zim = jnp.moveaxis(zim, -1, 0)
        pad = [(0, f_pad - f_kept), (0, 0), (0, 0)]
        # crop the iline zero-pad AFTER the layout change (local there)
        return (jnp.pad(zre, pad)[:, :il, :], jnp.pad(zim, pad)[:, :il, :])

    fwd = jax.jit(_fwd, in_shardings=il_sharded,
                  out_shardings=(f_sharded, f_sharded))

    # ---- program 3: reshard back + trace-parallel inverse DFT --------------
    def _inv(zre, zim):
        z = Cplx(jnp.moveaxis(zre[:f_kept], 0, -1),
                 jnp.moveaxis(zim[:f_kept], 0, -1))  # (il, xl, F)
        spec = spectral.Spectrum(z, freqs, nfft, n, t0, dt, real)
        _, x = spectral.inverse_fft_original(spec)
        if envelope_clip:
            x = jnp.clip(x, 0.0, None)
        if rescale_minmax is not None:
            from ..utils.rescale import rescale

            x = rescale(x, rescale_minmax[0], rescale_minmax[1])
        # re-pad ilines so the trace-parallel output sharding divides evenly
        return jnp.pad(x, [(0, il_pad - il), (0, 0), (0, 0)])

    inv = jax.jit(_inv, in_shardings=(f_sharded, f_sharded),
                  out_shardings=il_sharded)

    xprint(
        f"stage2 sharded: {data.shape} cube -> {f_kept} freq slices "
        f"(pad {f_pad}) over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
        f"{config.transform_kind}/{config.version}, niter={config.niter}",
        kind="info", verbosity=verbose)

    x_dev = jax.device_put(jnp.asarray(data), il_sharded)
    zre, zim = fwd(x_dev)
    res = pocs_interpolate_sharded(Cplx(zre, zim), mask, mesh=mesh,
                                   transform=transform, config=config)
    x_rec = inv(res.data.re, res.data.im)
    x_host = np.asarray(x_rec)[:il0, :xl0]  # crop tile frame + shard pad
    n_iters = np.asarray(res.n_iterations)[:f_kept]
    cost = np.asarray(res.cost)[:f_kept]

    coords = {k: v for k, v in cube.coords.items() if k != "twt"}
    coords["twt"] = twt
    out = Cube(
        coords=coords,
        data_vars={var: (dims[:-1] + ("twt",), x_host.astype(np.float32)),
                   "fold": cube.data_vars["fold"]},
        attrs=dict(cube.attrs),
        coord_attrs={"twt": {"units": "s", "long_name": "two-way traveltime"}},
    )
    out.append_history(
        f"FFT({var})"
        + (f" {filter_type.upper()} {filter_freqs}" if filter_type else "")
        + f";POCS({config.transform_kind},{config.version},"
        f"niter={config.niter},sharded-e2e);IFFT")
    out.attrs["pocs_mean_iterations"] = float(n_iters.mean())
    out.attrs["pocs_mean_cost"] = float(cost.mean())
    if out_path:
        write_cube(out_path, out)
    return out
