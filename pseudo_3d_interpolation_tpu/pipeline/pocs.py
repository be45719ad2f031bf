"""Step 13 — POCS interpolation of every frequency (or time) slice.

replaces: pseudo_3D_interpolation/cube_POCS_interpolation_3D.py. The
reference ships each 2D slice to a dask worker; here the slice axis is
batched on device and sharded over the jax mesh
(parallel/solver.interpolate_cube) — zero inter-chip communication in the
solver. Per-slice telemetry (effective iterations, final cost) comes back
as arrays and is written as one CSV, replacing the per-batch ``.out`` file
appends + merge (reference POCS.py:649-651, driver :388-390).

YAML parameter compatibility: the ``metadata`` keys of the reference's POCS
config (niter, thresh_op, thresh_model, eps, alpha, p_max, p_min,
sqrt_decay, decay_kind, version, transform_kind) map 1:1 onto POCSConfig;
dask cluster keys (n_workers etc.) are accepted and ignored with a note.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import yaml

from ..io.ncio import Cube, read_cube, write_cube
from ..models.pocs import POCSConfig
from ..parallel.solver import interpolate_cube
from ..utils.logging import xprint

_DASK_KEYS = ("n_workers", "processes", "threads_per_worker", "memory_limit", "batch_chunk")

# transform-constructor keys recognized in the POCS YAML's extra section —
# ONE list (owned by models/transforms.py, which also validates get_transform
# kwargs against it) shared by every entry point: a per-site copy silently
# drops later additions at the sites that miss the update
from ..models.transforms import TRANSFORM_OPTION_KEYS as _TRANSFORM_KEYS


def _transform_kwargs(extra: dict) -> dict:
    return {k: extra[k] for k in _TRANSFORM_KEYS if k in extra}


# Production default precision per basis for the CUBE DRIVERS (applied only
# for options the user leaves unset). Measured cube-level SNR on the
# north-star 512x512x1024 cube (docs/perf.md round 4b + addendum): HIGH
# (bf16x3) is SNR-neutral for FFT (45.037 vs 45.038 dB) and SHEARLET
# (41.6 vs 41.4 dB) at ~1.5x the HIGHEST rate. CURVELET at uniform HIGH
# measured a real 0.5 dB drop (37.8 vs 38.3 dB) — and the follow-up
# isolation run showed ALL of it lives in the support-cropped box-group
# stages: HIGH full-size bands + HIGHEST boxes reads the full 38.3 dB at
# the HIGH rate, so THAT mix is curvelet's production default. WAVELET
# measured SNR-neutral AND rate-neutral at north-star scale (27.1 dB /
# ~1165 slice-iters/s for both HIGH and HIGHEST, docs/perf.md round 5) —
# HIGH keeps it consistent with the rest of the family and ahead of any
# future compute-bound batch shape. Explicit YAML/CLI options override
# per key.
_PRODUCTION_PRECISION = {
    "FFT": {"precision": "high"},
    "DCT": {"precision": "high"},
    "WAVELET": {"precision": "high"},
    "SHEARLET": {"precision": "high"},
    "CURVELET": {"precision": "high", "box_precision": "highest"},
}


def _production_transform(config: POCSConfig, extra: dict):
    """Build the solve transform with driver-level precision defaults.

    The defaults apply ONLY when the user left ``precision`` unset: an
    explicit uniform ``precision:`` request (e.g. to reproduce a uniform-
    precision measurement) must not get ``box_precision`` silently
    injected on top — set both keys to mix precisions deliberately.
    """
    kw = _transform_kwargs(extra)
    # the decimated curvelet variant is exactly the support-cropped stage
    # class where uniform HIGH measured a real 0.5 dB cube-SNR loss
    # (round 4b) — keep its own f32-HIGHEST default rather than injecting
    # the stacked-frame mix
    if "precision" not in kw and not kw.get("decimated"):
        for key, val in _PRODUCTION_PRECISION.get(config.transform_kind,
                                                  {}).items():
            kw.setdefault(key, val)
    from ..models.transforms import get_transform as _gt

    return _gt(config.transform_kind, **kw), kw


def _transform_subbands(transform, slice_shape, config=None) -> int:
    """Per-batch working-set expansion factor of a transform: how many
    (H, W)-slice-sized buffers one input slice costs during an iteration.

    FFT/DCT and the same-total-size DWT pyramid: 1. Directional frames
    with a streamed ``apply_threshold`` (SHEARLET/CURVELET since round 3)
    never materialize the (B, L, H, W) stack — their working set is a
    constant few full-size buffers (spectrum, accumulator, one subband in
    flight, the small-group stacks), NOT L-proportional; budgeting L
    (~50-61) here would permanently disable the device-resident driver
    for directional production runs. A multiscale transform WITHOUT the
    streamed update takes the generic forward/threshold/inverse branch
    and really does cost L slices."""
    kind = getattr(transform, "kind", "FFT")
    h, w = int(slice_shape[-2]), int(slice_shape[-1])
    # the constant budget needs BOTH streamed pieces: apply_threshold for
    # the iteration AND decay_from_input for the schedule derivation —
    # without the latter, models/pocs.py materializes the full (B, L, H, W)
    # forward once (coeffs0) and the peak really is L-proportional.
    # decay_from_input itself FALLS BACK to the full forward for
    # data-driven / non-'values' decay configs (_needs_full_forward), so
    # the gate must look at the config, not just hasattr
    streamed_decay = True
    if config is not None:
        from ..models.transforms import _SpectralStackMixin

        streamed_decay = not _SpectralStackMixin._needs_full_forward(
            config.thresh_model, config.decay_kind)
    if (kind in ("SHEARLET", "CURVELET")
            and hasattr(transform, "apply_threshold")
            and hasattr(transform, "decay_from_input")
            and streamed_decay):
        return 8
    if kind == "SHEARLET":
        from ..ops import shearlet as sh

        return sh.n_subbands(transform.n_scales or sh.default_scales(h, w))
    if kind == "CURVELET":
        from ..ops import curvelet as cv

        return cv.n_subbands(transform.nbscales or cv.default_nbscales(h, w),
                             transform.nbangles_coarse,
                             transform.allcurvelets)
    return 1


def config_from_yaml(path_or_dict) -> tuple[POCSConfig, dict]:
    """Load a reference-style POCS parameter YAML into a POCSConfig."""
    if isinstance(path_or_dict, (str, os.PathLike)):
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = dict(path_or_dict)
    meta = dict(cfg.get("metadata", cfg))
    ignored = {k: cfg[k] for k in _DASK_KEYS if k in cfg}
    if ignored:
        xprint(f"ignoring dask cluster keys (mesh-sharded instead): {sorted(ignored)}",
               kind="debug")
    fields = {f.name for f in POCSConfig.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in meta.items() if k in fields}
    extra = {k: v for k, v in meta.items() if k not in fields}
    # fail loudly on unrecognized keys: every entry point filters `extra`
    # through _transform_kwargs, so a typo like 'nscales' (for n_scales)
    # would otherwise be silently dropped and the solver would run with
    # default quality levers. Tolerated non-transform keys are the
    # reference YAML's own schema (docs/3D/3D_cube_interpolation.md:126-173)
    tolerated = set(_TRANSFORM_KEYS) | set(_DASK_KEYS) | {
        "dim", "var", "apply_filter", "output_runtime_results", "verbose"}
    unknown = set(extra) - tolerated
    if unknown:
        raise ValueError(
            f"unrecognized POCS YAML option(s) {sorted(unknown)}; "
            f"recognized non-POCSConfig keys: {sorted(tolerated)}")
    return POCSConfig(**kwargs), extra


def interpolate_checkpointed(
    cube: Cube | str,
    config: POCSConfig | str | dict,
    checkpoint_dir: str,
    var: str | None = None,
    mesh=None,
    batch: int = 64,
    out_path: str | None = None,
    runtime_csv: str | None = None,
    verbose: int = 0,
) -> Cube | str:
    """Batch-file checkpointed interpolation — out-of-core, with resume.

    Each batch of slices writes ``slices_<start>_<stop>.nc`` into
    ``checkpoint_dir`` as soon as it completes; re-running skips finished
    batches. This formalizes the reference's de-facto crash recovery
    (per-batch netCDFs named by frequency range + manual re-runs;
    cube_POCS_interpolation_3D.py:146-157, 369-405, SURVEY.md §5.4).

    Out-of-core contract: pass the input as a *path* and set ``out_path``
    — slices then stream HDF5 -> device -> HDF5 in ``batch``-sized slabs
    and the full cube is NEVER materialized in host RAM (peak usage is
    one batch plus the 2D fold/mask; mirrors the reference's dask-chunked
    stage 2, cube_POCS_interpolation_3D.py:231-234). The return value is
    ``out_path``. Passing an in-RAM :class:`Cube` keeps the convenience
    behavior of returning an assembled Cube.
    """
    from ..parallel.solver import interpolate_cube as _interpolate_cube
    from ..parallel import mesh as mesh_lib
    from ..io.ncio import CubeFile, CubeWriter
    from ..utils.compcache import enable_persistent_cache

    enable_persistent_cache()

    extra = {}
    if not isinstance(config, POCSConfig):
        config, extra = config_from_yaml(config)

    src = CubeFile(cube) if isinstance(cube, str) else cube
    streaming = isinstance(cube, str)
    if streaming and not out_path:
        raise ValueError("out-of-core mode (path input) requires out_path")
    try:
        if var is None:
            var = src.primary_var()
        if streaming:
            dims = src.dims_of(var)
            is_complex = src.is_complex(var)
            fold = np.asarray(src.read("fold"))
        else:
            dims, data = src.data_vars[var]
            is_complex = np.iscomplexobj(data)
            fold = np.asarray(src.data_vars["fold"][1])
        mask = (fold > 0).astype(np.float32)
        slice_dim = dims[-1]
        coords = {d: np.asarray(src.coords[d]) for d in src.coords}
        f_total = len(coords[slice_dim])

        os.makedirs(checkpoint_dir, exist_ok=True)
        if mesh is None:
            mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        batch = mesh_lib.pad_to_multiple(min(batch, f_total), n_dev)
        transform, transform_kwargs = _production_transform(config, extra)

        # refuse to resume against checkpoints from a DIFFERENT run:
        # filename-only reuse would silently merge results solved with the
        # old config/transform into the new output cube
        import dataclasses as _dc
        import json as _json

        fingerprint = {
            "config": _dc.asdict(config),
            "transform_kwargs": transform_kwargs,
            "var": var,
            "f_total": int(f_total),
            "slice_shape": [int(len(coords[d])) for d in dims[:-1]],
        }
        meta_path = os.path.join(checkpoint_dir, "checkpoint_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                prior = _json.load(fh)
            if prior != fingerprint:
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} holds checkpoints "
                    f"from a different run (config/transform/var/shape "
                    f"changed) — clear it or pick another directory. "
                    f"Prior: {prior}")
        else:
            with open(meta_path, "w") as fh:
                _json.dump(fingerprint, fh)

        # solver-path observability (same contract as interpolate())
        from ..models.pocs import describe_route, solver_route
        from ..utils.pad import auto_pad_to_tile as _apt
        from ..utils.pad import next_multiple as _nm

        h_b, w_b = (int(s) for s in fingerprint["slice_shape"])
        if _apt(config, h_b, w_b, transform):
            h_b, w_b = _nm(h_b, 128), _nm(w_b, 128)
        rt = solver_route((batch, h_b, w_b), (h_b, w_b), config, transform)
        xprint(f"solver path: {describe_route(rt)}",
               kind="info", verbosity=verbose)

        n_iters = np.zeros(f_total, np.int32)
        costs = np.zeros(f_total, np.float32)
        ck_paths = []

        for start in range(0, f_total, batch):
            stop = min(start + batch, f_total)
            ck = os.path.join(checkpoint_dir, f"slices_{start:05d}_{stop:05d}.nc")
            ck_paths.append((start, stop, ck))
            if os.path.exists(ck):
                part = read_cube(ck, variables=["niterations", "cost"])
                n_iters[start:stop] = part["niterations"]
                costs[start:stop] = part["cost"]
                xprint(f"resume: batch {start}-{stop} from checkpoint",
                       kind="info", verbosity=verbose)
                continue
            if streaming:
                slab = src.read_slab(var, dim=slice_dim, start=start, stop=stop)
            else:
                slab = np.asarray(src.data_vars[var][1][..., start:stop])
            moved = np.moveaxis(slab, -1, 0)
            nb = stop - start
            if nb < batch:
                # pad the tail slab to the full batch: the inner driver
                # derives its program shape from the chunk it receives, so
                # a short tail would compile a SECOND full XLA program
                # (minutes for directional bases) that the non-checkpointed
                # path never pays; zero slices short-circuit in the solver
                moved = np.concatenate(
                    [moved, np.zeros((batch - nb,) + moved.shape[1:],
                                     moved.dtype)])
            rec_c, n_c, c_c = _interpolate_cube(
                moved, mask, config, mesh=mesh, transform=transform,
                batch=batch,
            )
            rec_c, n_c, c_c = rec_c[:nb], n_c[:nb], c_c[:nb]
            n_iters[start:stop] = n_c
            costs[start:stop] = c_c
            part = Cube(
                coords={slice_dim: coords[slice_dim][start:stop]},
                data_vars={
                    "rec": ((slice_dim,) + dims[:-1], rec_c),
                    "niterations": ((slice_dim,), n_c),
                    "cost": ((slice_dim,), c_c),
                },
            )
            for d in dims[:-1]:
                part.coords[d] = coords[d]
            write_cube(ck, part)
            xprint(f"batch {start}-{stop} done -> {ck}", kind="info",
                   verbosity=verbose)

        if runtime_csv:
            pd.DataFrame({
                slice_dim: coords[slice_dim],
                "niterations": n_iters,
                "cost": costs,
            }).to_csv(runtime_csv, index=False)
        history = f"POCS({config.transform_kind},{config.version},checkpointed)"
        attrs = dict(src.attrs)
        import datetime as _dt

        attrs["history"] = attrs.get("history", "") + f"{history};"
        attrs["text"] = (attrs.get("text", "")
                         + f"\n{_dt.date.today().isoformat()}: {history}")
        attrs["pocs_mean_iterations"] = float(n_iters.mean())

        if streaming:
            # merge checkpoints -> output file slab by slab (never whole-cube)
            fold_dims = src.dims_of("fold")
            with CubeWriter(out_path, coords, attrs=attrs,
                            coord_attrs=dict(src.coord_attrs)) as w:
                w.create_var(f"{var}_interp", dims,
                             np.complex64 if is_complex else np.float32,
                             chunks={slice_dim: 1},
                             attrs=dict(src.var_attrs.get(var, {})))
                w.create_var("fold", fold_dims, fold.dtype)
                w.write_slab("fold", fold)
                for start, stop, ck in ck_paths:
                    part = read_cube(ck)
                    w.write_slab(f"{var}_interp",
                                 np.moveaxis(part["rec"], 0, -1),
                                 dim=slice_dim, start=start)
            return out_path
    finally:
        if streaming:
            src.close()

    # in-RAM convenience path: assemble and return a Cube
    rec = np.empty((f_total,) + tuple(len(coords[d]) for d in dims[:-1]),
                   np.complex64 if is_complex else np.float32)
    for start, stop, ck in ck_paths:
        rec[start:stop] = read_cube(ck)["rec"]
    out = Cube(
        coords=coords,
        data_vars={
            f"{var}_interp": (dims, np.moveaxis(rec, 0, -1)),
            "fold": src.data_vars["fold"],
        },
        attrs=attrs,
        var_attrs={f"{var}_interp": dict(src.var_attrs.get(var, {}))},
        coord_attrs=dict(src.coord_attrs),
    )
    if out_path:
        write_cube(out_path, out, chunks={slice_dim: 1})
    return out


def interpolate(
    cube: Cube | str,
    config: POCSConfig | str | dict = POCSConfig(
        niter=50, thresh_op="hard", thresh_model="exponential",
        # eps=0.0 (never stop): runs all niter — measured quality-safe at
        # cube scale (docs/perf.md round 4d; loose eps loses dB) — and the
        # only value eligible for the fused folded kernel (models/pocs.py
        # gate). Near-equivalent to the reference's 1e-16 (not bit-equal:
        # near-converged slices keep iterating under the decayed threshold).
        # use_pallas=True: the fused kernels are the measured production
        # path; the models/pocs.py gates fall back to XLA when unsupported
        p_min="adaptive", version="fast", alpha=0.75, eps=0.0,
        use_pallas=True,
    ),
    var: str | None = None,
    mesh=None,
    batch: int = 64,
    out_path: str | None = None,
    runtime_csv: str | None = None,
    profile_dir: str | None = None,
    verbose: int = 0,
) -> Cube:
    """Interpolate all slices of a cube. Mask derives from the fold
    (fold > 0 -> 1), reference driver :239-244.

    ``profile_dir`` wraps the solve in a ``jax.profiler`` trace — the
    analogue of the reference's dask ``performance_report`` HTML
    (cube_POCS_interpolation_3D.py:378-383); open with TensorBoard/XProf.
    """
    from ..utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    if isinstance(cube, str):
        cube = read_cube(cube)
    extra = {}
    if not isinstance(config, POCSConfig):
        config, extra = config_from_yaml(config)
    if var is None:
        var = cube.primary_var()
    dims, data = cube.data_vars[var]
    if "fold" not in cube.data_vars:
        raise ValueError("cube needs a 'fold' variable to derive the sampling mask")
    fold = np.asarray(cube.data_vars["fold"][1])
    mask = (fold > 0).astype(np.float32)

    # slice axis first: (il, xl, F) -> (F, il, xl)
    slice_dim = dims[-1]
    moved = np.moveaxis(np.asarray(data), -1, 0)

    transform, transform_kwargs = _production_transform(config, extra)
    xprint(
        f"POCS: {moved.shape[0]} slices of {moved.shape[1]}x{moved.shape[2]}, "
        f"{config.transform_kind}/{config.version}, niter={config.niter}",
        kind="info", verbosity=verbose,
    )
    import contextlib

    import jax as _jax

    prof = (_jax.profiler.trace(profile_dir) if profile_dir
            else contextlib.nullcontext())
    progress = (lambda done, total: xprint(f"  {done}/{total} slices",
                                           kind="debug", verbosity=verbose))
    # device-resident driver (one upload, short donated-buffer launches,
    # one download — the measured-fastest robust shape, docs/perf.md) when
    # the solve is single-device and cube + per-batch working set fit HBM;
    # a multiscale basis expands each batch slice into L subband
    # coefficients (~50-61 for SHEARLET/CURVELET), so the budget scales
    # the batch term by the subband count rather than assuming L == 1
    # budget against the shape the driver will ACTUALLY solve: with
    # pad_to_tile (explicit or auto-resolved) the drivers pad slices to
    # %128 sides before the solve
    h_b, w_b = moved.shape[-2], moved.shape[-1]
    from ..utils.pad import auto_pad_to_tile, next_multiple

    if auto_pad_to_tile(config, h_b, w_b, transform):
        h_b, w_b = next_multiple(h_b, 128), next_multiple(w_b, 128)
    expansion = _transform_subbands(transform, (h_b, w_b), config)
    resident_batch = min(batch, 32)  # the batch the driver will ACTUALLY use
    # budget in DEVICE bytes, not input bytes: the solver materializes an
    # (re, im) f32 pair (8 B/sample) whether the host array is complex64
    # or real float32 — moved.nbytes would under-budget real cubes 2x and
    # select the resident driver into an OOM
    slice_dev_bytes = h_b * w_b * 8
    batch_bytes = resident_batch * slice_dev_bytes * 4 * expansion
    resident = (mesh is None and _jax.device_count() == 1
                and moved.shape[0] * slice_dev_bytes * 4 + batch_bytes
                < 8 * 2**30)
    # name the solver path actually taken (and the first failed fused-
    # kernel gate on a fallback) — silent fallbacks have cost ~30% before
    # (round-4 eps incident); solver_route IS the dispatch decision, so
    # this line cannot drift from what runs (models/pocs.py)
    from ..models.pocs import describe_route, solver_route

    rt = solver_route((resident_batch, h_b, w_b), (h_b, w_b), config,
                      transform)
    pad_note = (" (pad_to_tile engaged)"
                if (h_b, w_b) != moved.shape[-2:] else "")
    xprint(f"solver path: {describe_route(rt)}{pad_note}",
           kind="info", verbosity=verbose)
    with prof:
        if resident:
            from ..parallel.solver import interpolate_cube_resident

            rec, n_iters, cost = interpolate_cube_resident(
                moved, mask, config, transform=transform,
                batch=resident_batch, progress=progress)
        else:
            rec, n_iters, cost = interpolate_cube(
                moved, mask, config, mesh=mesh, transform=transform,
                batch=batch, progress=progress)
    rec = np.moveaxis(rec, 0, -1)

    out = Cube(
        coords=dict(cube.coords),
        data_vars={
            f"{var}_interp": (dims, rec),
            "fold": cube.data_vars["fold"],
        },
        attrs=dict(cube.attrs),
        var_attrs={f"{var}_interp": dict(cube.var_attrs.get(var, {}))},
        coord_attrs=dict(cube.coord_attrs),
    )
    out.append_history(
        f"POCS({config.transform_kind},{config.version},niter={config.niter},"
        f"thresh={config.thresh_op}/{config.thresh_model})"
    )
    out.attrs["pocs_mean_iterations"] = float(n_iters.mean())
    out.attrs["pocs_mean_cost"] = float(cost.mean())

    if runtime_csv:
        pd.DataFrame({
            slice_dim: np.asarray(cube.coords[slice_dim]),
            "niterations": n_iters,
            "cost": cost,
        }).to_csv(runtime_csv, index=False)
    if out_path:
        write_cube(out_path, out, chunks={slice_dim: 1})
        # reproducibility: copy the exact solver parameters next to the
        # output — EVERY config field (a hardcoded key list silently
        # dropped later additions like use_pallas)
        import dataclasses as _dc

        with open(os.path.splitext(out_path)[0] + "_parameter.yml", "w") as f:
            yaml.safe_dump({"metadata": _dc.asdict(config)}, f)
    return out


def warmup(config, shape, batch: int = 64, mesh=None, verbose: int = 0,
           n_slices: int | None = None) -> float:
    """Pre-compile the production solve into the persistent compilation
    cache; returns the wall seconds spent.

    Cold-start mitigation (a fresh deployment's first directional-basis
    solve spends 1.5-3.5 min in XLA compilation — docs/perf.md): run
    ``p3d warmup`` once after install/config changes and the first real
    batch then starts at warm-start speed. Compiles the SAME programs the
    drivers dispatch — the device-resident single-chip driver and/or the
    mesh-sharded driver — so the cache keys match exactly. The resident
    driver's per-launch step() additionally keys on the FULL padded cube
    shape (its donated buffers are cube-sized): pass ``n_slices`` (the
    production cube's frequency-slice count; `p3d warmup --like` reads it
    from the cube) or the single-chip warm entry only covers toy cubes.

    The reference has no equivalent (dask workers re-import per run);
    cache-dir override via ``P3D_COMPILATION_CACHE``.
    """
    import time as _time

    import jax as _jax

    from ..parallel import mesh as mesh_lib
    from ..parallel.solver import interpolate_cube as _ic
    from ..parallel.solver import interpolate_cube_resident as _icr
    from ..utils.compcache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    extra = {}
    if not isinstance(config, POCSConfig):
        config, extra = config_from_yaml(config)
    transform, transform_kwargs = _production_transform(config, extra)

    h, w = int(shape[0]), int(shape[1])
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(h, w)) < 0.5).astype(np.float32)

    t0 = _time.perf_counter()
    # mirror interpolate()'s driver selection EXACTLY — resident only when
    # single-device AND the cube + batch working set fit the HBM budget;
    # otherwise the production run dispatches the host-chunked driver and
    # warming the resident one would compile the wrong program (and a
    # too-big cube would OOM right here)
    b_res = min(batch, 32)
    f_total = int(n_slices) if n_slices else b_res
    # mirror interpolate()'s budget: with pad_to_tile (explicit or auto)
    # the drivers solve the %128-padded shape (warmup passes the UNPADDED
    # production shape and the drivers pad internally, exactly like the
    # production run)
    h_b, w_b = h, w
    from ..utils.pad import auto_pad_to_tile as _apt, next_multiple as _nm

    if _apt(config, h, w, transform):
        h_b, w_b = _nm(h, 128), _nm(w, 128)
    slice_bytes = h_b * w_b * 8  # complex64 as an (re, im) f32 pair
    expansion = _transform_subbands(transform, (h_b, w_b), config)
    fits = (f_total * slice_bytes * 4
            + b_res * slice_bytes * 4 * expansion) < 8 * 2**30
    if mesh is None and _jax.device_count() == 1 and fits:
        # single-chip production runs auto-engage the device-resident
        # driver (interpolate() above); mirror its min(batch, 32) bucketing
        # AND the production cube's slice count (step()'s HLO keys on the
        # full padded cube shape), then execute exactly ONE launch — the
        # compile is the product, not the solve
        b = min(b_res, f_total)
        data = np.zeros((f_total, h, w), np.complex64)
        data[:b] = (rng.normal(size=(b, h, w)).astype(np.float32)
                    + 1j * rng.normal(size=(b, h, w)).astype(np.float32))
        _icr(data, mask, config, transform=transform,
             batch=b, _max_launches=1)
    else:
        if mesh is None:
            mesh = mesh_lib.make_mesh()
        # mirror interpolate_cube's own batch derivation (solver.py:
        # pad_to_multiple(min(batch, f_total), n_dev)) — an arbitrary cap
        # here (formerly 64) warms a different HLO shape than production
        # dispatches whenever batch > cap or the cube is shorter than it.
        # Without --slices the cube length is unknown; assume it exceeds
        # batch (the production-scale case).
        b = mesh_lib.pad_to_multiple(
            min(batch, int(n_slices)) if n_slices else batch,
            mesh.devices.size)
        data = (rng.normal(size=(b, h, w)).astype(np.float32)
                + 1j * rng.normal(size=(b, h, w)).astype(np.float32))
        _ic(data.astype(np.complex64), mask, config, mesh=mesh,
            transform=transform, batch=b)
    dt = _time.perf_counter() - t0
    xprint(
        f"warmup: {config.transform_kind}/{config.version} solve for "
        f"({b},{h},{w}) compiled+run in {dt:.1f}s (cache: {cache_dir})",
        kind="success", verbosity=verbose)
    return dt
