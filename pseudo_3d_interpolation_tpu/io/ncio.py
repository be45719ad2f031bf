"""netCDF4-compatible cube storage over h5py.

replaces: the xarray/h5netcdf/netCDF4 stack the reference uses for every
3D-stage artifact (none of which are dependencies here). Files are written
as HDF5 with proper dimension scales + attributes, so they open unchanged
in xarray/netCDF4 elsewhere; complex variables are stored split as
``<var>.real`` / ``<var>.imag`` float32 pairs exactly like the reference
(cube_POCS_interpolation_3D.py:160-164, cube_apply_IFFT.py:73-79) and are
transparently re-combined on read.

The in-memory container is a minimal xarray.Dataset stand-in
(:class:`Cube`): named dims with coordinate arrays, named data variables
over those dims, and attribute dicts — just enough surface for the pipeline
steps (sel/isel-style indexing is done with plain numpy slicing by the
callers).
"""

from __future__ import annotations

import dataclasses
import datetime
from typing import Any

import h5py
import numpy as np

# data_vars names that are auxiliary layers, never the solve/export target
AUX_VARS = ("fold", "amp_ref", "mask")


def primary_var_name(data_vars) -> str:
    """First non-auxiliary variable name of a Cube/CubeFile data_vars
    mapping; raises a descriptive error instead of StopIteration when the
    cube holds only fold/amp_ref/mask layers."""
    var = next((v for v in data_vars if v not in AUX_VARS), None)
    if var is None:
        raise ValueError(
            "cube has no data variable besides fold/amp_ref/mask "
            f"(variables: {sorted(data_vars)})")
    return var


@dataclasses.dataclass
class Cube:
    """Minimal dataset: coords (1D arrays by dim name), data_vars
    (dim-tuple + array), attrs (global + per-variable/coord)."""

    coords: dict[str, np.ndarray]
    data_vars: dict[str, tuple[tuple[str, ...], np.ndarray]]
    attrs: dict[str, Any] = dataclasses.field(default_factory=dict)
    var_attrs: dict[str, dict] = dataclasses.field(default_factory=dict)
    coord_attrs: dict[str, dict] = dataclasses.field(default_factory=dict)

    def dims_of(self, var: str) -> tuple[str, ...]:
        return self.data_vars[var][0]

    def __getitem__(self, var: str) -> np.ndarray:
        return self.data_vars[var][1]

    def sizes(self) -> dict[str, int]:
        return {d: len(c) for d, c in self.coords.items()}

    def set_var(self, name: str, dims: tuple[str, ...], data: np.ndarray, attrs: dict | None = None):
        for d, s in zip(dims, data.shape):
            if d in self.coords and len(self.coords[d]) != s:
                raise ValueError(f"dim {d}: size {s} != coord length {len(self.coords[d])}")
        self.data_vars[name] = (tuple(dims), data)
        if attrs:
            self.var_attrs[name] = dict(attrs)

    def append_history(self, entry: str):
        """Accumulate processing history like the reference's netCDF attrs
        (e.g. cube_apply_FFT.py:296-306)."""
        today = datetime.date.today().isoformat()
        self.attrs["history"] = self.attrs.get("history", "") + f"{entry};"
        self.attrs["text"] = self.attrs.get("text", "") + f"\n{today}: {entry}"

    def primary_var(self) -> str:
        """Name of the primary data variable (first one that is not an
        auxiliary fold/amp_ref/mask layer); raises if none exists."""
        return primary_var_name(self.data_vars)


def _sanitize_attr(v):
    if isinstance(v, (np.ndarray, list, tuple, str, bytes, int, float, np.integer, np.floating)):
        return v
    return str(v)


def _pack(data: np.ndarray, enc: dict):
    """CF-convention packing: stored = rint((x - add_offset)/scale_factor)
    as the encoding dtype; NaN -> _FillValue. Returns (stored, cf_attrs)."""
    dtype = np.dtype(enc.get("dtype", data.dtype))
    scale = float(enc.get("scale_factor", 1.0))
    offset = float(enc.get("add_offset", 0.0))
    fill = enc.get("_FillValue")
    if dtype.kind in "iu":
        stored = np.rint((np.asarray(data, np.float64) - offset) / scale)
        info = np.iinfo(dtype)
        stored = np.clip(stored, info.min, info.max)
        if fill is not None:
            stored = np.where(np.isnan(data), float(fill), stored)
        stored = stored.astype(dtype)
    else:
        stored = np.asarray(data, dtype)
    cf = {}
    if scale != 1.0:
        cf["scale_factor"] = scale
    if offset != 0.0:
        cf["add_offset"] = offset
    if fill is not None:
        cf["_FillValue"] = np.asarray(fill, dtype)
    return stored, cf


def write_cube(path: str, cube: Cube, compress: bool | str = False,
               chunks: dict | None = None, encodings: dict | None = None):
    """Write a :class:`Cube` as a netCDF4-flavored HDF5 file.

    ``chunks`` maps dim name -> chunk length (e.g. ``{"freq_twt": 1}`` to
    mirror the reference's slice-major layout choice). ``encodings`` maps
    var name -> {dtype, scale_factor, add_offset, _FillValue} for
    CF-convention packed integer storage — the reference's YAML
    ``encodings`` family (cube_binning_3D.py:1476-1483); :func:`read_cube`
    unpacks transparently.
    """
    kw = {}
    if compress:
        kw["compression"] = "gzip" if compress is True else compress
        kw["compression_opts"] = 1 if kw["compression"] == "gzip" else None
    encodings = encodings or {}

    with h5py.File(path, "w") as f:
        for dim, coord in cube.coords.items():
            dset = f.create_dataset(dim, data=np.asarray(coord))
            dset.make_scale(dim)
            for k, v in cube.coord_attrs.get(dim, {}).items():
                dset.attrs[k] = _sanitize_attr(v)

        def _write_var(name, dims, data, attrs_name=None, cf_attrs=None):
            ck = None
            if chunks:
                ck = tuple(
                    min(chunks.get(d, s), s) for d, s in zip(dims, data.shape)
                )
            d = f.create_dataset(name, data=data, chunks=ck, **kw)
            for i, dim in enumerate(dims):
                d.dims[i].attach_scale(f[dim])
            d.attrs["_dims"] = [s.encode() for s in dims]
            for k, v in cube.var_attrs.get(attrs_name or name, {}).items():
                d.attrs[k] = _sanitize_attr(v)
            for k, v in (cf_attrs or {}).items():
                d.attrs[k] = v

        for name, (dims, data) in cube.data_vars.items():
            data = np.asarray(data)
            if np.iscomplexobj(data):
                # attrs of the logical complex variable ride on both halves
                _write_var(f"{name}.real", dims, data.real.astype(np.float32), attrs_name=name)
                _write_var(f"{name}.imag", dims, data.imag.astype(np.float32), attrs_name=name)
            elif name in encodings:
                stored, cf = _pack(data, encodings[name])
                _write_var(name, dims, stored, cf_attrs=cf)
            else:
                _write_var(name, dims, data)

        for k, v in cube.attrs.items():
            f.attrs[k] = _sanitize_attr(v)


def read_cube(path: str, combine_complex: bool = True, variables=None) -> Cube:
    """Read a cube file written by :func:`write_cube` (or compatible
    netCDF4/h5netcdf output). Split complex pairs re-combine by default."""
    with h5py.File(path, "r") as f:
        def _s(v):
            return v.decode() if isinstance(v, bytes) else v

        dim_names = [
            k for k in f.keys() if _s(f[k].attrs.get("CLASS", "")) == "DIMENSION_SCALE"
        ]
        coords = {k: f[k][()] for k in dim_names}
        coord_attrs = {
            k: {a: v for a, v in f[k].attrs.items() if not a.startswith(("CLASS", "NAME", "REFERENCE_LIST"))}
            for k in dim_names
        }
        data_vars = {}
        var_attrs = {}
        for k in f.keys():
            if k in dim_names:
                continue
            if variables is not None and k.split(".")[0] not in variables and k not in variables:
                continue
            dims = tuple(_s(s) for s in f[k].attrs.get("_dims", []))
            if not dims:
                dims = tuple(
                    (d.keys()[0] if len(d.keys()) else f"dim_{i}") for i, d in enumerate(f[k].dims)
                )
            raw = f[k][()]
            attrs_k = {
                a: v for a, v in f[k].attrs.items()
                if not a.startswith(("DIMENSION_LIST", "_dims"))
            }
            # CF-convention unpacking (scale_factor/add_offset/_FillValue).
            # A fill-only encoding (integer dtype, default scale/offset)
            # must ALSO unpack, or NaN cells come back as literal fill
            # values in the data
            if ("scale_factor" in attrs_k or "add_offset" in attrs_k
                    or ("_FillValue" in attrs_k and raw.dtype.kind in "iu")):
                scale = float(attrs_k.pop("scale_factor", 1.0))
                offset = float(attrs_k.pop("add_offset", 0.0))
                fill = attrs_k.pop("_FillValue", None)
                # unpack in float64 like xarray/netCDF4: an int32-packed
                # value times a float32 scale would lose precision the
                # packing guaranteed; cast down only at the very end, and
                # keep float64 for int32-packed data (f32 can't hold 2^31
                # distinct levels)
                unpacked = raw.astype(np.float64) * scale + offset
                if fill is not None:
                    unpacked = np.where(raw == fill, np.nan, unpacked)
                out_dt = (np.float64 if raw.dtype.itemsize >= 4
                          and raw.dtype.kind in "iu" else np.float32)
                raw = unpacked.astype(out_dt)
            data_vars[k] = (dims, raw)
            var_attrs[k] = attrs_k
        attrs = dict(f.attrs)

    if combine_complex:
        for k in list(data_vars):
            if k.endswith(".real") and k[:-5] + ".imag" in data_vars:
                base = k[:-5]
                dims, re = data_vars.pop(k)
                _, im = data_vars.pop(base + ".imag")
                data_vars[base] = (dims, re.astype(np.complex64) + 1j * im.astype(np.complex64))
                var_attrs[base] = var_attrs.pop(k, {})
                var_attrs.pop(base + ".imag", None)

    return Cube(coords=coords, data_vars=data_vars, attrs=attrs,
                var_attrs=var_attrs, coord_attrs=coord_attrs)


class CubeFile:
    """Lazy cube reader: metadata up-front, data slabs on demand.

    The out-of-core counterpart of :func:`read_cube` — the reference keeps
    its stage-2 cubes dask-chunked end to end
    (cube_POCS_interpolation_3D.py:231-234); here the pipeline steps stream
    (start, stop) slabs along a chosen dim through the device instead of
    materializing survey-scale cubes in RAM. Split complex pairs recombine
    per slab. Use as a context manager.
    """

    def __init__(self, path: str):
        self._f = h5py.File(path, "r")
        f = self._f

        def _s(v):
            return v.decode() if isinstance(v, bytes) else v

        self.dim_names = [
            k for k in f.keys() if _s(f[k].attrs.get("CLASS", "")) == "DIMENSION_SCALE"
        ]
        self.coords = {k: f[k][()] for k in self.dim_names}
        self.coord_attrs = {
            k: {a: v for a, v in f[k].attrs.items()
                if not a.startswith(("CLASS", "NAME", "REFERENCE_LIST"))}
            for k in self.dim_names
        }
        self.attrs = dict(f.attrs)
        self._dims = {}
        self.var_attrs = {}
        complex_halves = set()
        for k in f.keys():
            if k in self.dim_names:
                continue
            dims = tuple(_s(s) for s in f[k].attrs.get("_dims", []))
            self._dims[k] = dims
            attrs_k = {
                a: v for a, v in f[k].attrs.items()
                if not a.startswith(("DIMENSION_LIST", "_dims"))
            }
            # this reader hands out UNPACKED floats (see _unpack), so the
            # public attrs must not carry the CF packing keys — a pipeline
            # step that copies them onto its (float) output variable would
            # make read_cube re-apply the scale to already-unpacked data
            # (measured: 1000x amplitude corruption through the streaming
            # POCS driver). Same pop predicate as read_cube's; _unpack
            # reads the raw h5 attrs directly and is unaffected.
            if ("scale_factor" in attrs_k or "add_offset" in attrs_k
                    or ("_FillValue" in attrs_k
                        and f[k].dtype.kind in "iu")):
                attrs_k.pop("scale_factor", None)
                attrs_k.pop("add_offset", None)
                attrs_k.pop("_FillValue", None)
            self.var_attrs[k] = attrs_k
            if k.endswith(".real") and k[:-5] + ".imag" in f.keys():
                complex_halves.add(k[:-5])
        # logical variable table: complex pairs appear under their base name
        self.data_vars = {}
        for k, dims in self._dims.items():
            base = k[:-5] if k.endswith((".real", ".imag")) else k
            if base in complex_halves:
                self.data_vars[base] = dims
                self.var_attrs.setdefault(base, self.var_attrs.get(base + ".real", {}))
            else:
                self.data_vars[k] = dims
        self._complex = complex_halves

    def dims_of(self, var: str) -> tuple[str, ...]:
        return self.data_vars[var]

    def primary_var(self) -> str:
        """First non-auxiliary variable (same contract as Cube's)."""
        return primary_var_name(self.data_vars)

    def sizes(self) -> dict[str, int]:
        return {d: len(c) for d, c in self.coords.items()}

    def is_complex(self, var: str) -> bool:
        return var in self._complex

    def _unpack(self, name: str, raw: np.ndarray) -> np.ndarray:
        """CF-convention unpacking, mirroring :func:`read_cube` — the
        streaming reader must not hand packed integers (or literal fill
        values) to callers that read_cube would hand floats/NaN (e.g. the
        POCS driver's ``fold`` mask, pipeline/pocs.py)."""
        attrs = self._f[name].attrs
        has_scale = "scale_factor" in attrs or "add_offset" in attrs
        if not (has_scale
                or ("_FillValue" in attrs and raw.dtype.kind in "iu")):
            return raw
        scale = float(attrs.get("scale_factor", 1.0))
        offset = float(attrs.get("add_offset", 0.0))
        fill = attrs.get("_FillValue")
        unpacked = raw.astype(np.float64) * scale + offset
        if fill is not None:
            unpacked = np.where(raw == fill, np.nan, unpacked)
        out_dt = (np.float64 if raw.dtype.itemsize >= 4
                  and raw.dtype.kind in "iu" else np.float32)
        return unpacked.astype(out_dt)

    def read_slab(self, var: str, dim: str | None = None,
                  start: int = 0, stop: int | None = None) -> np.ndarray:
        """Read ``var`` restricted to ``[start:stop]`` along ``dim``."""
        dims = self.data_vars[var]
        sel = tuple(
            slice(start, stop) if (dim is not None and d == dim) else slice(None)
            for d in dims
        )
        if var in self._complex:
            re = self._f[var + ".real"][sel]
            im = self._f[var + ".imag"][sel]
            return re.astype(np.complex64) + 1j * im.astype(np.complex64)
        return self._unpack(var, self._f[var][sel])

    def read(self, var: str) -> np.ndarray:
        return self.read_slab(var)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CubeWriter:
    """Incremental cube writer: dims and datasets created up-front, data
    filled slab by slab, attributes finalized on close.

    The out-of-core counterpart of :func:`write_cube`; output files are
    byte-compatible with it. Complex dtypes store as ``.real``/``.imag``
    float32 halves like everywhere else.
    """

    def __init__(self, path: str, coords: dict, attrs: dict | None = None,
                 coord_attrs: dict | None = None):
        self._f = h5py.File(path, "w")
        self.coords = {k: np.asarray(v) for k, v in coords.items()}
        for dim, coord in self.coords.items():
            d = self._f.create_dataset(dim, data=coord)
            d.make_scale(dim)
            for k, v in (coord_attrs or {}).get(dim, {}).items():
                d.attrs[k] = _sanitize_attr(v)
        self._attrs = dict(attrs or {})
        self._complex = set()

    def create_var(self, name: str, dims: tuple[str, ...], dtype,
                   chunks: dict | None = None, attrs: dict | None = None):
        shape = tuple(len(self.coords[d]) for d in dims)
        ck = None
        if chunks:
            ck = tuple(min(chunks.get(d, s), s) for d, s in zip(dims, shape))
        dtype = np.dtype(dtype)
        names = [name]
        if dtype.kind == "c":
            names = [name + ".real", name + ".imag"]
            dtype = np.float32
            self._complex.add(name)
        for n in names:
            d = self._f.create_dataset(n, shape=shape, dtype=dtype, chunks=ck)
            for i, dim in enumerate(dims):
                d.dims[i].attach_scale(self._f[dim])
            d.attrs["_dims"] = [s.encode() for s in dims]
            for k, v in (attrs or {}).items():
                d.attrs[k] = _sanitize_attr(v)

    def write_slab(self, name: str, data: np.ndarray, dim: str | None = None,
                   start: int = 0):
        """Write ``data`` at offset ``start`` along ``dim`` (full extent on
        the other axes)."""
        target = self._f[name + ".real"] if name in self._complex else self._f[name]
        dims = tuple(s.decode() if isinstance(s, bytes) else s
                     for s in target.attrs["_dims"])
        sel = tuple(
            slice(start, start + n) if (dim is not None and d == dim) else slice(None)
            for d, n in zip(dims, data.shape)
        )
        if name in self._complex:
            data = np.asarray(data)
            self._f[name + ".real"][sel] = data.real.astype(np.float32)
            self._f[name + ".imag"][sel] = data.imag.astype(np.float32)
        else:
            self._f[name][sel] = data

    def set_attrs(self, **kw):
        self._attrs.update(kw)

    def close(self):
        for k, v in self._attrs.items():
            self._f.attrs[k] = _sanitize_attr(v)
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_attrs_config(path_or_dict):
    """Load the reference-format netCDF attrs/encodings YAML
    (cube_binning_3D.py:1476-1483; docs/3D/cube_binning_geometry.md:120-184).

    Returns (attrs_time, attrs_freq, encodings, var_aux) dicts — any family
    may be absent. ``attrs_time`` keys are variable/coordinate names;
    ``attrs_freq`` uses the reference's ``data``/``new_dim`` placeholders
    for the spectral variable and frequency coordinate.
    """
    if isinstance(path_or_dict, dict):
        cfg = dict(path_or_dict)
    else:
        import yaml

        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f) or {}
    return (cfg.get("attrs_time", {}) or {}, cfg.get("attrs_freq", {}) or {},
            cfg.get("encodings", {}) or {}, cfg.get("var_aux", []) or [])


def apply_attrs(cube: "Cube", attrs: dict) -> None:
    """Merge a per-variable/coordinate attrs mapping into a cube in place;
    the special key ``cube`` carries global attributes."""
    for name, a in attrs.items():
        if name == "cube":
            for k, v in a.items():
                if k == "history":
                    continue  # history accumulates through append_history
                cube.attrs[k] = v
        elif name in cube.data_vars:
            cube.var_attrs.setdefault(name, {}).update(a)
        elif name in cube.coords:
            cube.coord_attrs.setdefault(name, {}).update(a)


def apply_time_attrs(cube: "Cube", attrs_config) -> None:
    """Apply the ``attrs_time`` family of a reference-format attrs YAML
    (path or dict) to a time-domain cube — the shared post-step pattern of
    the preprocess/ifft pipeline steps."""
    attrs_time, _, _, _ = load_attrs_config(attrs_config)
    apply_attrs(cube, attrs_time)
