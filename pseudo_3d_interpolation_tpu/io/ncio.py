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


def _sanitize_attr(v):
    if isinstance(v, (np.ndarray, list, tuple, str, bytes, int, float, np.integer, np.floating)):
        return v
    return str(v)


def write_cube(path: str, cube: Cube, compress: bool | str = False, chunks: dict | None = None):
    """Write a :class:`Cube` as a netCDF4-flavored HDF5 file.

    ``chunks`` maps dim name -> chunk length (e.g. ``{"freq_twt": 1}`` to
    mirror the reference's slice-major layout choice).
    """
    kw = {}
    if compress:
        kw["compression"] = "gzip" if compress is True else compress
        kw["compression_opts"] = 1 if kw["compression"] == "gzip" else None

    with h5py.File(path, "w") as f:
        for dim, coord in cube.coords.items():
            dset = f.create_dataset(dim, data=np.asarray(coord))
            dset.make_scale(dim)
            for k, v in cube.coord_attrs.get(dim, {}).items():
                dset.attrs[k] = _sanitize_attr(v)

        def _write_var(name, dims, data, attrs_name=None):
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

        for name, (dims, data) in cube.data_vars.items():
            data = np.asarray(data)
            if np.iscomplexobj(data):
                # attrs of the logical complex variable ride on both halves
                _write_var(f"{name}.real", dims, data.real.astype(np.float32), attrs_name=name)
                _write_var(f"{name}.imag", dims, data.imag.astype(np.float32), attrs_name=name)
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
            data_vars[k] = (dims, f[k][()])
            var_attrs[k] = {
                a: v for a, v in f[k].attrs.items()
                if not a.startswith(("DIMENSION_LIST", "_dims"))
            }
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
