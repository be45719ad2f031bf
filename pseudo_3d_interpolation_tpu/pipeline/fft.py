"""Step 12 — forward FFT along the time axis of the cube.

replaces: pseudo_3D_interpolation/cube_apply_FFT.py (xrft fork + dask).
The cube's (iline, xline, twt) amp/env variable becomes complex
``freq_<var>(iline, xline, freq_twt)`` with true-amplitude/true-phase
scaling, optional integer spectrum upsampling, optional Hanning-edged
frequency filtering, and optional dropping of filtered bins (original nfft
recorded for reconstruction). Runs as one jitted transform over all traces.
"""

from __future__ import annotations

import numpy as np

from ..io.ncio import Cube, read_cube, write_cube
from ..ops import spectral
from ..ops.cplx import to_complex
from ..utils.logging import xprint


def apply_fft(
    cube: Cube | str,
    var: str | None = None,
    real: bool = True,
    upsample: int = 1,
    filter_type: str | None = None,
    filter_freqs=None,
    drop_filtered: bool = False,
    out_path: str | None = None,
    attrs_config=None,
    verbose: int = 0,
) -> Cube:
    if isinstance(cube, str):
        cube = read_cube(cube)
    if var is None:
        var = cube.primary_var()
    dims, data = cube.data_vars[var]
    if dims[-1] != "twt":
        raise ValueError(f"{var} must have twt as its last axis, has {dims}")
    twt = np.asarray(cube.coords["twt"], np.float64)

    spec = spectral.forward_fft(data, twt, real=real, upsample=upsample)
    xprint(f"FFT: {data.shape} -> {spec.data.shape} bins", kind="info", verbosity=verbose)

    if filter_type is not None:
        if filter_freqs is None:
            raise ValueError("filter frequencies must be specified")
        spec = spectral.apply_freq_filter(spec, list(filter_freqs), filter_type,
                                          drop_filtered=drop_filtered)
        xprint(f"freq filter {filter_type} {filter_freqs} Hz"
               + (" (+drop)" if drop_filtered else ""), kind="info", verbosity=verbose)

    var_new = f"freq_{var}"
    # carry every non-time coordinate (works for cubes and 2D profiles alike)
    coords = {k: v for k, v in cube.coords.items() if k != "twt"}
    coords["freq_twt"] = spec.freqs
    out = Cube(
        coords=coords,
        data_vars={var_new: (dims[:-1] + ("freq_twt",), to_complex(spec.data))},
        attrs=dict(cube.attrs),
        coord_attrs={"freq_twt": {"units": "Hz", "long_name": "frequency"}},
        var_attrs={var_new: {
            "original_var": var,
            "nfft": spec.nfft,
            "n_time": spec.n_time,
            "twt0": spec.t0,
            "dt": spec.dt,
            "real_fft": int(spec.real),
        }},
    )
    if "fold" in cube.data_vars:
        out.data_vars["fold"] = cube.data_vars["fold"]
    out.append_history(
        f"FFT({var})" + (f" x{upsample}" if upsample > 1 else "")
        + (f" {filter_type.upper()} {filter_freqs}" if filter_type else "")
    )
    # apply the attrs config to the RETURNED cube too (preprocess and
    # apply_ifft do) — in-memory chains would otherwise silently lose the
    # configured freq metadata whenever out_path is omitted
    encodings = None
    if attrs_config is not None:
        from ..io.ncio import apply_attrs, load_attrs_config

        _, attrs_freq, encodings, _ = load_attrs_config(attrs_config)
        named = {}
        for k, a in attrs_freq.items():
            named[{"data": var_new, "new_dim": "freq_twt"}.get(k, k)] = a
        apply_attrs(out, named)
    if out_path:
        write_cube(out_path, out, chunks={"freq_twt": 1}, encodings=encodings)
    return out


def spectrum_from_cube(cube: Cube, var: str) -> spectral.Spectrum:
    """Rebuild a :class:`Spectrum` from a stored frequency cube."""
    from ..ops.cplx import from_complex

    dims, data = cube.data_vars[var]
    a = cube.var_attrs.get(var, {})
    return spectral.Spectrum(
        data=from_complex(data),
        freqs=np.asarray(cube.coords["freq_twt"], np.float64),
        nfft=int(a["nfft"]),
        n_time=int(a["n_time"]),
        t0=float(a["twt0"]),
        dt=float(a["dt"]),
        real=bool(a.get("real_fft", 1)),
    )
