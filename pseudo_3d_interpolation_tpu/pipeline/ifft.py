"""Step 14 — inverse FFT: frequency cube back to the time domain.

replaces: pseudo_3D_interpolation/cube_apply_IFFT.py. Re-combines the split
complex variable, exactly inverts the true-amplitude/true-phase forward
transform (including dropped filtered bins via the stored nfft), and offers
the reference's envelope clip-to-zero + global min/max rescale.
"""

from __future__ import annotations

import numpy as np

from ..io.ncio import Cube, read_cube, write_cube
from ..ops import spectral
from ..utils.logging import xprint
from ..utils.rescale import rescale
from .fft import spectrum_from_cube


def apply_ifft(
    cube: Cube | str,
    var: str | None = None,
    envelope_clip: bool = False,
    rescale_minmax: tuple[float, float] | None = None,
    attrs_config=None,
    out_path: str | None = None,
    verbose: int = 0,
) -> Cube:
    if isinstance(cube, str):
        cube = read_cube(cube)
    if var is None:
        var = next((v for v in cube.data_vars if v.startswith("freq_")),
                   None)
        if var is None:
            raise ValueError(
                "cube has no freq_* spectral variable to invert — run the "
                f"fft step first (variables: {sorted(cube.data_vars)})")
    spec = spectrum_from_cube(cube, var)
    twt, x = spectral.inverse_fft_original(spec)
    x = np.asarray(x)
    xprint(f"IFFT: {spec.data.shape} bins -> {x.shape[-1]} samples",
           kind="info", verbosity=verbose)

    if envelope_clip:
        # envelopes are non-negative by definition (reference :120-140)
        x = np.clip(x, 0.0, None)
    if rescale_minmax is not None:
        x = np.asarray(rescale(x, rescale_minmax[0], rescale_minmax[1]))

    var_out = cube.var_attrs.get(var, {}).get("original_var", var.replace("freq_", ""))
    if isinstance(var_out, bytes):
        var_out = var_out.decode()
    dims = cube.dims_of(var)[:-1] + ("twt",)
    coords = {k: v for k, v in cube.coords.items() if k != "freq_twt"}
    coords["twt"] = twt
    out = Cube(
        coords=coords,
        data_vars={var_out: (dims, x.astype(np.float32))},
        attrs=dict(cube.attrs),
        coord_attrs={"twt": {"units": "s", "long_name": "two-way traveltime"}},
    )
    if "fold" in cube.data_vars:
        out.data_vars["fold"] = cube.data_vars["fold"]
    out.append_history(f"IFFT({var})")
    if attrs_config is not None:
        from ..io.ncio import apply_time_attrs

        apply_time_attrs(out, attrs_config)
    if out_path:
        write_cube(out_path, out)
    return out
