"""Step 11 — cube preprocessing: balance / gain / filter / resample / envelope.

replaces: pseudo_3D_interpolation/cube_preprocessing_3D.py (dask apply_ufunc
chains). Operations run as batched jit-compatible ops over the whole cube
(time on the last axis), in the reference's order: trace balancing ->
time-variant gain -> Butterworth frequency filter -> resampling ->
envelope. Each applied op appends to the history/provenance attrs.
"""

from __future__ import annotations



import numpy as np

import jax

from ..io.ncio import Cube, read_cube, write_cube
from ..ops import filters as flt
from ..ops import signal as sig
from ..utils.logging import xprint

# module-level jits: each op is one compiled program per cube shape instead
# of per-primitive eager dispatch (pathologically slow on remote backends)
_balance_ref = jax.jit(sig.calc_reference_amplitude,
                       static_argnames=("axis", "scale"))
_envelope = jax.jit(sig.envelope)
_resample = jax.jit(sig.resample_fft, static_argnames=("n_out",))


def preprocess(
    cube: Cube | str,
    var: str = "amp",
    balance: str | None = None,  # 'rms' | 'max' (reference :171-194)
    balance_store_ref: bool = True,
    gain_args: dict | None = None,  # sugain kwargs (reference :196-239)
    gain_use_samples: bool = False,  # gain over sample index (ref --use_samples)
    filter_type: str | None = None,  # lowpass/highpass/bandpass (:241-272)
    filter_freqs=None,
    resample_to: int | None = None,  # new sample count (:274-336)
    # alternative target specs, mirroring the reference's mutually exclusive
    # --resampling_interval (ms) / --resampling_frequency (Hz) /
    # --resampling_factor flags (cube_preprocessing_3D.py:86-91); resolved
    # against the cube's twt axis when resample_to is not given
    resample_interval_ms: float | None = None,
    resample_frequency_hz: float | None = None,
    resample_factor: float | None = None,
    resample_method: str = "fft",  # 'fft' (device) | 'poly' (host polyphase)
    resample_window: str = "hann",  # polyphase FIR window (ref --window_resample)
    envelope: bool = False,  # Hilbert envelope -> 'env' (:340-360)
    attrs_config=None,  # attrs_time family (ref --params_netcdf)
    out_path: str | None = None,
    verbose: int = 0,
) -> Cube:
    if isinstance(cube, str):
        cube = read_cube(cube)
    dims, data = cube.data_vars[var]
    if dims[-1] != "twt":
        raise ValueError(f"{var} must be time-last, has dims {dims}")
    data = np.asarray(data, np.float32)
    twt = np.asarray(cube.coords["twt"], np.float64)
    dt = float(np.mean(np.diff(twt)))
    history = []

    if resample_to is None and (resample_interval_ms or resample_frequency_hz
                                or resample_factor):
        if len(twt) < 2:
            raise ValueError("cannot derive a resample target from a "
                             "single-sample twt axis; pass resample_to")
        n_in, dt_in = len(twt), float(twt[1] - twt[0])  # twt in seconds
        if resample_interval_ms:
            resample_to = int(round(n_in * dt_in / (resample_interval_ms / 1e3)))
        elif resample_frequency_hz:
            resample_to = int(round(n_in * dt_in * resample_frequency_hz))
        else:
            resample_to = int(round(n_in / resample_factor))

    if balance:
        ref = np.asarray(_balance_ref(data, axis=-1, scale=balance))
        data = data / ref[..., None]
        if balance_store_ref:
            cube.data_vars["amp_ref"] = (dims[:-1], ref.astype(np.float32))
        history.append(f"BALANCE({balance})")
        xprint(f"balanced traces ({balance})", kind="info", verbosity=verbose)

    if gain_args:
        gain_axis = np.arange(data.shape[-1], dtype=np.float64) \
            if gain_use_samples else twt
        # closure, not functools.partial: jit unwraps partials and traces
        # their bound arguments, but twt (and dict-valued PGC specs) must
        # stay concrete host values
        gain_fn = jax.jit(lambda d: sig.gain(d, gain_axis, **gain_args))
        data = np.asarray(gain_fn(data))
        history.append("GAIN(" + ",".join(f"{k}={v}" for k, v in gain_args.items()) + ")")
        xprint(f"applied gain {gain_args}", kind="info", verbosity=verbose)

    if filter_type:
        if filter_freqs is None:
            raise ValueError("filter_freqs required with filter_type")
        data = np.asarray(
            flt.filter_frequency(data, list(filter_freqs), fs=1.0 / dt,
                                 filter_type=filter_type, device=True)
        ).astype(np.float32)
        history.append(f"FILTER({filter_type},{'/'.join(str(f) for f in filter_freqs)}Hz)")
        xprint(f"filtered {filter_type} {filter_freqs} Hz", kind="info", verbosity=verbose)

    if resample_to:
        n_old = data.shape[-1]
        if resample_method == "poly":
            # exact scipy polyphase path (reference resample_poly option)
            from math import gcd

            import scipy.signal as ss

            g = gcd(int(resample_to), n_old)
            data = ss.resample_poly(data, int(resample_to) // g, n_old // g,
                                    axis=-1,
                                    # bare 'kaiser' needs a beta; scipy's
                                    # resample_poly default is ('kaiser', 5.0)
                                    # (the reference passes the string through
                                    # and would crash on it)
                                    window=(resample_window, 5.0)
                                    if resample_window == "kaiser"
                                    else resample_window).astype(np.float32)
        else:
            data = np.asarray(_resample(data, n_out=int(resample_to))).astype(np.float32)
        twt = sig.resampled_twt(twt, int(resample_to), n_old)
        cube.coords["twt"] = twt
        history.append(f"RESAMPLE({n_old}->{resample_to})")
        xprint(f"resampled {n_old} -> {resample_to}", kind="info", verbosity=verbose)

    cube.data_vars[var] = (dims, data)

    if envelope:
        env = np.asarray(_envelope(data)).astype(np.float32)
        cube.data_vars["env"] = (dims, env)
        history.append("ENVELOPE")
        xprint("computed envelope", kind="info", verbosity=verbose)

    for h in history:
        cube.append_history(h)
    if attrs_config is not None:
        from ..io.ncio import apply_time_attrs

        apply_time_attrs(cube, attrs_config)
    if out_path:
        write_cube(out_path, cube)
    return cube
