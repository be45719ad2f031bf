"""Tidal harmonic prediction from constituent constants.

replaces: the ``tpxo-tide-prediction`` dependency of the reference's tide
step (tide_compensation_segy.py:35-38, 242-252). Given per-site harmonic
constants (amplitude + Greenwich phase lag per constituent, e.g. extracted
from the TPXO atlas or a local gauge analysis), synthesizes the tide:

    h(t) = Σ_k f_k(t) · H_k · cos( V_k(t) + u_k(t) − g_k )

with equilibrium arguments V from the standard mean longitudes
(s, h, p, N, p1 — Meeus/Doodson) and the classic nodal corrections f, u
for the major constituents. Accuracy matches standard tide tables to the
centimeter level for the dominant constituents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# constituent speeds (degrees per mean solar hour) and Doodson-style
# equilibrium-argument coefficients (multiples of [T+h-s(τ), s, h, p, 90°])
# V = a1·τ' ... expressed via mean longitudes below.
_CONSTITUENTS = {
    # name: (speed deg/h, V(s,h,p) coefficients (n_T, n_s, n_h, n_p, phase_deg), nodal group)
    "M2": (28.9841042, (2, -2, 2, 0, 0), "M2"),
    "S2": (30.0000000, (2, 0, 0, 0, 0), None),
    "N2": (28.4397295, (2, -3, 2, 1, 0), "M2"),
    "K2": (30.0821373, (2, 0, 2, 0, 0), "K2"),
    "K1": (15.0410686, (1, 0, 1, 0, 90), "K1"),
    "O1": (13.9430356, (1, -2, 1, 0, -90), "O1"),
    "P1": (14.9589314, (1, 0, -1, 0, -90), None),
    "Q1": (13.3986609, (1, -3, 1, 1, -90), "O1"),
    "Mf": (1.0980331, (0, 2, 0, 0, 0), "Mf"),
    "Mm": (0.5443747, (0, 1, 0, -1, 0), "Mm"),
    "M4": (57.9682084, (4, -4, 4, 0, 0), "M4"),
    "MS4": (58.9841042, (4, -2, 2, 0, 0), "M2"),
}


def _mean_longitudes(t_days: np.ndarray):
    """Mean longitudes (degrees) of moon (s), sun (h), lunar perigee (p),
    ascending node (N); ``t_days`` = days since 2000-01-01 12:00 UTC."""
    T = t_days / 36525.0
    s = 218.3164477 + 481267.88123421 * T
    h = 280.46645 + 36000.76983 * T
    p = 83.3532465 + 4069.0137287 * T
    N = 125.04452 - 1934.13626197 * T
    return s % 360, h % 360, p % 360, N % 360


def _nodal_corrections(N_deg: np.ndarray):
    """Standard nodal factors f and angles u (degrees) by group."""
    N = np.deg2rad(N_deg)
    f = {
        "M2": 1.000 - 0.037 * np.cos(N),
        "K1": 1.006 + 0.115 * np.cos(N),
        "O1": 1.009 + 0.187 * np.cos(N),
        "K2": 1.024 + 0.286 * np.cos(N),
        "Mf": 1.043 + 0.414 * np.cos(N),
        "Mm": 1.000 - 0.130 * np.cos(N),
    }
    u = {
        "M2": np.rad2deg(-0.037 * np.sin(N)) * (1.0 / 1.0),
        "K1": np.rad2deg(-0.156 * np.sin(N)),
        "O1": np.rad2deg(0.189 * np.sin(N)),
        "K2": np.rad2deg(-0.310 * np.sin(N)),
        "Mf": np.rad2deg(-0.414 * np.sin(N)),
        "Mm": np.zeros_like(N),
    }
    f["M4"] = f["M2"] ** 2
    u["M4"] = 2 * u["M2"]
    return f, u


def predict_tide(times, constituents: dict[str, tuple[float, float]],
                 mean_level: float = 0.0) -> np.ndarray:
    """Predict tide heights (m) at UTC ``times``.

    ``constituents``: {name: (amplitude_m, greenwich_phase_deg)} with names
    from the supported set; unknown names raise.
    """
    times = pd.to_datetime(np.asarray(times))
    epoch = pd.Timestamp("2000-01-01T12:00:00")
    t_days = (times - epoch).total_seconds().to_numpy() / 86400.0 \
        if hasattr((times - epoch), "total_seconds") else \
        np.asarray((times - epoch).total_seconds()) / 86400.0
    hours_utc = (t_days - np.floor(t_days)) * 24.0 + 12.0  # hours of UTC day

    s, hl, p, N = _mean_longitudes(t_days)
    fs, us = _nodal_corrections(N)
    # solar-time formulation: T = 15°·(UTC hours); constituent argument
    # V = n_T·T + n_s·s + n_h·h + n_p·p + phase0 (speeds check out, e.g.
    # M2: 2·15 − 2·ds/dt + 2·dh/dt = 28.9841 °/h)
    tau = 15.0 * hours_utc

    h_total = np.full(t_days.shape, float(mean_level))
    for name, (amp, g) in constituents.items():
        if name not in _CONSTITUENTS:
            raise ValueError(
                f"unknown constituent {name!r}; supported: {sorted(_CONSTITUENTS)}"
            )
        _, (nT, ns_, nh, np_, ph0), group = _CONSTITUENTS[name]
        V = nT * tau + ns_ * s + nh * hl + np_ * p + ph0
        f = fs.get(group, np.ones_like(t_days)) if group else np.ones_like(t_days)
        u = us.get(group, np.zeros_like(t_days)) if group else np.zeros_like(t_days)
        h_total = h_total + f * amp * np.cos(np.deg2rad(V + u - g))
    return h_total


def tide_table(start, end, constituents, freq: str = "600s",
               mean_level: float = 0.0) -> pd.DataFrame:
    """Convenience: a DataFrame(datetime, height) directly usable by the
    tide-compensation step."""
    times = pd.date_range(start, end, freq=freq)
    return pd.DataFrame({"datetime": times,
                         "height": predict_tide(times, constituents, mean_level)})


# ---------------------------------------------------------------------------
# Spatial (atlas-based) prediction
#
# replaces: the reference's TPXO9-atlas path — tide predicted at per-trace
# lat/lon/time (tide_compensation_segy.py:77-143, 242-252) — without the
# tpxo-tide-prediction dependency. The atlas is a gridded set of harmonic
# constants: per constituent, amplitude (m) and Greenwich phase lag (deg)
# maps over (lat, lon). Constants are bilinearly interpolated at each trace
# position as COMPLEX numbers A·e^{-ig} (interpolating amplitude and phase
# separately is wrong where the phase wraps — same convention as the TPXO
# tools), then synthesized per trace time with nodal corrections.
# ---------------------------------------------------------------------------

class TideAtlas:
    """Gridded harmonic constants: {name: (amp(lat,lon), phase_deg(lat,lon))}.

    NaN cells mark land/invalid nodes; interpolation renormalizes over the
    valid corners of each cell (positions inside fully-invalid cells raise).
    """

    def __init__(self, lat: np.ndarray, lon: np.ndarray,
                 constituents: dict[str, tuple[np.ndarray, np.ndarray]]):
        self.lat = np.asarray(lat, float)
        self.lon = np.asarray(lon, float)
        if not (np.all(np.diff(self.lat) > 0) and np.all(np.diff(self.lon) > 0)):
            raise ValueError("atlas lat/lon axes must be strictly increasing")
        self.constituents = {}
        for name, (amp, ph) in constituents.items():
            if name not in _CONSTITUENTS:
                raise ValueError(f"unknown constituent {name!r}; supported: "
                                 f"{sorted(_CONSTITUENTS)}")
            amp = np.asarray(amp, float)
            ph = np.asarray(ph, float)
            if amp.shape != (len(self.lat), len(self.lon)):
                raise ValueError(f"{name}: amp grid {amp.shape} != "
                                 f"({len(self.lat)}, {len(self.lon)})")
            self.constituents[name] = (amp, ph)

    # -- persistence (ncio cube convention: <NAME>_amp / <NAME>_phase) --
    def save(self, path: str) -> None:
        from ..io.ncio import Cube, write_cube

        data_vars = {}
        for name, (amp, ph) in self.constituents.items():
            data_vars[f"{name}_amp"] = (("lat", "lon"), amp.astype(np.float32))
            data_vars[f"{name}_phase"] = (("lat", "lon"), ph.astype(np.float32))
        write_cube(path, Cube(coords={"lat": self.lat, "lon": self.lon},
                              data_vars=data_vars,
                              attrs={"title": "tidal harmonic constant atlas"}))

    @classmethod
    def from_file(cls, path: str) -> "TideAtlas":
        from ..io.ncio import read_cube

        cube = read_cube(path)
        cons = {}
        for k in cube.data_vars:
            if k.endswith("_amp"):
                name = k[:-4]
                if f"{name}_phase" in cube.data_vars:
                    cons[name] = (cube[k], cube[f"{name}_phase"])
        if not cons:
            raise ValueError(f"{path}: no <NAME>_amp/<NAME>_phase variable "
                             "pairs found — not a tide atlas")
        return cls(cube.coords["lat"], cube.coords["lon"], cons)

    def _bilinear_complex(self, grid_c: np.ndarray, lats, lons) -> np.ndarray:
        """Masked bilinear interpolation of a complex grid at query points.

        Out-of-grid positions clamp to the border (matches nearest-edge
        behavior of atlas tools for coastal surveys at the grid rim).
        """
        lats = np.clip(np.asarray(lats, float), self.lat[0], self.lat[-1])
        lons = np.clip(np.asarray(lons, float), self.lon[0], self.lon[-1])
        iy = np.clip(np.searchsorted(self.lat, lats) - 1, 0, len(self.lat) - 2)
        ix = np.clip(np.searchsorted(self.lon, lons) - 1, 0, len(self.lon) - 2)
        wy = (lats - self.lat[iy]) / (self.lat[iy + 1] - self.lat[iy])
        wx = (lons - self.lon[ix]) / (self.lon[ix + 1] - self.lon[ix])
        vals = np.zeros(lats.shape, complex)
        wsum = np.zeros(lats.shape, float)
        for dy, dx, w in ((0, 0, (1 - wy) * (1 - wx)), (0, 1, (1 - wy) * wx),
                          (1, 0, wy * (1 - wx)), (1, 1, wy * wx)):
            c = grid_c[iy + dy, ix + dx]
            ok = np.isfinite(c)
            vals += np.where(ok, c, 0.0) * w * ok
            wsum += w * ok
        if (wsum <= 0).any():
            raise ValueError("tide atlas: query positions fall in fully "
                             "invalid (land) atlas cells")
        return vals / wsum

    def predict(self, times, lats, lons) -> np.ndarray:
        """Tide height (m) at each (time, lat, lon) triple (equal lengths).

        The spatial analogue of :func:`predict_tide`: constants vary per
        position, astronomy varies per time.
        """
        times = pd.to_datetime(np.asarray(times))
        epoch = pd.Timestamp("2000-01-01T12:00:00")
        t_days = np.asarray((times - epoch).total_seconds()) / 86400.0
        hours_utc = (t_days - np.floor(t_days)) * 24.0 + 12.0
        s, hl, p, N = _mean_longitudes(t_days)
        fs, us = _nodal_corrections(N)
        tau = 15.0 * hours_utc

        h_total = np.zeros(t_days.shape, float)
        for name, (amp, ph) in self.constituents.items():
            _, (nT, ns_, nh, np_, ph0), group = _CONSTITUENTS[name]
            c = self._bilinear_complex(
                amp * np.exp(-1j * np.deg2rad(ph)), lats, lons)
            V = nT * tau + ns_ * s + nh * hl + np_ * p + ph0
            f = fs.get(group, 1.0) if group else 1.0
            u = us.get(group, 0.0) if group else 0.0
            # A·cos(V+u−g) == Re[(A·e^{-ig}) · e^{i(V+u)}]
            h_total = h_total + f * np.real(
                c * np.exp(1j * np.deg2rad(V + u)))
        return h_total
