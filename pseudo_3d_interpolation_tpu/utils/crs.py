"""Coordinate reference system conversions (no pyproj dependency).

replaces: the pyproj Transformer used by the reference's reproject step
(reproject_segy.py:73-169). Implements the transverse Mercator projection
with Karney's 6th-order Krüger series (accuracy well below 1 mm within UTM
zones) for WGS84, covering:

  - EPSG:4326 (geographic WGS84)
  - EPSG:326xx (UTM north) / 327xx (UTM south)

plus DMS -> decimal-degree parsing. Vectorized numpy throughout.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_FE = 500000.0

_N = _F / (2.0 - _F)
_n = _N
# rectifying radius
_ABAR = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)

# Karney alpha (forward) / beta (inverse) series, 6th order in n
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288
    + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512
    + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480 + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
# conformal -> geographic latitude series
_DELTA = np.array([
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45 + 26 * _n**5 / 45
    - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315
    + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105 + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
])

_E2SQRT = 2.0 * np.sqrt(_n) / (1.0 + _n)


def geographic_to_tm(lat_deg, lon_deg, lon0_deg: float, false_northing: float = 0.0):
    """WGS84 geographic -> transverse Mercator easting/northing (meters)."""
    phi = np.deg2rad(np.asarray(lat_deg, np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, np.float64) - lon0_deg)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _E2SQRT * np.arctanh(_E2SQRT * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7)
    xi = xi_p + np.sum(
        _ALPHA * np.sin(2 * j * xi_p[..., None]) * np.cosh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    eta = eta_p + np.sum(
        _ALPHA * np.cos(2 * j * xi_p[..., None]) * np.sinh(2 * j * eta_p[..., None]),
        axis=-1,
    )
    easting = _FE + _K0 * _ABAR * eta
    northing = false_northing + _K0 * _ABAR * xi
    return easting, northing


def tm_to_geographic(easting, northing, lon0_deg: float, false_northing: float = 0.0):
    """Transverse Mercator easting/northing -> WGS84 geographic (degrees)."""
    xi = (np.asarray(northing, np.float64) - false_northing) / (_K0 * _ABAR)
    eta = (np.asarray(easting, np.float64) - _FE) / (_K0 * _ABAR)
    j = np.arange(1, 7)
    xi_p = xi - np.sum(
        _BETA * np.sin(2 * j * xi[..., None]) * np.cosh(2 * j * eta[..., None]), axis=-1
    )
    eta_p = eta - np.sum(
        _BETA * np.cos(2 * j * xi[..., None]) * np.sinh(2 * j * eta[..., None]), axis=-1
    )
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    phi = chi + np.sum(_DELTA * np.sin(2 * j * chi[..., None]), axis=-1)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(phi), np.rad2deg(lam) + lon0_deg


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """(central meridian deg, false northing) for a UTM EPSG code."""
    if 32601 <= epsg <= 32660:
        return -183.0 + 6.0 * (epsg - 32600), 0.0
    if 32701 <= epsg <= 32760:
        return -183.0 + 6.0 * (epsg - 32700), 10000000.0
    raise ValueError(f"EPSG:{epsg} is not a supported UTM code (326xx/327xx)")


def transform(x, y, src_epsg: int, dst_epsg: int):
    """Transform coordinate arrays between supported CRSs.

    Geographic CRS order: (x, y) = (longitude, latitude) like pyproj with
    ``always_xy=True``.
    """
    src_epsg, dst_epsg = int(src_epsg), int(dst_epsg)
    if src_epsg == dst_epsg:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if src_epsg == 4326:
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    else:
        lon0, fn = utm_zone_params(src_epsg)
        lat, lon = tm_to_geographic(x, y, lon0, fn)
    if dst_epsg == 4326:
        return lon, lat
    lon0, fn = utm_zone_params(dst_epsg)
    return geographic_to_tm(lat, lon, lon0, fn)


def dms_to_dd(degrees, minutes=0.0, seconds=0.0):
    """Degrees/minutes/seconds -> decimal degrees
    (reference reproject_segy.py:64-70)."""
    d = np.asarray(degrees, np.float64)
    sign = np.where(d < 0, -1.0, 1.0)
    return sign * (np.abs(d) + np.asarray(minutes) / 60.0 + np.asarray(seconds) / 3600.0)
