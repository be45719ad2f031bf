"""Solver layer: the POCS family over swappable sparse transforms."""

from .transforms import (
    FFTTransform,
    DCTTransform,
    WaveletTransform,
    ShearletTransform,
    CurveletTransform,
    get_transform,
)
from .pocs import (
    POCSConfig,
    POCSResult,
    pocs_interpolate,
    pocs_interpolate_numpy,
    pocs,
    fpocs,
    apocs,
)

__all__ = [
    "pocs_interpolate_numpy",
    "FFTTransform",
    "DCTTransform",
    "WaveletTransform",
    "ShearletTransform",
    "CurveletTransform",
    "get_transform",
    "POCSConfig",
    "POCSResult",
    "pocs_interpolate",
    "pocs",
    "fpocs",
    "apocs",
]
