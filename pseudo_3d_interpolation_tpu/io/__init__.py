"""Host-side I/O: SEG-Y codec (no segyio dependency), netCDF4-compatible
HDF5 cube store, textual-header provenance, auxiliary files, datalists."""

from .segy import SegyFile, write_segy, ibm2ieee, ieee2ibm
from .headers import (
    scale_coordinates,
    unscale_coordinates,
    check_coordinate_scalar,
)
from .textual import (
    decode_textual_header,
    encode_textual_header,
    add_processing_entry,
)

__all__ = [
    "SegyFile",
    "write_segy",
    "ibm2ieee",
    "ieee2ibm",
    "scale_coordinates",
    "unscale_coordinates",
    "check_coordinate_scalar",
    "decode_textual_header",
    "encode_textual_header",
    "add_processing_entry",
]
