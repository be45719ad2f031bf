"""Shared utilities: logging, timing, units, padding, config."""

from .logging import xprint, set_verbosity, clean_log_file, redirect_stdout_to_file
from .timing import timeit
from .units import (
    depth2twt,
    twt2depth,
    twt2samples,
    samples2twt,
    depth2samples,
    samples2depth,
)
from .pad import pad_along_axis, slice_valid_data, pad_to_shape
from .rescale import rescale

__all__ = [
    "xprint",
    "set_verbosity",
    "clean_log_file",
    "redirect_stdout_to_file",
    "timeit",
    "depth2twt",
    "twt2depth",
    "twt2samples",
    "samples2twt",
    "depth2samples",
    "samples2depth",
    "pad_along_axis",
    "slice_valid_data",
    "pad_to_shape",
    "rescale",
]
