"""Pallas TPU kernels for the solver hot loop."""

from .pocs_iter import pocs_iteration_fused, pallas_supported

__all__ = ["pocs_iteration_fused", "pallas_supported"]
