"""Pallas TPU kernels for the solver hot loop."""

from .pocs_iter import pallas_supported, pocs_iteration_fused, pocs_solve_fused

__all__ = ["pallas_supported", "pocs_iteration_fused", "pocs_solve_fused"]
