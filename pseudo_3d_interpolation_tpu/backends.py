"""Feature/capability flags.

reference: pseudo_3D_interpolation/functions/backends.py:1-11 (optional-
dependency flags). Here the optional capabilities are the native C++ SEG-Y
core, the Pallas fused kernel (needs a TPU lowering), and the device
platform itself.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def native_segy_enabled() -> bool:
    """C++/OpenMP SEG-Y decode core built and loadable."""
    from .io import native

    return native.lib() is not None


@functools.lru_cache(maxsize=1)
def pallas_enabled() -> bool:
    """Pallas TPU kernels importable."""
    try:
        from .ops.pallas import pallas_supported  # noqa: F401

        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def platform() -> str:
    """Active JAX platform name ('tpu', 'cpu', ...)."""
    import jax

    try:
        return jax.devices()[0].platform
    except Exception:
        return "none"


def summary() -> dict:
    """All capability flags (for logs / QC reports)."""
    import jax

    return {
        "platform": platform(),
        "n_devices": len(jax.devices()) if platform() != "none" else 0,
        "native_segy": native_segy_enabled(),
        "pallas": pallas_enabled(),
        "transforms": ["FFT", "DCT", "WAVELET", "SHEARLET"],
    }
