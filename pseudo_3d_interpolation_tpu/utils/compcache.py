"""Persistent XLA compilation cache.

The SHEARLET production basis compiles in minutes cold (61-subband einsum
program at 512²; STATUS.md round-1 measured 5–7 min on the remote chip).
jax's persistent compilation cache keys serialized executables by program
hash, so every process after the first starts warm. The reference has no
analogue (numpy is interpreted); this is the TPU-native answer to its
"first run is slow" problem, enabled by every long-running driver
(pipeline POCS step, CLI, bench).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "p3d-jax-cache")
_active_dir: str | None = None


def _cpu_forced() -> bool:
    """True when this process is pinned to the CPU backend — via the
    ``JAX_PLATFORMS`` env var or an already-applied ``jax_platforms``
    config (tests/conftest.py does the latter). Reads config only if jax
    is already imported; never initializes a backend."""
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return True
    import sys

    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            return (jax.config.jax_platforms or "").lower() == "cpu"
        except Exception:
            return False
    return False


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    Env override: ``P3D_COMPILATION_CACHE`` (set to ``0``/``off`` to
    disable). Safe to call before or after backend initialization.
    """
    global _active_dir
    env = os.environ.get("P3D_COMPILATION_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return ""
    if path is None and env is None and _cpu_forced():
        # CPU-forced process (tests, the driver's virtual-mesh dryrun) and
        # nobody asked for a cache: skip it. CPU compiles are fast, and
        # XLA:CPU AOT entries bake in the *compiling* host's CPU features —
        # loading them on a different host warns "could lead to execution
        # errors such as SIGILL". The cache exists for the remote TPU's
        # minutes-long directional compiles; opt CPU runs in explicitly via
        # P3D_COMPILATION_CACHE or a path argument.
        return ""
    path = path or env or _DEFAULT
    # idempotent only for the SAME dir — a later call with a different dir
    # must re-point jax (and drop its latched cache object below), not
    # return a path that silently receives no entries
    if _active_dir == path:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # jax latches its cache object on first use; if a cache at another dir
    # was already initialized in this process (e.g. a prior run with a
    # different P3D_COMPILATION_CACHE), drop it so the new dir takes effect
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass  # private API; harmless if unavailable — first-use init wins
    # cache everything that took noticeable time; tiny programs recompile
    # faster than they deserialize (threshold overridable for tests)
    min_secs = float(os.environ.get("P3D_CACHE_MIN_COMPILE_SECS", 1.0))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _active_dir = path
    return path
