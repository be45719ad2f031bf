"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) so no TPU pod is required; the
same sharded code paths compile unchanged for real TPU meshes.

Note: this environment's sitecustomize imports jax at interpreter start (to
register the remote-TPU PJRT plugin), so ``JAX_PLATFORMS`` env mutation here is
too late — but backends initialize lazily, so ``jax.config.update`` before the
first device lookup still selects CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() >= 8, "expected 8 virtual CPU devices for sharding tests"
