"""Pure-functional numerics layer (jit/vmap/pjit-compatible).

Everything in here is shape-static and traced once under ``jax.jit``:
no data-dependent Python control flow, complex64-first, batched over leading
axes so XLA can tile work onto the MXU/VPU.
"""

from . import threshold  # noqa: F401
from . import decay  # noqa: F401
from . import metrics  # noqa: F401
