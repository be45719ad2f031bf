"""jit with large closure constants hoisted to runtime parameters.

jax (0.9) lowers every array a jitted function closes over as an inline
HLO literal. For the directional POCS programs those literals are the
shearlet/curvelet window stacks and DFT matrices — ~95 MB of payload at
512² and >1.3 GB at 1024² — which (a) breaks the remote-compile payload
limit of tunnel-attached TPU workers (HTTP 413, docs/perf.md) and
(b) bloats constant folding in every directional compile.

:func:`jit_hoisted` closes the gap between "plan data lives in closures"
(the natural structure for cached transform plans, ops/shearlet.py) and
"plan data must be executable parameters": it traces the wrapped function
once per argument-shape signature with ``jax.make_jaxpr``, splits the
captured jaxpr constants into big (hoisted to arguments of an inner
``jax.jit``) and small (kept inline), and replays the jaxpr via
``jax.core.eval_jaxpr``. Callers keep the plain ``f(*args)`` calling
convention; the hoisted device buffers are uploaded once and reused
across calls.

This replaces the reference's implicit equivalent — torch/numpy keep
weight-like constants as runtime tensors by construction
(functions/POCS.py:526-611 passes Psi as a function argument).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["jit_hoisted"]


def _aval_key(x):
    a = jax.api_util.shaped_abstractify(x)
    return (a.shape, a.dtype, getattr(a, "weak_type", False))


def jit_hoisted(fun, *, donate_argnums=(), in_shardings=None,
                out_shardings=None, const_min_bytes: int = 256 << 10,
                const_sharding=None):
    """Return ``jit(fun)`` with closure constants >= ``const_min_bytes``
    passed as runtime parameters instead of inlined HLO literals.

    Parameters mirror ``jax.jit`` where they exist:

    - ``donate_argnums``: indices into ``fun``'s positional arguments
      (donation is applied to the whole pytree argument, as in jit).
    - ``in_shardings`` / ``out_shardings``: forwarded to the inner jit;
      ``in_shardings`` must match ``fun``'s positional args and is
      automatically prefixed with the hoisted-constant entry.
    - ``const_sharding``: sharding for every hoisted constant (default:
      unconstrained — single-device/replicated semantics).

    The wrapper retraces (building a new inner jit) whenever the argument
    pytree structure or leaf shapes/dtypes change, matching jit's own
    trace-cache behavior.
    """
    cache: dict = {}
    # accept a bare int like jax.jit does (docstring: parameters mirror jit)
    _donate = ((donate_argnums,) if isinstance(donate_argnums, int)
               else tuple(donate_argnums))

    def _build(args):
        flat, in_tree = jax.tree_util.tree_flatten(args)

        def flat_fun(*leaves):
            return fun(*jax.tree_util.tree_unflatten(in_tree, leaves))

        closed, out_shape = jax.make_jaxpr(flat_fun, return_shape=True)(*flat)
        out_tree = jax.tree_util.tree_structure(out_shape)

        big_vals, big_pos, small = [], {}, []
        dedup: dict = {}  # content/id key -> position in big_vals
        for i, c in enumerate(closed.consts):
            # consts arrive as jax.Array, np.ndarray, or (jax>=0.9) the
            # TypedNdArray literal wrapper (.val holds the numpy array,
            # no .nbytes) — size all three by shape x itemsize
            shape = getattr(c, "shape", None)
            dtype = getattr(c, "dtype", None)
            nbytes = (int(np.prod(shape)) * np.dtype(dtype).itemsize
                      if shape is not None and dtype is not None else 0)
            if nbytes >= const_min_bytes:
                # dedup identical constants (the same DFT submatrix is
                # re-created at several call sites): one device buffer,
                # one executable parameter
                if isinstance(c, jax.Array):
                    key = ("id", id(c))
                else:
                    v = np.asarray(getattr(c, "val", c))
                    digest = hashlib.blake2b(v.tobytes(), digest_size=16).digest()
                    key = ("bytes", v.shape, v.dtype.str, digest)
                pos = dedup.get(key)
                if pos is None:
                    pos = dedup[key] = len(big_vals)
                    big_vals.append(c if isinstance(c, jax.Array)
                                    else jnp.asarray(getattr(c, "val", c)))
                big_pos[i] = pos
                small.append(None)
            else:
                small.append(c)

        # bind the bare jaxpr, not the ClosedJaxpr: capturing `closed` in the
        # replay closure would retain the original host copies of every
        # hoisted constant (closed.consts — >1 GB at 1024²) for the wrapper's
        # lifetime alongside the device buffers in big_vals
        jaxpr = closed.jaxpr
        del closed

        def replay(hoisted, *args2):
            leaves, _ = jax.tree_util.tree_flatten(args2)
            consts = [hoisted[big_pos[i]] if i in big_pos else s
                      for i, s in enumerate(small)]
            outs = jax.core.eval_jaxpr(jaxpr, consts, *leaves)
            return jax.tree_util.tree_unflatten(out_tree, outs)

        jit_kwargs = {}
        if _donate:
            jit_kwargs["donate_argnums"] = tuple(d + 1 for d in _donate)
        if in_shardings is not None:
            cs = const_sharding
            jit_kwargs["in_shardings"] = ([cs] * len(big_vals),
                                          *in_shardings)
            if cs is not None:
                # place the hoisted buffers ONCE: otherwise every call finds
                # arg sharding != the requested one and re-broadcasts the
                # constant stacks across the mesh per launch
                big_vals = [jax.device_put(v, cs) for v in big_vals]
        if out_shardings is not None:
            jit_kwargs["out_shardings"] = out_shardings
        return jax.jit(replay, **jit_kwargs), big_vals

    def wrapper(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        key = (in_tree, tuple(_aval_key(x) for x in flat))
        entry = cache.get(key)
        if entry is None:
            entry = cache[key] = _build(args)
        jitted, big_vals = entry
        return jitted(big_vals, *args)

    wrapper.__wrapped__ = fun
    wrapper._cache = cache  # (in_tree, avals) -> (jitted, hoisted buffers)
    return wrapper
