"""jit_hoisted: closure constants become runtime parameters, numerics unchanged.

The reference keeps weight-like constants (Psi window stacks) as runtime
tensors by construction (functions/POCS.py:526-611 passes Psi as an
argument); jax inlines closed-over arrays as HLO literals, so the repo
hoists them explicitly (utils/hoist.py). These tests pin the contract:
identical results to jax.jit, big constants hoisted + deduped, small
constants left inline, trace-cache behavior matching jit's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops.cplx import Cplx
from pseudo_3d_interpolation_tpu.utils.hoist import jit_hoisted


def _entry(fn, *args):
    """The wrapper's cache entry for this call signature: (jitted, big_vals)."""
    flat, in_tree = jax.tree_util.tree_flatten(args)
    keys = list(fn._cache)
    assert len(keys) >= 1
    # find the entry whose tree matches
    for k, v in fn._cache.items():
        if k[0] == in_tree:
            return v
    raise AssertionError("no cache entry for call signature")


class TestJitHoisted:
    def test_matches_jit_and_hoists_big_constant(self):
        big = np.linspace(0.0, 1.0, 1 << 16, dtype=np.float32)  # 256 KiB

        def f(x):
            return x * jnp.asarray(big) + 1.0

        x = jnp.arange(1 << 16, dtype=jnp.float32)
        ref = jax.jit(f)(x)
        fn = jit_hoisted(f, const_min_bytes=1024)
        out = fn(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        _, big_vals = _entry(fn, x)
        assert len(big_vals) == 1
        assert big_vals[0].shape == big.shape

    def test_small_constants_stay_inline(self):
        small = np.arange(8, dtype=np.float32)

        def f(x):
            return x + jnp.asarray(small)

        fn = jit_hoisted(f, const_min_bytes=1024)
        x = jnp.ones(8, jnp.float32)
        np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(x + small))
        _, big_vals = _entry(fn, x)
        assert big_vals == []

    def test_identical_constants_dedup_to_one_buffer(self):
        big = np.random.default_rng(0).standard_normal(1 << 15).astype(np.float32)

        def f(x):
            # same content captured twice via independent np->jnp conversions
            return x @ jnp.asarray(big.copy()) + x @ jnp.asarray(big.copy())

        fn = jit_hoisted(f, const_min_bytes=1024)
        x = jnp.ones((4, 1 << 15), jnp.float32)
        out = fn(x)
        np.testing.assert_allclose(
            np.asarray(out), 2.0 * (np.ones((4, 1 << 15)) @ big), rtol=1e-5)
        _, big_vals = _entry(fn, x)
        assert len(big_vals) == 1

    def test_pytree_args_and_outputs(self):
        big = np.full((256, 256), 0.5, np.float32)

        def f(z):
            p = jnp.asarray(big)
            return Cplx(z.re * p, z.im * p)

        fn = jit_hoisted(f, const_min_bytes=1024)
        z = Cplx(jnp.ones((256, 256)), 2.0 * jnp.ones((256, 256)))
        out = fn(z)
        assert isinstance(out, Cplx)
        np.testing.assert_allclose(np.asarray(out.re), 0.5)
        np.testing.assert_allclose(np.asarray(out.im), 1.0)

    def test_retraces_on_new_shape_reuses_on_same(self):
        big = np.ones(1 << 15, np.float32)

        def f(x):
            return x * jnp.asarray(big)[: x.shape[0]]

        fn = jit_hoisted(f, const_min_bytes=1024)
        fn(jnp.ones(16))
        assert len(fn._cache) == 1
        fn(jnp.ones(16))
        assert len(fn._cache) == 1  # same signature: no rebuild
        fn(jnp.ones(32))
        assert len(fn._cache) == 2  # new shape: one new entry

    def test_shardings_with_const_sharding(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("slices",))
        shard = NamedSharding(mesh, P("slices"))
        repl = NamedSharding(mesh, P())
        big = np.random.default_rng(1).standard_normal((64, 64)).astype(np.float32)

        def f(x):
            return x @ jnp.asarray(big)

        fn = jit_hoisted(f, in_shardings=(shard,), out_shardings=shard,
                         const_sharding=repl, const_min_bytes=1024)
        x = jax.device_put(jnp.ones((8, 64), jnp.float32), shard)
        out = fn(x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.ones((8, 64)) @ big, rtol=1e-4)
        assert out.sharding.spec == P("slices")

    def test_grad_compatible_constant_value(self):
        # hoisting must not perturb values used downstream of autodiff results
        big = np.linspace(1.0, 2.0, 1 << 15).astype(np.float32)

        def loss(x):
            return jnp.sum((x * jnp.asarray(big)) ** 2)

        g_ref = jax.jit(jax.grad(loss))(jnp.ones(1 << 15))
        g_hoist = jit_hoisted(jax.grad(loss), const_min_bytes=1024)(jnp.ones(1 << 15))
        np.testing.assert_allclose(np.asarray(g_hoist), np.asarray(g_ref), rtol=1e-6)


class TestHoistedSolverPath:
    """The production solver path rides jit_hoisted (models/pocs.py): the
    shearlet Psi stacks must appear as hoisted buffers, not HLO literals."""

    def test_directional_hlo_payload_stays_bounded(self):
        """Regression gate for the remote-compile payload failure (HTTP 413):
        the lowered HLO of a directional solve must NOT embed the plan's
        window stacks as literals. At 1024² the un-hoisted program shipped
        358 MB of inlined constants; hoisted it ships a few MB of HLO plus
        device buffers."""
        from pseudo_3d_interpolation_tpu.models.pocs import (
            POCSConfig, _jitted_solver)
        from pseudo_3d_interpolation_tpu.models.transforms import get_transform

        fn = _jitted_solver(get_transform("SHEARLET"), POCSConfig(niter=1))
        z = Cplx(jnp.ones((1, 128, 128)), jnp.zeros((1, 128, 128)))
        m = jnp.ones((128, 128), jnp.float32)
        fn(z, m)
        (jitted, big) = next(iter(fn._cache.values()))
        hoisted = sum(int(np.prod(b.shape)) * b.dtype.itemsize for b in big)
        assert hoisted >= 512 << 10  # the psi stack really is out-of-line
        txt = jitted.lower(big, z, m).as_text()
        # measured 4.5 MB at 128²; the inlined psi stack alone would add
        # more than the whole budget below
        assert len(txt) < 16 << 20

    def test_shearlet_solver_hoists_psi(self):
        from pseudo_3d_interpolation_tpu.models.pocs import (
            POCSConfig, _jitted_solver)
        from pseudo_3d_interpolation_tpu.models.transforms import get_transform

        tr = get_transform("SHEARLET")
        cfg = POCSConfig(niter=2)
        fn = _jitted_solver(tr, cfg)
        z = Cplx(jnp.ones((1, 64, 64)), jnp.zeros((1, 64, 64)))
        m = jnp.ones((64, 64), jnp.float32)
        res = fn(z, m)
        assert np.isfinite(np.asarray(res.data.re)).all()
        entry = _entry(fn, z, m)
        assert len(entry[1]) >= 1  # at least one hoisted plan constant


class TestReviewRegressions:
    def test_donate_argnums_accepts_bare_int(self):
        """Docstring says parameters mirror jax.jit; jit accepts a bare int
        for donate_argnums, so jit_hoisted must too (it used to raise
        TypeError at first call)."""
        big = np.linspace(0.0, 1.0, 1 << 15).astype(np.float32)

        def f(x):
            return x + jnp.asarray(big)[: x.shape[0]]

        fn = jit_hoisted(f, donate_argnums=0, const_min_bytes=1024)
        out = fn(jnp.zeros(16, jnp.float32))
        np.testing.assert_allclose(np.asarray(out), big[:16], rtol=1e-6)
        # the inner jit actually received the shifted donation
        jitted, _ = _entry(fn, jnp.zeros(16, jnp.float32))
        assert jitted._jit_info.donate_argnums == (1,)

    def test_replay_does_not_retain_closed_jaxpr(self):
        """The replay closure must capture the bare jaxpr, not the
        ClosedJaxpr: the latter retains the original (host) copies of every
        hoisted constant for the wrapper's lifetime (>1 GB at 1024^2)."""
        big = np.random.default_rng(0).standard_normal(1 << 15).astype(np.float32)

        def f(x):
            return x * jnp.asarray(big)[: x.shape[0]]

        fn = jit_hoisted(f, const_min_bytes=1024)
        fn(jnp.ones(8, jnp.float32))
        jitted, _ = _entry(fn, jnp.ones(8, jnp.float32))
        replay = jitted.__wrapped__
        cells = [c.cell_contents for c in (replay.__closure__ or ())]
        assert not any(type(c).__name__ == "ClosedJaxpr" for c in cells)

    def test_const_sharding_placed_once(self):
        """With const_sharding set, the hoisted buffers are device_put at
        build time — otherwise the inner jit re-broadcasts the constant
        stacks across the mesh on EVERY call."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devs, ("slices",))
        shard = NamedSharding(mesh, P("slices"))
        repl = NamedSharding(mesh, P())
        big = np.random.default_rng(2).standard_normal((64, 64)).astype(np.float32)

        def f(x):
            return x @ jnp.asarray(big)

        fn = jit_hoisted(f, in_shardings=(shard,), out_shardings=shard,
                         const_sharding=repl, const_min_bytes=1024)
        x = jax.device_put(jnp.ones((8, 64), jnp.float32), shard)
        fn(x)
        _, big_vals = _entry(fn, x)
        assert all(v.sharding == repl for v in big_vals)
