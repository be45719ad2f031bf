"""Golden tests for threshold decay schedules vs independent numpy formulas.

Each expected value is derived directly from the published model definitions
(Gao 2010/2013, Yang 2012, Ge 2015, Zhao 2021), as catalogued in SURVEY.md §2
for reference functions/POCS.py:169-368.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import decay


@pytest.fixture
def coeffs():
    rng = np.random.default_rng(0)
    return np.abs(rng.normal(size=(32, 32))).astype(np.float32)


def test_linear(coeffs):
    niter = 10
    amax = coeffs.max()
    tau_max, tau_min = 0.99 * amax, 1e-3 * amax
    i = np.arange(1, niter + 1)
    expected = tau_max - (tau_max - tau_min) * (i - 1) / (niter - 1)
    got = np.asarray(decay.threshold_decay(coeffs, "linear", niter, 0.99, 1e-3))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("q", [1.0, 2.0, 3.0])
def test_exponential_q(coeffs, q):
    niter = 20
    amax = coeffs.max()
    tau_max, tau_min = 0.99 * amax, 1e-3 * amax
    m = (np.arange(1, niter + 1) - 1) / (niter - 1)
    expected = tau_max * np.exp(np.log(tau_min / tau_max) * m**q)
    model = "exponential" if q == 1.0 else f"exponential-{q:g}"
    got = np.asarray(decay.threshold_decay(coeffs, model, niter, 0.99, 1e-3))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_exponential_monotone_decreasing(coeffs):
    got = np.asarray(decay.threshold_decay(coeffs, "exponential", 50, 0.99, 1e-3))
    assert np.all(np.diff(got) < 0)
    np.testing.assert_allclose(got[0], 0.99 * coeffs.max(), rtol=1e-5)
    np.testing.assert_allclose(got[-1], 1e-3 * coeffs.max(), rtol=1e-4)


@pytest.mark.parametrize("q", [1.0, 2.0])
def test_inverse_proportional(coeffs, q):
    niter = 15
    amax, amin = coeffs.max(), coeffs.min()
    nq = niter**q
    a = nq * (amax - amin) / (nq - 1)
    b = (nq * amin - amax) / (nq - 1)
    i = np.arange(1, niter + 1)
    expected = a / i**q + b
    model = "inverse_proportional" if q == 1.0 else f"inverse_proportional-{q:g}"
    got = np.asarray(decay.threshold_decay(coeffs, model, niter))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_adaptive_p_min(coeffs):
    niter = 8
    tau_min = 0.01 * np.sqrt(np.linalg.norm(coeffs) ** 2 / coeffs.size)
    got = np.asarray(decay.threshold_decay(coeffs, "exponential", niter, 0.99, "adaptive"))
    np.testing.assert_allclose(got[-1], tau_min, rtol=1e-4)


def test_data_driven(coeffs):
    niter = 12
    amax = coeffs.max()
    tau_max, tau_min = 0.99 * amax, 1e-3 * amax
    # independent numpy formulation (reference semantics)
    v = np.sort(coeffs[(coeffs > tau_min) & (coeffs < tau_max)])[::-1]
    nv = v.size
    i = np.arange(1, niter + 1)
    expected = np.empty(niter, coeffs.dtype)
    expected[0] = v[0]
    expected[1:] = v[np.ceil((i[1:] - 1) * (nv - 1) / (niter - 1)).astype(int)]
    got = np.asarray(decay.threshold_decay(coeffs, "data-driven", niter, 0.99, 1e-3))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_batched_matches_per_slice(coeffs):
    rng = np.random.default_rng(1)
    batch = np.abs(rng.normal(size=(5, 16, 16))).astype(np.float32)
    got = np.asarray(decay.threshold_decay(batch, "exponential", 10, 0.99, 1e-3))
    assert got.shape == (10, 5)
    for b in range(5):
        single = np.asarray(decay.threshold_decay(batch[b], "exponential", 10, 0.99, 1e-3))
        np.testing.assert_allclose(got[:, b], single, rtol=1e-5)


def test_factors_kind(coeffs):
    got = np.asarray(decay.threshold_decay(coeffs, "exponential", 5, 99.0, 1.0, kind="factors"))
    np.testing.assert_allclose(got[0], 99.0, rtol=1e-5)
    np.testing.assert_allclose(got[-1], 1.0, rtol=1e-5)


def test_shearlet_scales():
    assert decay.n_shearlet_scales((512, 512)) == 4
    assert decay.n_shearlet_scales((64, 64)) == 3
    assert decay.n_shearlet_scales((2, 2)) == 1


class TestStreamedDecayFromInput:
    """decay_from_input (streamed per-subband max/Σ|c|² reductions) must
    reproduce decay(forward(z)) bit-for-bit for the closed-form models —
    it replaces a full (B, L, H, W) forward materialization per batch in
    the production drivers."""

    def _check(self, tr, n, pmins):
        import jax.numpy as jnp

        from pseudo_3d_interpolation_tpu.ops.cplx import Cplx

        rng = np.random.default_rng(0)
        z = Cplx(jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)),
                 jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32)))
        for model in ("exponential", "linear", "exponential-2"):
            for p_min in pmins:
                a = np.asarray(tr.decay(tr.forward(z), model, 10, 0.99,
                                        p_min, "values"))
                b = np.asarray(tr.decay_from_input(z, model, 10, 0.99,
                                                   p_min, "values"))
                np.testing.assert_allclose(b, a, rtol=1e-6)
        # fallback models route through the materialized forward
        c = tr.decay_from_input(z, "data-driven", 5, 0.99, pmins[-1], "values")
        assert c.shape[0] == 5

    def test_shearlet(self):
        from pseudo_3d_interpolation_tpu.models.transforms import ShearletTransform

        self._check(ShearletTransform(), 64, ["adaptive", 1e-3])

    def test_curvelet(self):
        from pseudo_3d_interpolation_tpu.models.transforms import CurveletTransform

        self._check(CurveletTransform(), 96, [1e-3])


class TestReviewRegressions:
    def test_zero_slice_exponential_schedule_is_zero(self):
        from pseudo_3d_interpolation_tpu.ops.decay import threshold_decay

        d = np.asarray(threshold_decay(jnp.zeros((2, 8, 8)), "exponential", 5))
        assert np.isfinite(d).all() and (d == 0).all()
        # mixed batch: only the dead slice's schedule is zero
        c = jnp.concatenate([jnp.zeros((1, 8, 8)), jnp.ones((1, 8, 8))])
        d = np.asarray(threshold_decay(c, "exponential", 5, p_min=1e-3))
        assert (d[:, 0] == 0).all() and np.isfinite(d[:, 1]).all()
        assert d[0, 1] > d[-1, 1] > 0

    def test_inverse_proportional_single_iteration(self):
        from pseudo_3d_interpolation_tpu.ops.decay import threshold_decay

        c = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8)))
        d = np.asarray(threshold_decay(jnp.abs(c), "inverse_proportional", 1))
        assert np.isfinite(d).all()
        np.testing.assert_allclose(d[0], np.abs(np.asarray(c)).max(),
                                   rtol=1e-6)

    def test_inverse_proportional_refuses_factors(self):
        from pseudo_3d_interpolation_tpu.ops.decay import threshold_decay

        with pytest.raises(ValueError, match="values"):
            threshold_decay(jnp.ones((1, 8, 8)), "inverse_proportional", 5,
                            kind="factors")

    def test_factors_refuses_adaptive_p_min(self):
        from pseudo_3d_interpolation_tpu.ops.decay import threshold_decay

        with pytest.raises(ValueError, match="adaptive"):
            threshold_decay(jnp.ones((1, 8, 8)), "exponential", 5,
                            p_min="adaptive", kind="factors")

    def test_malformed_exponent_suffix_raises(self):
        from pseudo_3d_interpolation_tpu.ops.decay import threshold_decay

        with pytest.raises(ValueError, match="exponent"):
            threshold_decay(jnp.ones((1, 8, 8)), "exponential-2x", 5)
        # non-numeric words stay part of the model name
        d = np.asarray(threshold_decay(jnp.ones((1, 8, 8)), "data-driven", 5))
        assert np.isfinite(d).all()
