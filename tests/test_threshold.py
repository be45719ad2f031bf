"""Golden tests for threshold operators against the published formulas.

The expected values are computed with independent numpy implementations of
the pywt threshold definitions (soft/hard/garrote), not by calling the
framework code.
"""

import numpy as np
import pytest

from pseudo_3d_interpolation_tpu.ops import threshold as th


def _np_soft(x, t):
    mag = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        shrink = np.clip(1 - t / np.where(mag == 0, 1, mag), 0, None)
    return x * shrink


def _np_hard(x, t):
    return np.where(np.abs(x) < t, 0, x)


def _np_garrote(x, t):
    mag2 = np.abs(x) ** 2
    shrink = np.clip(1 - t * t / np.where(mag2 == 0, 1, mag2), 0, None)
    return x * shrink


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("kind,ref", [("soft", _np_soft), ("hard", _np_hard), ("garrote", _np_garrote)])
def test_real_operators(rng, kind, ref):
    x = rng.normal(size=(16, 16)).astype(np.float32)
    t = 0.7
    got = np.asarray(th.threshold(x, t, kind=kind))
    np.testing.assert_allclose(got, ref(x, t), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("kind,ref", [("soft", _np_soft), ("hard", _np_hard), ("garrote", _np_garrote)])
def test_complex_operators(rng, kind, ref):
    x = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(np.complex64)
    t = 0.9
    got = np.asarray(th.threshold(x, t, kind=kind))
    np.testing.assert_allclose(got, ref(x, t), rtol=1e-5, atol=1e-6)


def test_soft_preserves_phase(rng):
    x = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(np.complex64)
    y = np.asarray(th.soft(x, 0.5))
    keep = np.abs(x) > 0.5
    np.testing.assert_allclose(
        np.angle(y[keep]), np.angle(x[keep]), rtol=1e-4, atol=1e-5
    )


def test_substitute():
    x = np.array([0.1, 2.0, -0.2, -3.0], dtype=np.float32)
    got = np.asarray(th.hard(x, 1.0, substitute=9.0))
    np.testing.assert_allclose(got, [9.0, 2.0, 9.0, -3.0])


def test_percentile_variant(rng):
    x = rng.normal(size=(32, 32)).astype(np.float32)
    perc = 80.0
    t = np.percentile(np.abs(x), perc)
    got = np.asarray(th.threshold(x, perc, kind="hard-percentile"))
    np.testing.assert_allclose(got, _np_hard(x, t), rtol=1e-5, atol=1e-6)


def test_batched_broadcast_threshold(rng):
    """Per-slice thresholds shaped (B, 1, 1) broadcast against (B, H, W)."""
    x = rng.normal(size=(4, 16, 16)).astype(np.float32)
    ts = np.array([0.2, 0.5, 1.0, 2.0], dtype=np.float32)
    got = np.asarray(th.hard(x, ts[:, None, None]))
    for b in range(4):
        np.testing.assert_allclose(got[b], _np_hard(x[b], ts[b]))


def test_pair_threshold_matches_complex(rng):
    from pseudo_3d_interpolation_tpu.ops import cplx

    x = (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))).astype(np.complex64)
    z = cplx.from_complex(x)
    for kind in ("soft", "hard", "garrote"):
        got = cplx.to_complex(th.threshold_pair(z, 0.8, kind=kind))
        expected = np.asarray(th.threshold(x, 0.8, kind=kind))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6, err_msg=kind)


def test_pair_percentile_matches_complex(rng):
    from pseudo_3d_interpolation_tpu.ops import cplx

    x = (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))).astype(np.complex64)
    z = cplx.from_complex(x)
    got = cplx.to_complex(th.threshold_pair(z, 75.0, kind="hard-percentile"))
    expected = np.asarray(th.threshold(x, 75.0, kind="hard-percentile"))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
