"""Golden tests: matmul-DFT/DCT vs numpy.fft / scipy dct."""

import numpy as np
import pytest
import scipy.fft

from pseudo_3d_interpolation_tpu.ops import cplx, dft


@pytest.fixture
def z64():
    rng = np.random.default_rng(7)
    return (rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48))).astype(np.complex64)


def test_fft2_matches_numpy(z64):
    got = cplx.to_complex(dft.fft2(cplx.from_complex(z64)))
    np.testing.assert_allclose(got, np.fft.fft2(z64), rtol=2e-4, atol=2e-3)


def test_ifft2_matches_numpy(z64):
    got = cplx.to_complex(dft.ifft2(cplx.from_complex(z64)))
    np.testing.assert_allclose(got, np.fft.ifft2(z64), rtol=2e-4, atol=1e-5)


def test_fft2_roundtrip(z64):
    z = cplx.from_complex(z64)
    back = cplx.to_complex(dft.ifft2(dft.fft2(z)))
    np.testing.assert_allclose(back, z64, rtol=1e-4, atol=1e-4)


def test_fft2_batched(z64):
    batch = np.stack([z64, 2 * z64, z64.conj()])
    got = cplx.to_complex(dft.fft2(cplx.from_complex(batch)))
    np.testing.assert_allclose(got, np.fft.fft2(batch, axes=(-2, -1)), rtol=2e-4, atol=2e-3)


def test_fft1_matches_numpy(z64):
    got = cplx.to_complex(dft.fft1(cplx.from_complex(z64), axis=0))
    np.testing.assert_allclose(got, np.fft.fft(z64, axis=0), rtol=2e-4, atol=2e-3)
    got = cplx.to_complex(dft.ifft1(cplx.from_complex(z64), axis=1))
    np.testing.assert_allclose(got, np.fft.ifft(z64, axis=1), rtol=2e-4, atol=1e-4)


def test_rfft1_matches_numpy():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(6, 100)).astype(np.float32)
    got = cplx.to_complex(dft.rfft1(x, axis=-1))
    np.testing.assert_allclose(got, np.fft.rfft(x, axis=-1), rtol=2e-4, atol=2e-3)


def test_rfft1_padded():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, 50)).astype(np.float32)
    got = cplx.to_complex(dft.rfft1(x, axis=-1, n=64))
    np.testing.assert_allclose(got, np.fft.rfft(x, n=64, axis=-1), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("n", [100, 101])
def test_irfft1_roundtrip(n):
    rng = np.random.default_rng(10)
    x = rng.normal(size=(4, n)).astype(np.float32)
    back = np.asarray(dft.irfft1(dft.rfft1(x, axis=-1), n=n, axis=-1))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_irfft1_matches_numpy():
    rng = np.random.default_rng(11)
    spec = (rng.normal(size=(3, 33)) + 1j * rng.normal(size=(3, 33))).astype(np.complex64)
    got = np.asarray(dft.irfft1(cplx.from_complex(spec), n=64, axis=-1))
    np.testing.assert_allclose(got, np.fft.irfft(spec, n=64, axis=-1), rtol=1e-3, atol=1e-4)


def test_dct2_matches_scipy():
    rng = np.random.default_rng(12)
    x = rng.normal(size=(32, 24)).astype(np.float32)
    got = np.asarray(dft.dct2_2d(x))
    expected = scipy.fft.dctn(x, type=2, norm="ortho")
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)
    back = np.asarray(dft.idct2_2d(got))
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_cplx_arithmetic():
    rng = np.random.default_rng(13)
    a = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(np.complex64)
    b = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(np.complex64)
    za, zb = cplx.from_complex(a), cplx.from_complex(b)
    np.testing.assert_allclose(cplx.to_complex(za * zb), a * b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cplx.to_complex(za + zb), a + b, rtol=1e-6)
    np.testing.assert_allclose(cplx.to_complex(za.conj()), a.conj(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(za.abs()), np.abs(a), rtol=1e-5)
    np.testing.assert_allclose(cplx.to_complex(2.0 * za), 2 * a, rtol=1e-6)


# --- fast Cooley-Tukey (N = M·R) path ---

@pytest.mark.parametrize("shape", [(256, 256), (512, 512), (384, 640),
                                   (512, 100), (100, 512), (1024, 256)])
def test_fast_fft2_matches_numpy(shape):
    """The radix split is the SAME DFT: fast vs numpy to f32 rounding, for
    every supported factor (R = 2..8) and mixed fast/dense axis pairs."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    z = cplx.from_complex(x)
    got = cplx.to_complex(dft.fft2(z))
    ref = np.fft.fft2(x)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6
    back = cplx.to_complex(dft.ifft2(cplx.from_complex(ref.astype(np.complex64))))
    assert np.abs(back - x).max() / np.abs(x).max() < 2e-6


def test_fast_split_selection():
    assert dft.fast_split(512) == (128, 4)
    assert dft.fast_split(1024) == (128, 8)
    assert dft.fast_split(256) == (128, 2)
    assert dft.fast_split(384) == (128, 3)
    assert dft.fast_split(128) is None   # dense single matmul is optimal
    assert dft.fast_split(100) is None
    assert dft.fast_split(250) is None   # 125 < 128 for R=2


def test_fast_split_override(monkeypatch):
    """P3D_RADIX_SPLIT overrides R per axis length; other lengths keep the
    default; invalid factors are named errors (ops/dft.py::fast_split)."""
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", {1024: 4, 512: 2})
    assert dft.fast_split(1024) == (256, 4)
    assert dft.fast_split(512) == (256, 2)
    assert dft.fast_split(384) == (128, 3)  # untouched length -> default
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", {512: 5})
    with pytest.raises(ValueError):  # 512 % 5 != 0
        dft.fast_split(512)
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", {512: 8})
    with pytest.raises(ValueError):  # M = 64 < 128
        dft.fast_split(512)


def test_fast_split_env_parse(monkeypatch):
    monkeypatch.setenv("P3D_RADIX_SPLIT", "1024:4,512:2")
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", None)  # force re-parse
    assert dft.fast_split(1024) == (256, 4)
    monkeypatch.setenv("P3D_RADIX_SPLIT", "512:nope")
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", None)
    with pytest.raises(ValueError):
        dft.fast_split(512)


def test_fft2_correct_under_split_override(monkeypatch):
    """The overridden split is the same DFT: fft2/ifft2 and the permuted
    pair stay numpy-exact with R=2 at n=512 (default is R=4)."""
    monkeypatch.setattr(dft, "_SPLIT_PREFERENCE", {512: 2})
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((512, 512))
         + 1j * rng.standard_normal((512, 512))).astype(np.complex64)
    z = cplx.from_complex(x)
    ref = np.fft.fft2(x)
    scale = np.abs(ref).max()
    assert np.abs(cplx.to_complex(dft.fft2(z)) - ref).max() / scale < 2e-6
    perm = dft.radix_perm(512)
    zp = dft.fft2_permuted(z)
    assert np.abs(cplx.to_complex(zp) - ref[np.ix_(perm, perm)]).max() / scale < 2e-6
    back = cplx.to_complex(dft.ifft2_from_permuted(zp))
    assert np.abs(back - x).max() / np.abs(x).max() < 2e-6


def test_fast_and_dense_paths_agree():
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((8, 256, 256))
         + 1j * rng.standard_normal((8, 256, 256))).astype(np.complex64)
    z = cplx.from_complex(x)
    a = cplx.to_complex(dft.fft2(z, fast=True))
    b = cplx.to_complex(dft.fft2(z, fast=False))
    assert np.abs(a - b).max() / np.abs(b).max() < 2e-6
