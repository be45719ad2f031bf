"""Complex arithmetic as pairs of real arrays (TPU-native representation).

Rationale: this framework is complex-first (frequency slices), but TPU
backends have no/poor native complex support — and the MXU only multiplies
real matrices anyway. Representing ``z = re + i*im`` as a ``Cplx(re, im)``
pytree keeps every hot op in plain f32/bf16 where XLA tiles it onto the
MXU/VPU, and works identically on CPU (tests) and TPU (production).
Conversion to/from numpy ``complex64`` happens only at host boundaries.

``Cplx`` is a NamedTuple, hence automatically a JAX pytree: it threads
through ``jit`` / ``vmap`` / ``lax.scan`` / ``shard_map`` unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Cplx(NamedTuple):
    """A complex array as (real, imag) pair of equal-shaped real arrays."""

    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    # -- arithmetic (elementwise; broadcasts like jnp) --
    @staticmethod
    def _check_real(other):
        """The non-Cplx operand must be REAL: treating a native complex
        scalar/array as one would drop the cross terms (mathematically
        wrong results on CPU) and leak complex dtype into the (re, im)
        pair representation (opaque UNIMPLEMENTED on the TPU backend).
        Wrap complex operands with ``from_complex`` instead."""
        if isinstance(other, complex) or (
                hasattr(other, "dtype")
                and jnp.issubdtype(other.dtype, jnp.complexfloating)):
            raise TypeError(
                "Cplx arithmetic with a native complex operand — wrap it "
                "with ops.cplx.from_complex first")
        return other

    def __add__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re + other.re, self.im + other.im)
        return Cplx(self.re + self._check_real(other), self.im)

    def __sub__(self, other):
        if isinstance(other, Cplx):
            return Cplx(self.re - other.re, self.im - other.im)
        return Cplx(self.re - self._check_real(other), self.im)

    def __mul__(self, other):
        if isinstance(other, Cplx):
            return Cplx(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        other = self._check_real(other)
        return Cplx(self.re * other, self.im * other)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def conj(self):
        return Cplx(self.re, -self.im)

    def abs(self):
        return jnp.sqrt(self.re * self.re + self.im * self.im)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def astype(self, dtype):
        return Cplx(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape):
        return Cplx(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes):
        return Cplx(self.re.transpose(*axes), self.im.transpose(*axes))

    def __getitem__(self, idx):
        # NamedTuple's tuple indexing is shadowed deliberately: index the
        # arrays, not the (re, im) fields. Use ``.re`` / ``.im`` for fields.
        return Cplx(self.re[idx], self.im[idx])


def from_complex(z) -> Cplx:
    """Host boundary: numpy/jax complex array -> Cplx pair (f32)."""
    z = np.asarray(z) if not isinstance(z, jnp.ndarray) else z
    if jnp.iscomplexobj(z):
        return Cplx(jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32))
    r = jnp.asarray(z, jnp.float32)
    return Cplx(r, jnp.zeros_like(r))


def to_complex(z: Cplx) -> np.ndarray:
    """Host boundary: Cplx pair -> numpy complex64."""
    return np.asarray(z.re, np.float32) + 1j * np.asarray(z.im, np.float32)


def zeros(shape, dtype=jnp.float32) -> Cplx:
    return Cplx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def where(cond, a: Cplx, b: Cplx) -> Cplx:
    return Cplx(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))
