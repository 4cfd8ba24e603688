"""Cubic binomial extension GF(p)[X]/(X^3 - 7) arithmetic (API parity).

The reference's extension algebra carries dedicated degree-3 mul and
inverse formulas alongside the degree-2 ones (src/p3/extension.rs:330-390
for the Karatsuba-style mul, :473-532 for the adjugate inverse), selected
by the EXT_DEGREE constant.  The proof family this framework verifies is
degree-2 (p3/constants.rs: EXT_DEGREE=2), so this module exists for
surface parity and is validated against an int oracle in
tests/test_extension.py.

Note X^3 - 7 is irreducible over Goldilocks iff 7 is a non-cube; since
3 | p-1, that is a real condition — the test asserts 7^((p-1)/3) != 1 so
the inverse formula below is total on nonzero elements.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import GOLDILOCKS_P as P
from . import goldilocks as gl
from .goldilocks import GL


class GL3(NamedTuple):
    """A GF(p^3) array: three equally-shaped GL arrays."""

    c0: GL
    c1: GL
    c2: GL

    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx):
        return GL3(self.c0[idx], self.c1[idx], self.c2[idx])


def zeros(shape=()):
    return GL3(gl.zeros(shape), gl.zeros(shape), gl.zeros(shape))


def ones(shape=()):
    return GL3(gl.ones(shape), gl.zeros(shape), gl.zeros(shape))


def from_base(x: GL) -> GL3:
    z = gl.zeros(jnp.shape(x.lo))
    return GL3(x, z, z)


def from_u64_triple(c0, c1, c2) -> GL3:
    return GL3(gl.from_u64(c0), gl.from_u64(c1), gl.from_u64(c2))


def to_u64_triple(x: GL3):
    return gl.to_u64(x.c0), gl.to_u64(x.c1), gl.to_u64(x.c2)


def add(x: GL3, y: GL3) -> GL3:
    return GL3(gl.add(x.c0, y.c0), gl.add(x.c1, y.c1), gl.add(x.c2, y.c2))


def sub(x: GL3, y: GL3) -> GL3:
    return GL3(gl.sub(x.c0, y.c0), gl.sub(x.c1, y.c1), gl.sub(x.c2, y.c2))


def neg(x: GL3) -> GL3:
    return GL3(gl.neg(x.c0), gl.neg(x.c1), gl.neg(x.c2))


def _mul_w(x: GL) -> GL:
    """x * 7 via adds."""
    x2 = gl.add(x, x)
    x4 = gl.add(x2, x2)
    return gl.add(gl.add(x4, x2), x)


def mul(x: GL3, y: GL3) -> GL3:
    """Karatsuba-style product mirroring extension.rs:330-390:

      c0 = a0 b0 + W ((a1+a2)(b1+b2) - a1 b1 - a2 b2)
      c1 = (a0+a1)(b0+b1) - a0 b0 - a1 b1 + W a2 b2
      c2 = (a0+a2)(b0+b2) - a0 b0 - a2 b2 + a1 b1
    """
    a0b0 = gl.mul(x.c0, y.c0)
    a1b1 = gl.mul(x.c1, y.c1)
    a2b2 = gl.mul(x.c2, y.c2)
    mid = gl.sub(
        gl.mul(gl.add(x.c1, x.c2), gl.add(y.c1, y.c2)),
        gl.add(a1b1, a2b2),
    )
    c0 = gl.add(a0b0, _mul_w(mid))
    c1 = gl.add(
        gl.sub(gl.mul(gl.add(x.c0, x.c1), gl.add(y.c0, y.c1)),
               gl.add(a0b0, a1b1)),
        _mul_w(a2b2),
    )
    c2 = gl.add(
        gl.sub(gl.mul(gl.add(x.c0, x.c2), gl.add(y.c0, y.c2)),
               gl.add(a0b0, a2b2)),
        a1b1,
    )
    return GL3(c0, c1, c2)


def square(x: GL3) -> GL3:
    return mul(x, x)


def inv(x: GL3) -> GL3:
    """Adjugate inverse (extension.rs:473-532):

      scalar = 1 / (a0^3 + W a1^3 + W^2 a2^3 - 3 W a0 a1 a2)
      result = scalar * [a0^2 - W a1 a2,  W a2^2 - a0 a1,  a1^2 - a0 a2]
    """
    a0, a1, a2 = x.c0, x.c1, x.c2
    a0sq = gl.square(a0)
    a1sq = gl.square(a1)
    a2w = _mul_w(a2)
    a0a1 = gl.mul(a0, a1)

    det = gl.sub(
        gl.add(
            gl.add(gl.mul(a0sq, a0), _mul_w(gl.mul(a1, a1sq))),
            gl.mul(gl.square(a2w), a2),
        ),
        gl.mul(gl.scale_small(a2w, 3), a0a1),
    )
    scalar = gl.inv(det)
    return GL3(
        gl.mul(scalar, gl.sub(a0sq, gl.mul(a1, a2w))),
        gl.mul(scalar, gl.sub(gl.mul(a2w, a2), a0a1)),
        gl.mul(scalar, gl.sub(a1sq, gl.mul(a0, a2))),
    )


def div(x: GL3, y: GL3) -> GL3:
    return mul(inv(y), x)


def eq(x: GL3, y: GL3):
    return gl.eq(x.c0, y.c0) & gl.eq(x.c1, y.c1) & gl.eq(x.c2, y.c2)


def mul_base(x: GL3, b: GL) -> GL3:
    return GL3(gl.mul(x.c0, b), gl.mul(x.c1, b), gl.mul(x.c2, b))


def monomial(exponent: int, shape=()) -> GL3:
    """1, X or X^2 (extension.rs:558-562, D=3 arm)."""
    cs = [gl.zeros(shape)] * 3
    cs[exponent] = gl.ones(shape)
    return GL3(*cs)


def stack(elems, axis=0):
    return GL3(
        gl.stack([e.c0 for e in elems], axis=axis),
        gl.stack([e.c1 for e in elems], axis=axis),
        gl.stack([e.c2 for e in elems], axis=axis),
    )


def broadcast_to(x: GL3, shape):
    return GL3(gl.broadcast_to(x.c0, shape), gl.broadcast_to(x.c1, shape),
               gl.broadcast_to(x.c2, shape))


class Ops:
    """GF(p^3) ops adapter for the backend-agnostic AIR folder — the D=3
    counterpart of extension.Ops, so the EXT_DEGREE choice is a matter of
    which adapter (and which opened-value packing) a verifier wires in
    (the reference selects by its EXT_DEGREE constant, p3/constants.rs)."""

    def __init__(self, shape=()):
        self._shape = shape

    @property
    def point_ndim(self):
        return len(self._shape)

    def add(self, x, y):
        return add(x, y)

    def sub(self, x, y):
        return sub(x, y)

    def mul(self, x, y):
        return mul(x, y)

    def zero(self):
        return zeros(self._shape)

    def one(self):
        return ones(self._shape)

    def from_base(self, b):
        if isinstance(b, GL):
            return from_base(b)
        z = gl.zeros(self._shape)
        return GL3(gl.full(self._shape, int(b)), z, z)

    @staticmethod
    def from_parts(a: GL3, b: GL3, c: GL3 = None) -> GL3:
        """a + X*b + X^2*c: view base trace columns as one GF(p^3) value
        (see extension.Ops.from_parts for why this is valid at every
        evaluation point)."""
        x = monomial(1, a.c0.shape)
        out = add(a, mul(x, b))
        if c is not None:
            out = add(out, mul(mul(x, x), c))
        return out

    @staticmethod
    def stack(vals):
        return stack(vals)

    @staticmethod
    def concat(vals):
        return GL3(
            gl.concatenate([v.c0 for v in vals], axis=0),
            gl.concatenate([v.c1 for v in vals], axis=0),
            gl.concatenate([v.c2 for v in vals], axis=0),
        )

    @staticmethod
    def take(vec: GL3, idx):
        import numpy as _np

        return vec[_np.asarray(idx)]

    def const_base(self, ints):
        c0 = gl.from_u64(list(ints))
        c0 = GL(
            c0.lo.reshape(c0.lo.shape + (1,) * self.point_ndim),
            c0.hi.reshape(c0.hi.shape + (1,) * self.point_ndim),
        )
        z = gl.zeros(c0.lo.shape)
        return GL3(c0, z, z)

    def fold_constraints(self, alpha: GL3, constraints) -> GL3:
        import jax as _jax
        from jax import lax as _lax

        if not constraints:
            return self.zero()
        pnd = self.point_ndim

        def norm(c: GL3) -> GL3:
            def fix(a):
                nd_extra = max(a.ndim - pnd, 0)
                lead = tuple(a.shape[:nd_extra]) if nd_extra else (1,)
                a = jnp.broadcast_to(a, lead + self._shape)
                return a.reshape((-1,) + self._shape)
            return _jax.tree.map(fix, c)

        rows = [norm(c) for c in constraints]
        stacked = _jax.tree.map(lambda *xs: jnp.concatenate(xs), *rows)

        def body(acc, c):
            return add(mul(acc, alpha), c), None

        acc, _ = _lax.scan(body, self.zero(), stacked)
        return acc
