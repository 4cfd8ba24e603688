"""GF(p^2) = GF(p)[X]/(X^2 - 7) arithmetic over planar GL limbs.

Mirrors the reference's quadratic-extension circuit algebra
(src/p3/extension.rs): W = 7, dth_root = p - 1, two-adic generator
g_32 = 1753635133440165772 with g_bits = g_32^(2^(32-bits)), and the
degree-2 inverse/mul formulas (extension.rs:304-321, 458-471).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import GOLDILOCKS_P as P, EXT_W, DTH_ROOT, TWO_ADIC_GENERATOR_32, TWO_ADICITY
from . import goldilocks as gl
from .goldilocks import GL


class GL2(NamedTuple):
    """A GF(p^2) array: two equally-shaped GL arrays (c0, c1)."""

    c0: GL
    c1: GL

    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx):
        return GL2(self.c0[idx], self.c1[idx])


def zeros(shape=()):
    return GL2(gl.zeros(shape), gl.zeros(shape))


def ones(shape=()):
    return GL2(gl.ones(shape), gl.zeros(shape))


def from_base(x: GL) -> GL2:
    """Embed base field into c0 (reference p3_field_to_arr, p3/mod.rs:143-147)."""
    return GL2(x, gl.zeros(jnp.shape(x.lo)))


def from_u64_pair(c0, c1) -> GL2:
    return GL2(gl.from_u64(c0), gl.from_u64(c1))


def to_u64_pair(x: GL2):
    return gl.to_u64(x.c0), gl.to_u64(x.c1)


def add(x: GL2, y: GL2) -> GL2:
    return GL2(gl.add(x.c0, y.c0), gl.add(x.c1, y.c1))


def sub(x: GL2, y: GL2) -> GL2:
    return GL2(gl.sub(x.c0, y.c0), gl.sub(x.c1, y.c1))


def neg(x: GL2) -> GL2:
    return GL2(gl.neg(x.c0), gl.neg(x.c1))


def add_base(x: GL2, b: GL) -> GL2:
    """x + b, b in base field (p3_ext_add_single, extension.rs:393-401)."""
    return GL2(gl.add(x.c0, b), x.c1)


def sub_base(x: GL2, b: GL) -> GL2:
    return GL2(gl.sub(x.c0, b), x.c1)


def mul_base(x: GL2, b: GL) -> GL2:
    return GL2(gl.mul(x.c0, b), gl.mul(x.c1, b))


def _mul_w(x: GL) -> GL:
    """x * 7 via adds (cheaper than a full field mul)."""
    x2 = gl.add(x, x)
    x4 = gl.add(x2, x2)
    return gl.add(gl.add(x4, x2), x)


def mul(x: GL2, y: GL2) -> GL2:
    """(a0 + a1 X)(b0 + b1 X) = (a0 b0 + 7 a1 b1) + (a0 b1 + a1 b0) X."""
    a0b0 = gl.mul(x.c0, y.c0)
    a1b1 = gl.mul(x.c1, y.c1)
    a0b1 = gl.mul(x.c0, y.c1)
    a1b0 = gl.mul(x.c1, y.c0)
    return GL2(gl.add(a0b0, _mul_w(a1b1)), gl.add(a0b1, a1b0))


def square(x: GL2) -> GL2:
    return mul(x, x)


def mul_add(x: GL2, y: GL2, z: GL2) -> GL2:
    return add(mul(x, y), z)


def inv(x: GL2) -> GL2:
    """1/x = conj(x) / norm(x), norm = c0^2 - 7 c1^2 (extension.rs:304-321)."""
    n = gl.sub(gl.square(x.c0), _mul_w(gl.square(x.c1)))
    scalar = gl.inv(n)
    return GL2(gl.mul(x.c0, scalar), gl.mul(gl.neg(x.c1), scalar))


def div(x: GL2, y: GL2) -> GL2:
    return mul(inv(y), x)


def exp_power_of_2(x: GL2, power_log: int) -> GL2:
    """x^(2^power_log); fori_loop keeps the graph at one squaring body."""
    if power_log <= 2:
        for _ in range(power_log):
            x = square(x)
        return x
    import jax

    return jax.lax.fori_loop(0, power_log, lambda _, v: square(v), x)


def frobenius(x: GL2) -> GL2:
    """x -> x^p: scale c1 by dth_root = p-1 (extension.rs:198-230)."""
    return GL2(x.c0, gl.mul(x.c1, gl.full(jnp.shape(x.c1.lo), DTH_ROOT)))


def select(mask, x: GL2, y: GL2) -> GL2:
    """p3_ext_if (extension.rs:185-196)."""
    return GL2(gl.select(mask, x.c0, y.c0), gl.select(mask, x.c1, y.c1))


def eq(x: GL2, y: GL2):
    return gl.eq(x.c0, y.c0) & gl.eq(x.c1, y.c1)


def monomial(exponent: int, shape=()) -> GL2:
    """1 or X (extension.rs:558-562)."""
    if exponent == 0:
        return ones(shape)
    if exponent == 1:
        return GL2(gl.zeros(shape), gl.ones(shape))
    raise ValueError("EXT_DEGREE == 2 supports monomials 0 and 1 only")


def two_adic_generator_int(bits: int) -> int:
    """Host-side base-field two-adic generator value."""
    assert 0 <= bits <= TWO_ADICITY
    return pow(TWO_ADIC_GENERATOR_32, 1 << (TWO_ADICITY - bits), P)


def ext_two_adic_generator_int(bits: int) -> tuple:
    """GF(p^2) two-adic generator as (c0, c1) host ints — the extension
    field's two-adicity is 33 (p3_ext_two_adic_generator, reference
    src/p3/extension.rs:159-171: the bits == 33 branch reverses the
    coefficient array, i.e. the generator lies on the X axis; note the
    reference's `32 - bits` exponent count underflows for 33 and is
    unreachable in its tests — the value used here is plonky3's
    ext_two_adic_generator constant, which equals the square root of
    g_32/7 (so (0, w)^2 = 7*w^2 = g_32, giving exact order 2^33; the
    derivation is checked in tests/test_extension.py)."""
    assert 0 <= bits <= TWO_ADICITY + 1
    if bits == TWO_ADICITY + 1:
        return (0, 15659105665374529263)
    return (two_adic_generator_int(bits), 0)


def broadcast_to(x: GL2, shape):
    return GL2(gl.broadcast_to(x.c0, shape), gl.broadcast_to(x.c1, shape))


def stack(elems, axis=0):
    return GL2(
        gl.stack([e.c0 for e in elems], axis=axis),
        gl.stack([e.c1 for e in elems], axis=axis),
    )


def concat(elems, axis=0):
    return GL2(
        gl.concatenate([e.c0 for e in elems], axis=axis),
        gl.concatenate([e.c1 for e in elems], axis=axis),
    )


class Ops:
    """GF(p^2) ops adapter for the backend-agnostic AIR folder
    (plonky25_tpu.air.VerifierConstraintFolder).

    `shape` is the evaluation-point shape: () when folding at a single
    zeta (verifier), (n_points,) when the prover folds over a domain.
    Constraint values may carry extra LEADING axes - vector constraints
    from wide AIRs - which fold as consecutive constraints in index order."""

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
        return GL2(gl.full(self._shape, int(b)), gl.zeros(self._shape))

    @staticmethod
    def from_parts(a: GL2, b: GL2) -> GL2:
        """a + X*b: view two base trace columns (a, b) as one GF(p^2)
        value.  Valid at EVERY evaluation point: on base points (quotient
        domain) a, b have c1 = 0 and this reduces to (a0, b0); at an ext
        point zeta the column openings are full ext values and the X-mul
        keeps the algebra consistent (X*b = (7*b1, b0))."""
        return GL2(gl.add(a.c0, _mul_w(b.c1)), gl.add(a.c1, b.c0))

    # ---- vector helpers (constraint axis = axis 0) -----------------------
    @staticmethod
    def stack(vals):
        return stack(vals)

    @staticmethod
    def concat(vals):
        """Concatenate along the constraint axis (axis 0)."""
        return GL2(
            gl.concatenate([v.c0 for v in vals], axis=0),
            gl.concatenate([v.c1 for v in vals], axis=0),
        )

    @staticmethod
    def take(vec: GL2, idx):
        import numpy as _np

        return vec[_np.asarray(idx)]

    def const_base(self, ints):
        c0 = gl.from_u64(list(ints))
        c0 = GL(
            c0.lo.reshape(c0.lo.shape + (1,) * self.point_ndim),
            c0.hi.reshape(c0.hi.shape + (1,) * self.point_ndim),
        )
        return GL2(c0, gl.zeros(c0.lo.shape))

    def fold_constraints(self, alpha: GL2, constraints) -> GL2:
        """acc = acc*alpha + c_i over the flattened constraint sequence, as
        ONE lax.scan body — long dependent mul chains at trace level blow up
        XLA compile time."""
        import jax

        if not constraints:
            return self.zero()
        import jax as _jax

        pnd = self.point_ndim

        def norm(c: GL2) -> GL2:
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

        acc, _ = jax.lax.scan(body, self.zero(), stacked)
        return acc
