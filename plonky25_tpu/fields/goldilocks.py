"""Goldilocks field arithmetic on TPU: planar 2 x uint32 limb representation.

TPU vector units have no 64-bit integer datapath, so a field element is a
pair of uint32 arrays (lo, hi) — a *planar* layout (two separate arrays, not
an interleaved trailing axis) so that lanes stay contiguous and VPU-friendly.
Every op keeps values **canonical** (in [0, p)), which makes equality a plain
limb compare and keeps the semantics identical to the reference's
GoldilocksField (upstream plonky2; reduction rule as in p3_constant,
reference src/p3/mod.rs:51-56).

The same code runs as pure jnp (XLA fuses it well) and inside Pallas kernel
bodies (refs hand in uint32 blocks; these helpers are shape-agnostic).

Key identities used by the reduction (p = 2^64 - 2^32 + 1):
    2^64 ≡ 2^32 - 1 =: EPSILON  (mod p)
    2^96 ≡ -1                   (mod p)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..constants import GOLDILOCKS_P as P, GOLDILOCKS_EPSILON as EPSILON

U32 = jnp.uint32
MASK32 = np.uint32(0xFFFFFFFF)
_EPS = np.uint32(EPSILON)


class GL(NamedTuple):
    """A Goldilocks array: two equally-shaped uint32 arrays (lo, hi)."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.lo)

    def __getitem__(self, idx):
        """Array indexing/slicing (NOT tuple-field access; unpack for that)."""
        return GL(self.lo[idx], self.hi[idx])

    def reshape(self, *shape):
        return GL(self.lo.reshape(*shape), self.hi.reshape(*shape))


# ------------------------------------------------------------------ helpers

def _u32(x):
    return jnp.asarray(x, dtype=U32)


def _adc(a, b):
    """a + b (uint32) -> (sum, carry) with carry in {0,1} as uint32."""
    s = a + b
    return s, (s < a).astype(U32)


def _mul32(a, b):
    """u32 x u32 -> 64-bit product as (lo, hi) uint32 via 16-bit limbs."""
    al = a & jnp.uint32(0xFFFF)
    ah = a >> 16
    bl = b & jnp.uint32(0xFFFF)
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    carry_mid = (mid < lh).astype(U32)          # overflow of lh+hl => +2^48
    lo = ll + (mid << 16)
    c_lo = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (carry_mid << 16) + c_lo
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """64-bit add -> (lo, hi, carry_out)."""
    lo, c0 = _adc(alo, blo)
    hi1, c1 = _adc(ahi, bhi)
    hi, c2 = _adc(hi1, c0)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(U32)
    return lo, hi, b1 | b2


def _canonicalize64(lo, hi):
    """Reduce a value < 2^64 into [0, p): one conditional subtract of p.

    t = x + EPSILON carries out of 64 bits  <=>  x >= p, and then the wrapped
    t equals x - p."""
    tlo, thi, c = _add64(lo, hi, _EPS, jnp.uint32(0))
    ge = c.astype(bool)
    return jnp.where(ge, tlo, lo), jnp.where(ge, thi, hi)


def _reduce128(x0, x1, x2, x3):
    """Reduce a 128-bit value (four u32 words, little-endian) mod p, canonical.

    x ≡ (x1:x0) + x2·EPSILON - x3  (mod p), using 2^64 ≡ EPSILON, 2^96 ≡ -1.
    Mirrors the canonicity analysis of the reference's U32ArithmeticGate
    (src/common/u32/gates/arithmetic_u32.rs:119-140): edge cases live at the
    wraparound corrections below.
    """
    # B = x2 * EPSILON = (x2 << 32) - x2, always < 2^64
    nz = (x2 != 0).astype(U32)
    blo = jnp.uint32(0) - x2
    bhi = x2 - nz
    # S = (x1:x0) + B  (+ EPSILON again if it carried; cannot re-carry since
    #  S_wrapped <= 2^64 - 2^33 in the carry case)
    slo, shi, cs = _add64(x0, x1, blo, bhi)
    slo2, cc = _adc(slo, _EPS)
    shi2 = shi + cc
    carried = cs.astype(bool)
    slo = jnp.where(carried, slo2, slo)
    shi = jnp.where(carried, shi2, shi)
    # T = S - x3  (- EPSILON more on borrow; cannot re-borrow since the
    #  wrapped value is >= 2^64 - 2^32 in the borrow case)
    tlo, thi, tb = _sub64(slo, shi, x3, jnp.uint32(0))
    wlo = tlo - _EPS
    wb = (tlo < _EPS).astype(U32)
    whi = thi - wb
    borrowed = tb.astype(bool)
    tlo = jnp.where(borrowed, wlo, tlo)
    thi = jnp.where(borrowed, whi, thi)
    return _canonicalize64(tlo, thi)


# ------------------------------------------------------------------ public ops

def zeros(shape=()):
    z = jnp.zeros(shape, dtype=U32)
    return GL(z, z)


def ones(shape=()):
    return GL(jnp.ones(shape, dtype=U32), jnp.zeros(shape, dtype=U32))


def full(shape, value: int):
    value %= P
    return GL(
        jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=U32),
        jnp.full(shape, np.uint32(value >> 32), dtype=U32),
    )


def constant(value: int):
    """Scalar constant, reduced mod p (reference p3_constant, p3/mod.rs:51-56)."""
    return full((), value)


def from_u64(values) -> GL:
    """Host-side: numpy array / nested list / int of python ints -> canonical GL.

    Numeric numpy dtypes take a vectorized path (object arrays of python
    ints loop per element — prohibitive for 10M-element Keccak traces)."""
    # Fast path ONLY for pre-formed integer ndarrays: coercing python-int
    # lists through np.asarray silently promotes mixed-magnitude values to
    # float64 and loses precision, so lists always take the exact path.
    if (isinstance(values, np.ndarray) and values.dtype != object
            and np.issubdtype(values.dtype, np.integer)
            and not (np.issubdtype(values.dtype, np.signedinteger)
                     and values.size and values.min() < 0)):
        a = values.astype(np.uint64) % np.uint64(P)
        lo = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (a >> np.uint64(32)).astype(np.uint32)
        return GL(jnp.asarray(lo), jnp.asarray(hi))
    arr = np.asarray(values, dtype=object)
    shape = arr.shape
    flat = [int(v) % P for v in np.asarray(arr, dtype=object).reshape(-1)]
    lo = np.asarray([v & 0xFFFFFFFF for v in flat], dtype=np.uint32).reshape(shape)
    hi = np.asarray([v >> 32 for v in flat], dtype=np.uint32).reshape(shape)
    return GL(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(x: GL) -> np.ndarray:
    """Host-side: GL -> numpy object array of python ints (for tests)."""
    lo = np.asarray(x.lo, dtype=np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint64)
    return (hi.astype(object) * (1 << 32)) + lo.astype(object)


def to_u64_np(x: GL) -> np.ndarray:
    """Host-side: GL -> numpy uint64 array (canonical values fit)."""
    lo = np.asarray(x.lo, dtype=np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def add(a: GL, b: GL) -> GL:
    lo, hi, c = _add64(a.lo, a.hi, b.lo, b.hi)
    # s >= p  <=>  s + EPSILON >= 2^64 (counting the 65th bit c)
    tlo, thi, c2 = _add64(lo, hi, _EPS, jnp.uint32(0))
    ge = (c | c2).astype(bool)
    return GL(jnp.where(ge, tlo, lo), jnp.where(ge, thi, hi))


def sub(a: GL, b: GL) -> GL:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # on borrow, result += p, i.e. wrapped -= EPSILON
    wlo = lo - _EPS
    wb = (lo < _EPS).astype(U32)
    whi = hi - wb
    bb = borrow.astype(bool)
    return GL(jnp.where(bb, wlo, lo), jnp.where(bb, whi, hi))


def neg(a: GL) -> GL:
    return sub(zeros(jnp.shape(a.lo)), a)


def mul(a: GL, b: GL) -> GL:
    l00, h00 = _mul32(a.lo, b.lo)
    l01, h01 = _mul32(a.lo, b.hi)
    l10, h10 = _mul32(a.hi, b.lo)
    l11, h11 = _mul32(a.hi, b.hi)
    x0 = l00
    t1, c1a = _adc(h00, l01)
    x1, c1b = _adc(t1, l10)
    c1 = c1a + c1b
    t2, c2a = _adc(h01, h10)
    t2b, c2b = _adc(t2, l11)
    x2, c2c = _adc(t2b, c1)
    x3 = h11 + c2a + c2b + c2c
    return GL(*_reduce128(x0, x1, x2, x3))


def square(a: GL) -> GL:
    return mul(a, a)


def mul_add(a: GL, b: GL, c: GL) -> GL:
    return add(mul(a, b), c)


def select(mask, a: GL, b: GL) -> GL:
    """mask ? a : b (mask: boolean array broadcastable to the operands)."""
    return GL(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def eq(a: GL, b: GL):
    """Canonical equality -> boolean array."""
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GL):
    return (a.lo == 0) & (a.hi == 0)


def double(a: GL) -> GL:
    return add(a, a)


def scale_small(a: GL, k: int) -> GL:
    """Multiply by a tiny static constant via adds (k in {2,3,4})."""
    if k == 2:
        return add(a, a)
    if k == 3:
        return add(add(a, a), a)
    if k == 4:
        d = add(a, a)
        return add(d, d)
    raise ValueError(k)


def pow_const(a: GL, e: int) -> GL:
    """a^e for a static Python-int exponent (square-and-multiply, unrolled
    at trace time)."""
    if e == 0:
        return ones(jnp.shape(a.lo))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inv(a: GL) -> GL:
    """a^(p-2); canonical.  Addition chain built on the structure of
    p - 2 = (2^31 - 1)·2^33 + (2^32 - 1): ~72 squarings + 9 muls instead of
    the naive 63 + 62 double-and-add."""
    a1 = a
    a2 = mul(square(a1), a1)                    # a^(2^2-1)
    a3 = mul(square(a2), a1)                    # a^(2^3-1)
    a6 = mul(_sqn(a3, 3), a3)                   # a^(2^6-1)
    a12 = mul(_sqn(a6, 6), a6)                  # a^(2^12-1)
    a24 = mul(_sqn(a12, 12), a12)               # a^(2^24-1)
    a30 = mul(_sqn(a24, 6), a6)                 # a^(2^30-1)
    a31 = mul(square(a30), a1)                  # a^(2^31-1)
    a32 = mul(square(a31), a1)                  # a^(2^32-1)
    left = _sqn(a31, 33)                        # a^((2^31-1)·2^33)
    return mul(left, a32)


def _sqn(x: GL, n: int) -> GL:
    """x^(2^n); fori_loop keeps the traced graph at one squaring body."""
    if n <= 2:
        for _ in range(n):
            x = square(x)
        return x
    import jax
    return jax.lax.fori_loop(0, n, lambda _, v: square(v), x)


def div(a: GL, b: GL) -> GL:
    return mul(a, inv(b))


def pow_u32(base_int: int, exp_u32, nbits: int) -> GL:
    """base^exp with a *static* integer base and a traced uint32 exponent of
    at most `nbits` significant bits.

    Replaces the reference's in-circuit 64-bit `exp` (verifier.rs:309,433)
    with a table of base^(2^k) constants and a masked product — TPU-friendly
    (static shapes, no data-dependent control flow; fori_loop keeps the
    traced graph at one multiply body)."""
    import jax

    exp_u32 = _u32(exp_u32)
    table_vals = []
    b = base_int % P
    for _ in range(nbits):
        table_vals.append(b)
        b = (b * b) % P
    table = from_u64(table_vals)  # (nbits,)
    shape = jnp.shape(exp_u32)

    def body(k, acc):
        bit = ((exp_u32 >> k.astype(U32)) & jnp.uint32(1)).astype(bool)
        pk = broadcast_to(table[k], shape)
        return select(bit, mul(acc, pk), acc)

    return jax.lax.fori_loop(0, nbits, body, ones(shape))


def stack(elems, axis=0):
    return GL(
        jnp.stack([e.lo for e in elems], axis=axis),
        jnp.stack([e.hi for e in elems], axis=axis),
    )


def concatenate(elems, axis=0):
    return GL(
        jnp.concatenate([e.lo for e in elems], axis=axis),
        jnp.concatenate([e.hi for e in elems], axis=axis),
    )


def broadcast_to(x: GL, shape):
    return GL(jnp.broadcast_to(x.lo, shape), jnp.broadcast_to(x.hi, shape))
