"""u32/u64 integer ops used by the verifier's index arithmetic, plus the
API-parity surface of the reference's u32 gadget library.

On TPU these are single VPU int ops - the reference needed interleave/
uninterleave gates and bit-decomposition wires to express them as
constraints (src/common/u32/gadgets/interleaved_u32.rs, .../binary_u32.rs);
here the *semantics* are kept and the machinery disappears (SURVEY.md §2.1).

u64 values are (lo, hi) uint32 pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _u(x):
    return jnp.asarray(x, U32)


# --------------------------------------------------------------- u32 ops
# reference: src/common/u32/gadgets/arithmetic_u32.rs

def mul_add_u32(x, y, z=None):
    """x*y + z on u32 -> (lo, hi) u32 (U32ArithmeticGate semantics,
    arithmetic_u32.rs:162-178)."""
    x, y = _u(x), _u(y)
    xl = x & jnp.uint32(0xFFFF)
    xh = x >> 16
    yl = y & jnp.uint32(0xFFFF)
    yh = y >> 16
    ll = xl * yl
    mid = xl * yh + xh * yl  # may wrap
    carry_mid = (mid < xl * yh).astype(U32)
    lo = ll + (mid << 16)
    c_lo = (lo < ll).astype(U32)
    hi = xh * yh + (mid >> 16) + (carry_mid << 16) + c_lo
    if z is not None:
        z = _u(z)
        lo2 = lo + z
        hi = hi + (lo2 < lo).astype(U32)
        lo = lo2
    return lo, hi


def add_many_u32(xs):
    """Sum of u32 values -> (result u32, carry u32) (U32AddManyGate,
    add_many_u32.rs)."""
    total = _u(0)
    carry = _u(0)
    for x in xs:
        s = total + _u(x)
        carry = carry + (s < total).astype(U32)
        total = s
    return total, carry


def add_u32s_with_carry(to_add, carry):
    """Sum of u32 values plus an input carry -> (result u32, carry_out u32)
    (arithmetic_u32.rs:213-239: one U32AddManyGate with a carry input; the
    output carry counts 2^32 wraps, up to ~4 bits for 24 addends)."""
    total, c = add_many_u32(list(to_add) + [carry])
    return total, c


def select_u32(b, x, y):
    """b ? x : y (arithmetic_u32.rs:266-268)."""
    return jnp.where(jnp.asarray(b, bool), _u(x), _u(y))


def sub_u32(x, y, borrow=0):
    """x - y - borrow -> (result u32, borrow_out in {0,1})
    (U32SubtractionGate, subtraction_u32.rs)."""
    x, y, borrow = _u(x), _u(y), _u(borrow)
    d = x - y
    b1 = (x < y).astype(U32)
    d2 = d - borrow
    b2 = (d < borrow).astype(U32)
    return d2, jnp.minimum(b1 + b2, _u(1))


def is_le_u32(x, y):
    """x <= y (ComparisonGate semantics, comparison.rs)."""
    return _u(x) <= _u(y)


def list_le(xs, ys):
    """Lexicographic (little-endian limb order) xs <= ys
    (multiple_comparison.rs:16-68)."""
    result = jnp.asarray(True)
    for x, y in zip(xs, ys):  # limbs little-endian: later limbs dominate
        x, y = _u(x), _u(y)
        result = jnp.where(x == y, result, x < y)
    return result


def range_check_u32(x, bits=32):
    """Value fits in `bits` bits (U32RangeCheckGate semantics)."""
    if bits >= 32:
        return jnp.ones(jnp.shape(x), bool)
    return _u(x) < (jnp.uint32(1) << bits)


# --------------------------------------------------------------- u64 ops
# reference: p3_and/p3_xor/p3_lsh/p3_rsh (src/p3/mod.rs:96-126) built from
# interleaved gadgets; native here.

def and_u64(a, b):
    return (a[0] & b[0], a[1] & b[1])


def xor_u64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def not_u32(x):
    """0xFFFFFFFF - x (interleaved_u32.rs:60-64)."""
    return jnp.uint32(0xFFFFFFFF) - _u(x)


def lsh_u64(a, n: int):
    """Logical left shift by a static amount (interleaved_u32.rs:226-290)."""
    lo, hi = _u(a[0]), _u(a[1])
    if n == 0:
        return lo, hi
    if n >= 64:
        z = jnp.zeros_like(lo)
        return z, z
    if n >= 32:
        return jnp.zeros_like(lo), lo << (n - 32)
    return lo << n, (hi << n) | (lo >> (32 - n))


def rsh_u64(a, n: int):
    """Logical right shift by a static amount."""
    lo, hi = _u(a[0]), _u(a[1])
    if n == 0:
        return lo, hi
    if n >= 64:
        z = jnp.zeros_like(lo)
        return z, z
    if n >= 32:
        return hi >> (n - 32), jnp.zeros_like(hi)
    return (lo >> n) | (hi << (32 - n)), hi >> n


def rol_u64(a, n: int):
    n %= 64
    llo, lhi = lsh_u64(a, n)
    rlo, rhi = rsh_u64(a, 64 - n) if n else (jnp.zeros_like(a[0]),) * 2
    return llo | rlo, lhi | rhi


def reverse_u32(x):
    """Bit-reverse a uint32 (Bin32 reverse semantics, binary_u32.rs:60-75)
    via 5 masked swap stages - a handful of VPU ops instead of 32 bit wires."""
    x = _u(x)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def reverse_u64(a):
    """Bit-reverse a u64 pair (reverse_p3, p3/mod.rs:128-136)."""
    return reverse_u32(a[1]), reverse_u32(a[0])


def reverse_bits_len_u32(x, bit_len: int):
    """Reverse the low `bit_len` bits (reverse_p3_bits_len,
    p3/mod.rs:138-141); x must fit in bit_len bits."""
    return reverse_u32(x) >> (32 - bit_len) if bit_len else _u(x) * 0


# ------------------------------------------------------- interleave parity
# The reference's bitwise engine spreads u32 bits to even positions of a u64
# so that an addition computes AND (even bits) and XOR (odd bits)
# (interleaved_u32.rs:193-224).  Provided for API parity / tests.

def interleave_u32(x):
    """Spread bits of x to even positions -> u64 pair (B32 form)."""
    def spread16(v):
        v = _u(v) & jnp.uint32(0xFFFF)
        v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x33333333)
        v = (v | (v << 1)) & jnp.uint32(0x55555555)
        return v
    x = _u(x)
    return spread16(x), spread16(x >> 16)


def uninterleave_to_u32(d):
    """Inverse of interleave on a 'dirty' sum of two B32 values: per 2-bit
    group a+b has the XOR bit at the even position and the AND carry at the
    odd position (UninterleaveToU32Gate semantics)."""
    def collect(v):
        v = _u(v) & jnp.uint32(0x55555555)
        v = (v | (v >> 1)) & jnp.uint32(0x33333333)
        v = (v | (v >> 2)) & jnp.uint32(0x0F0F0F0F)
        v = (v | (v >> 4)) & jnp.uint32(0x00FF00FF)
        v = (v | (v >> 8)) & jnp.uint32(0x0000FFFF)
        return v
    lo, hi = d
    x_xor = collect(lo) | (collect(hi) << 16)
    x_and = collect(_u(lo) >> 1) | (collect(_u(hi) >> 1) << 16)
    return x_and, x_xor


def unsafe_xor_many_u32(xs):
    """Multi-input XOR (interleaved_u32.rs:157-191).

    The reference computes this through sums of interleaved values and
    documents a soundness caveat: three-plus interleaved addends can exceed
    the Goldilocks modulus and alias a wrong XOR (e.g. 0xffffffff^3 ->
    0x0000fffe).  On TPU the op is a native xor-reduce, so the caveat
    VANISHES — the 'unsafe_' name is kept for API parity only."""
    if len(xs) == 0:
        return jnp.uint32(0)
    acc = _u(xs[0])
    for x in xs[1:]:
        acc = acc ^ _u(x)
    return acc


def unsafe_xor_many_u64(xs):
    """Multi-input XOR on (lo, hi) u64 pairs (interleaved_u32.rs:237-250);
    native per-limb xor-reduce here (same safety note as the u32 form)."""
    return (unsafe_xor_many_u32([a[0] for a in xs]),
            unsafe_xor_many_u32([a[1] for a in xs]))


def and_xor_u32(x, y):
    """AND and XOR of two u32 via the interleave-add trick - semantics check
    for the reference's and_xor_u32 (interleaved_u32.rs:193-224)."""
    xi_lo, xi_hi = interleave_u32(x)
    yi_lo, yi_hi = interleave_u32(y)
    s_lo = xi_lo + yi_lo
    carry = (s_lo < xi_lo).astype(U32)
    s_hi = xi_hi + yi_hi + carry
    return uninterleave_to_u32((s_lo, s_hi))
