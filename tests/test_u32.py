"""u32/u64 gadget-semantics parity tests (reference: the gadget round-trip
tables of src/common/u32/gadgets/* — xor/and/not/shift/rotate, add-many,
sub-with-borrow, comparisons, bit-reversal — SURVEY.md §4 layer 2, plus the
interleave-add trick of interleaved_u32.rs:193-224 checked for real).

Oracle: plain Python int semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky25_tpu.ops import u32 as u

M32 = (1 << 32) - 1
M64 = (1 << 64) - 1


def _r32(rng, n=64):
    return [rng.randrange(0, 1 << 32) for _ in range(n)]


def _pairs64(rng, n=64):
    return ([rng.randrange(0, 1 << 64) for _ in range(n)],
            [rng.randrange(0, 1 << 64) for _ in range(n)])


def _split(xs):
    a = np.asarray(xs, np.uint64)
    return (jnp.asarray(a.astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def _join(pair):
    lo, hi = (np.asarray(pair[0], np.uint64), np.asarray(pair[1], np.uint64))
    return ((hi << np.uint64(32)) | lo).tolist()


def test_mul_add_u32(rng):
    xs, ys, zs = _r32(rng), _r32(rng), _r32(rng)
    lo, hi = u.mul_add_u32(jnp.asarray(xs, jnp.uint32),
                           jnp.asarray(ys, jnp.uint32),
                           jnp.asarray(zs, jnp.uint32))
    got = _join((lo, hi))
    want = [(x * y + z) & M64 for x, y, z in zip(xs, ys, zs)]
    assert got == want


def test_add_many_u32(rng):
    cols = [_r32(rng, 32) for _ in range(24)]  # up to 24 addends (add_many_u32.rs)
    res, carry = u.add_many_u32([jnp.asarray(c, jnp.uint32) for c in cols])
    for i in range(32):
        total = sum(c[i] for c in cols)
        assert int(res[i]) == total & M32
        assert int(carry[i]) == total >> 32


def test_sub_u32(rng):
    xs, ys = _r32(rng), _r32(rng)
    for borrow_in in (0, 1):
        d, b = u.sub_u32(jnp.asarray(xs, jnp.uint32),
                         jnp.asarray(ys, jnp.uint32), borrow_in)
        for i in range(len(xs)):
            t = xs[i] - ys[i] - borrow_in
            assert int(d[i]) == t & M32
            assert int(b[i]) == (1 if t < 0 else 0)


def test_comparisons(rng):
    xs, ys = _r32(rng), _r32(rng)
    le = u.is_le_u32(jnp.asarray(xs, jnp.uint32), jnp.asarray(ys, jnp.uint32))
    assert [bool(v) for v in le] == [x <= y for x, y in zip(xs, ys)]


def test_list_le_lexicographic(rng):
    # little-endian limb lists, mirroring list_le_circuit semantics
    for _ in range(50):
        n = rng.randrange(1, 5)
        a = [rng.randrange(0, 1 << 32) for _ in range(n)]
        b = [rng.randrange(0, 4) for _ in range(n)] if rng.random() < 0.3 \
            else [rng.randrange(0, 1 << 32) for _ in range(n)]
        av = sum(x << (32 * i) for i, x in enumerate(a))
        bv = sum(x << (32 * i) for i, x in enumerate(b))
        got = bool(u.list_le([jnp.uint32(x) for x in a],
                             [jnp.uint32(x) for x in b]))
        assert got == (av <= bv)
    assert bool(u.list_le([jnp.uint32(5)], [jnp.uint32(5)]))  # equality => le


def test_range_check(rng):
    assert bool(u.range_check_u32(jnp.uint32(255), 8))
    assert not bool(u.range_check_u32(jnp.uint32(256), 8))
    assert bool(u.range_check_u32(jnp.uint32(0xFFFFFFFF), 32))


def test_bitwise_u64(rng):
    xs, ys = _pairs64(rng)
    x, y = _split(xs), _split(ys)
    assert _join(u.and_u64(x, y)) == [a & b for a, b in zip(xs, ys)]
    assert _join(u.xor_u64(x, y)) == [a ^ b for a, b in zip(xs, ys)]


def test_not_u32(rng):
    xs = _r32(rng)
    got = u.not_u32(jnp.asarray(xs, jnp.uint32))
    assert [int(v) for v in got] == [x ^ M32 for x in xs]


@pytest.mark.parametrize("n", [0, 1, 7, 31, 32, 33, 63])
def test_shifts_and_rotates(rng, n):
    xs, _ = _pairs64(rng, 16)
    x = _split(xs)
    assert _join(u.lsh_u64(x, n)) == [(v << n) & M64 for v in xs]
    assert _join(u.rsh_u64(x, n)) == [v >> n for v in xs]
    assert _join(u.rol_u64(x, n)) == [
        ((v << n) | (v >> (64 - n))) & M64 if n % 64 else v for v in xs
    ]


def test_bit_reversal(rng):
    xs = _r32(rng, 32)
    got = u.reverse_u32(jnp.asarray(xs, jnp.uint32))
    want = [int(f"{x:032b}"[::-1], 2) for x in xs]
    assert [int(v) for v in got] == want

    xs64, _ = _pairs64(rng, 16)
    got64 = _join(u.reverse_u64(_split(xs64)))
    assert got64 == [int(f"{x:064b}"[::-1], 2) for x in xs64]


def test_reverse_bits_len(rng):
    for bits in (1, 3, 7, 12, 31):
        vals = [rng.randrange(0, 1 << bits) for _ in range(16)]
        got = u.reverse_bits_len_u32(jnp.asarray(vals, jnp.uint32), bits)
        want = [int(f"{v:0{bits}b}"[::-1], 2) for v in vals]
        assert [int(v) for v in got] == want


def test_interleave_add_trick(rng):
    """The reference's bitwise engine: interleave both operands, add, and
    read AND from odd bits / XOR from even bits (interleaved_u32.rs:193-224).
    Checked functionally against int semantics."""
    xs, ys = _r32(rng, 32), _r32(rng, 32)
    x_and, x_xor = u.and_xor_u32(jnp.asarray(xs, jnp.uint32),
                                 jnp.asarray(ys, jnp.uint32))
    assert [int(v) for v in x_and] == [a & b for a, b in zip(xs, ys)]
    assert [int(v) for v in x_xor] == [a ^ b for a, b in zip(xs, ys)]


def test_interleave_roundtrip(rng):
    xs = _r32(rng, 32)
    spread = u.interleave_u32(jnp.asarray(xs, jnp.uint32))
    # even bits hold x, odd bits zero
    as_int = _join(spread)
    for x, s in zip(xs, as_int):
        assert s & 0xAAAAAAAAAAAAAAAA == 0
        got = 0
        for i in range(32):
            got |= ((s >> (2 * i)) & 1) << i
        assert got == x


def test_add_u32s_with_carry(rng):
    """arithmetic_u32.rs:213-239 semantics: sum + input carry, multi-bit
    output carry."""
    for n in (1, 2, 5, 24):
        xs = [_r32(rng, 8) for _ in range(n)]
        carry = _r32(rng, 8)
        res, cout = u.add_u32s_with_carry(
            [jnp.asarray(x, jnp.uint32) for x in xs],
            jnp.asarray(carry, jnp.uint32))
        for k in range(8):
            total = sum(x[k] for x in xs) + carry[k]
            assert int(res[k]) == total % (1 << 32)
            assert int(cout[k]) == total >> 32


def test_select_u32(rng):
    xs, ys = _r32(rng, 16), _r32(rng, 16)
    bs = [rng.randrange(2) for _ in range(16)]
    got = u.select_u32(jnp.asarray(bs, bool),
                       jnp.asarray(xs, jnp.uint32), jnp.asarray(ys, jnp.uint32))
    assert [int(v) for v in got] == [x if b else y
                                     for b, x, y in zip(bs, xs, ys)]


def test_unsafe_xor_many(rng):
    """interleaved_u32.rs:157-236 semantics — including the reference's own
    documented failure case (three 0xffffffff inputs alias to 0x0000fffe in
    the circuit); the native TPU op is exact, so we assert the TRUE xor."""
    for n in (0, 1, 2, 3, 4, 7, 12):
        xs = [_r32(rng, 8) for _ in range(n)]
        got = u.unsafe_xor_many_u32([jnp.asarray(x, jnp.uint32) for x in xs])
        if n == 0:
            assert int(got) == 0
            continue
        for k in range(8):
            want = 0
            for x in xs:
                want ^= x[k]
            assert int(got[k]) == want
    # the adversarial case from interleaved_u32.rs:147-156: exact here
    trip = [jnp.full((1,), 0xFFFFFFFF, jnp.uint32)] * 3
    assert int(u.unsafe_xor_many_u32(trip)[0]) == 0xFFFFFFFF

    lo = u.unsafe_xor_many_u64(
        [(jnp.asarray([3], jnp.uint32), jnp.asarray([5], jnp.uint32)),
         (jnp.asarray([6], jnp.uint32), jnp.asarray([9], jnp.uint32))])
    assert (int(lo[0][0]), int(lo[1][0])) == (5, 12)
