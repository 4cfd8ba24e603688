"""GF(p^2) ops vs the plain-int oracle (reference: src/p3/extension.rs)."""

import random

import pytest

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.fields import gl2
from plonky25_tpu.refimpl.field import Gl2


@pytest.fixture(scope="module")
def epairs():
    rng = random.Random(777)
    ps = [((rng.randrange(P), rng.randrange(P)), (rng.randrange(P), rng.randrange(P)))
          for _ in range(200)]
    ps += [((0, 0), (1, 0)), ((1, 0), (0, 1)), ((P - 1, P - 1), (P - 1, 1))]
    return ps


def _xy(epairs):
    X = gl2.from_u64_pair([x[0] for x, _ in epairs], [x[1] for x, _ in epairs])
    Y = gl2.from_u64_pair([y[0] for _, y in epairs], [y[1] for _, y in epairs])
    return X, Y


def _check(got, want):
    g0, g1 = gl2.to_u64_pair(got)
    assert [(a, b) for a, b in zip(g0, g1)] == list(want)


def test_mul(epairs):
    X, Y = _xy(epairs)
    _check(gl2.mul(X, Y), [Gl2.mul(x, y) for x, y in epairs])


def test_add_sub_neg(epairs):
    X, Y = _xy(epairs)
    _check(gl2.add(X, Y), [Gl2.add(x, y) for x, y in epairs])
    _check(gl2.sub(X, Y), [Gl2.sub(x, y) for x, y in epairs])
    _check(gl2.neg(X), [Gl2.neg(x) for x, _ in epairs])


def test_inv_div(epairs):
    nz = [(x if x != (0, 0) else (1, 0), y if y != (0, 0) else (1, 0))
          for x, y in epairs]
    X, Y = _xy(nz)
    _check(gl2.inv(X), [Gl2.inv(x) for x, _ in nz])
    _check(gl2.div(X, Y), [Gl2.div(x, y) for x, y in nz])


def test_exp_power_of_2(epairs):
    X, _ = _xy(epairs)
    _check(gl2.exp_power_of_2(X, 6),
           [Gl2.exp_power_of_2(x, 6) for x, _ in epairs])


def test_frobenius(epairs):
    X, _ = _xy(epairs)
    _check(gl2.frobenius(X), [Gl2.frobenius(x) for x, _ in epairs])


def test_two_adic_generator_int():
    from plonky25_tpu.refimpl.field import Gl
    for bits in (1, 2, 6, 7, 20, 32):
        g = gl2.two_adic_generator_int(bits)
        assert g == Gl.two_adic_generator(bits)
        assert pow(g, 1 << bits, P) == 1
        assert pow(g, 1 << (bits - 1), P) != 1


# ---------------------------------------------------------------- degree 3
# API-parity cubic extension (extension.rs:330-390 mul, :473-532 inverse).

def _gl3_mul_int(a, b):
    """Schoolbook GF(p^3) = GF(p)[X]/(X^3-7) product on int triples."""
    W = 7
    c = [0, 0, 0, 0, 0]
    for i in range(3):
        for j in range(3):
            c[i + j] = (c[i + j] + a[i] * b[j]) % P
    return ((c[0] + W * c[3]) % P, (c[1] + W * c[4]) % P, c[2] % P)


def test_w_is_not_a_cube():
    # X^3 - 7 is irreducible over Goldilocks iff 7 is a non-cube
    assert pow(7, (P - 1) // 3, P) != 1


def test_gl3_mul_matches_schoolbook():
    from plonky25_tpu.fields import extension3 as gl3

    rng = random.Random(31337)
    triples = [
        (tuple(rng.randrange(P) for _ in range(3)),
         tuple(rng.randrange(P) for _ in range(3)))
        for _ in range(64)
    ]
    triples += [(((P - 1),) * 3, ((P - 1),) * 3), ((0, 0, 1), (0, 0, 1))]
    X = gl3.from_u64_triple(*[[t[0][i] for t in triples] for i in range(3)])
    Y = gl3.from_u64_triple(*[[t[1][i] for t in triples] for i in range(3)])
    got = gl3.to_u64_triple(gl3.mul(X, Y))
    for k, (a, b) in enumerate(triples):
        want = _gl3_mul_int(a, b)
        assert (int(got[0][k]), int(got[1][k]), int(got[2][k])) == want


def test_gl3_inv_roundtrip():
    from plonky25_tpu.fields import extension3 as gl3

    rng = random.Random(90210)
    triples = [tuple(rng.randrange(P) for _ in range(3)) for _ in range(64)]
    triples += [(1, 0, 0), (0, 1, 0), (0, 0, 1), (P - 1, P - 1, P - 1)]
    X = gl3.from_u64_triple(*[[t[i] for t in triples] for i in range(3)])
    prod = gl3.to_u64_triple(gl3.mul(gl3.inv(X), X))
    for k in range(len(triples)):
        assert (int(prod[0][k]), int(prod[1][k]), int(prod[2][k])) == (1, 0, 0)


def test_ext_two_adic_generator_int():
    """p3_ext_two_adic_generator (extension.rs:159-171) incl. the
    bits == 33 special case: the generator lies on the X axis and has
    exact multiplicative order 2^33 in GF(p^2)."""
    from plonky25_tpu.refimpl.field import Gl2

    for bits in (0, 1, 7, 32):
        want = (gl2.two_adic_generator_int(bits), 0)
        assert gl2.ext_two_adic_generator_int(bits) == want

    g = gl2.ext_two_adic_generator_int(33)
    assert g[0] == 0 and g[1] != 0
    # plonky3's constant is sqrt(g_32 / 7): squaring (0, w) gives 7*w^2
    assert 7 * g[1] * g[1] % P == gl2.two_adic_generator_int(32)
    # order exactly 2^33: g^(2^32) == -1, so g^(2^33) == 1
    acc = g
    for _ in range(32):
        acc = Gl2.mul(acc, acc)
    assert acc == (P - 1, 0)
    assert Gl2.mul(acc, acc) == (1, 0)


def test_gl3_ops_folder_parity():
    """The D=3 Ops adapter folds constraints identically to an int
    oracle: acc = acc*alpha + c over GF(p^3)."""
    from plonky25_tpu.fields import extension3 as gl3

    rng = random.Random(424242)
    alpha_t = tuple(rng.randrange(P) for _ in range(3))
    cs_t = [tuple(rng.randrange(P) for _ in range(3)) for _ in range(7)]

    ops = gl3.Ops(())
    alpha = gl3.from_u64_triple(*[[alpha_t[i]] for i in range(3)])[0]
    cs = [gl3.from_u64_triple(*[[c[i]] for i in range(3)])[0] for c in cs_t]
    got = gl3.to_u64_triple(ops.fold_constraints(alpha, cs))

    acc = (0, 0, 0)
    for c in cs_t:
        acc = _gl3_mul_int(acc, alpha_t)
        acc = tuple((a + b) % P for a, b in zip(acc, c))
    assert (int(got[0]), int(got[1]), int(got[2])) == acc

    # from_parts at a base point: a + X*b + X^2*c == (a0, b0, c0)
    a = gl3.from_base(gl3.ones(()).c0)
    b = gl3.from_u64_triple([5], [0], [0])[0]
    c = gl3.from_u64_triple([9], [0], [0])[0]
    fp = gl3.to_u64_triple(gl3.Ops.from_parts(a, b, c))
    assert (int(fp[0]), int(fp[1]), int(fp[2])) == (1, 5, 9)
