"""Goldilocks limb arithmetic vs the plain-int oracle.

Mirrors the reference's gate-level algebraic tests (SURVEY.md §4 layer 1):
every op checked on random values plus the canonicity edge cases that the
reference's U32ArithmeticGate canonicity constraint targets
(arithmetic_u32.rs:119-140)."""

import random

import jax.numpy as jnp
import pytest

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.fields import gl

EDGES = [
    0, 1, 2, P - 1, P - 2,
    0xFFFFFFFF, 0x100000000, 0xFFFFFFFE,
    P - 0xFFFFFFFF, P - 0x100000000,
    (1 << 63), (1 << 63) - 1,
]


def _pairs(rng, n=300):
    ps = [(a, b) for a in EDGES for b in EDGES]
    ps += [(rng.randrange(P), rng.randrange(P)) for _ in range(n)]
    return ps


@pytest.fixture(scope="module")
def pairs():
    return _pairs(random.Random(1234))


def _check(got_gl, want):
    got = gl.to_u64(got_gl)
    assert list(got) == list(want)


def test_add(pairs):
    A = gl.from_u64([a for a, _ in pairs])
    B = gl.from_u64([b for _, b in pairs])
    _check(gl.add(A, B), [(a + b) % P for a, b in pairs])


def test_sub(pairs):
    A = gl.from_u64([a for a, _ in pairs])
    B = gl.from_u64([b for _, b in pairs])
    _check(gl.sub(A, B), [(a - b) % P for a, b in pairs])


def test_mul(pairs):
    A = gl.from_u64([a for a, _ in pairs])
    B = gl.from_u64([b for _, b in pairs])
    _check(gl.mul(A, B), [(a * b) % P for a, b in pairs])


def test_neg(pairs):
    A = gl.from_u64([a for a, _ in pairs])
    _check(gl.neg(A), [(-a) % P for a, _ in pairs])


def test_inv(pairs):
    vals = [a if a % P else 1 for a, _ in pairs]
    A = gl.from_u64(vals)
    _check(gl.inv(A), [pow(a, P - 2, P) for a in vals])


def test_pow_const(pairs):
    A = gl.from_u64([a for a, _ in pairs])
    for e in (0, 1, 7, 12345, P - 2):
        _check(gl.pow_const(A, e), [pow(a, e, P) for a, _ in pairs])


def test_pow_u32_static_base():
    rng = random.Random(99)
    base = 1_753_635_133_440_165_772
    exps = [0, 1, (1 << 20) - 1] + [rng.randrange(1 << 20) for _ in range(61)]
    got = gl.to_u64(gl.pow_u32(base, jnp.asarray(exps, jnp.uint32), 20))
    assert list(got) == [pow(base, e, P) for e in exps]


def test_select_eq():
    A = gl.from_u64([1, 2, 3])
    B = gl.from_u64([1, 5, 3])
    assert list(gl.eq(A, B)) == [True, False, True]
    sel = gl.select(gl.eq(A, B), A, gl.zeros((3,)))
    assert list(gl.to_u64(sel)) == [1, 0, 3]
