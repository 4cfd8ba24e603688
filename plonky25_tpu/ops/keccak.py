"""keccak-f[1600] permutation, batched for TPU (BASELINE config 4 kernel).

Lanes are u64 values held as uint32 (lo, hi) pairs - the same planar limb
discipline as the Goldilocks field (no 64-bit integer datapath on the VPU).
The reference repo expresses u64 bitwise ops through interleave gates
(src/common/u32/gadgets/interleaved_u32.rs); on TPU they are single VPU int
ops (SURVEY.md §2.1), so a round is ~100 uint32 ops vectorized over the
batch.  Rounds run under lax.scan (one round body in the compiled graph).

State layout: two uint32 arrays of shape (..., 25); lane i = x + 5*y.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..refimpl.keccak import RC, R


class U64Lanes(NamedTuple):
    lo: jnp.ndarray  # uint32 (..., 25)
    hi: jnp.ndarray


def _rol(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return (
            (lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)),
        )
    m = n - 32
    return (
        (hi << m) | (lo >> (32 - m)),
        (lo << m) | (hi >> (32 - m)),
    )


def _idx(x: int, y: int) -> int:
    return x + 5 * y


def keccak_round(state: U64Lanes, rc_lo, rc_hi) -> U64Lanes:
    lo, hi = state
    L = lambda x, y: (lo[..., _idx(x, y)], hi[..., _idx(x, y)])

    # theta
    C = []
    for x in range(5):
        clo, chi = L(x, 0)
        for y in range(1, 5):
            t = L(x, y)
            clo = clo ^ t[0]
            chi = chi ^ t[1]
        C.append((clo, chi))
    D = []
    for x in range(5):
        r = _rol(*C[(x + 1) % 5], 1)
        D.append((C[(x - 1) % 5][0] ^ r[0], C[(x - 1) % 5][1] ^ r[1]))

    # theta apply + rho + pi
    B = [[None] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            alo, ahi = L(x, y)
            alo, ahi = alo ^ D[x][0], ahi ^ D[x][1]
            B[y][(2 * x + 3 * y) % 5] = _rol(alo, ahi, R[x][y])

    # chi + iota
    out_lo = [None] * 25
    out_hi = [None] * 25
    for x in range(5):
        for y in range(5):
            b0, b1, b2 = B[x][y], B[(x + 1) % 5][y], B[(x + 2) % 5][y]
            olo = b0[0] ^ (~b1[0] & b2[0])
            ohi = b0[1] ^ (~b1[1] & b2[1])
            if x == 0 and y == 0:
                olo = olo ^ rc_lo
                ohi = ohi ^ rc_hi
            out_lo[_idx(x, y)] = olo
            out_hi[_idx(x, y)] = ohi

    return U64Lanes(jnp.stack(out_lo, axis=-1), jnp.stack(out_hi, axis=-1))


def keccak_f(state: U64Lanes) -> U64Lanes:
    """24-round keccak-f[1600], batched over leading dims of (..., 25)."""
    rc_lo = jnp.asarray([c & 0xFFFFFFFF for c in RC], jnp.uint32)
    rc_hi = jnp.asarray([c >> 32 for c in RC], jnp.uint32)

    def body(s, rcs):
        return keccak_round(s, rcs[0], rcs[1]), None

    s, _ = jax.lax.scan(body, state, (rc_lo, rc_hi))
    return s


@jax.jit
def keccak_f_jit(state: U64Lanes) -> U64Lanes:
    return keccak_f(state)


def from_u64(flat) -> U64Lanes:
    """Host: (..., 25) array-like of ints -> U64Lanes."""
    arr = np.asarray(flat, dtype=object)
    lo = np.vectorize(lambda v: int(v) & 0xFFFFFFFF, otypes=[np.uint32])(arr)
    hi = np.vectorize(lambda v: int(v) >> 32, otypes=[np.uint32])(arr)
    return U64Lanes(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(state: U64Lanes) -> np.ndarray:
    lo = np.asarray(state.lo, dtype=np.uint64).astype(object)
    hi = np.asarray(state.hi, dtype=np.uint64).astype(object)
    return hi * (1 << 32) + lo
