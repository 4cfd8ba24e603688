"""Poseidon2 permutation: JAX batched kernel vs artifact-validated oracle.

Note on KATs: the reference repo ships hadeshash "expected output" vectors
(poseidon2_goldilocks.rs:190-211) but its own assertion loop compares
output[i] == output[i] (poseidon2.rs:688-692) — and in fact those vectors do
NOT match the permutation the repo implements.  The real ground truth is the
golden artifact: refimpl verifies it end-to-end (thousands of chained
permutations + the PoW check), so refimpl output IS the KAT source here."""

import random

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.fields import gl
from plonky25_tpu.ops.poseidon2 import poseidon2_permute_jit
from plonky25_tpu.refimpl.poseidon2 import poseidon2 as ref_perm

# Self-generated KATs (artifact-validated refimpl).
KATS = [
    ([0] * 12, None),
    (list(range(12)), None),
    ([P - 1] * 12, None),
    ([0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A,
      0xDCC0630A3AB8B1B8, 0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB,
      0x48452B17A70FBEE3, 0xEB09D654690B6C88, 0x4A55D3A39C676A88,
      0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F], None),
]


def test_kats_and_random_batch():
    rng = random.Random(42)
    states = [k for k, _ in KATS]
    states += [[rng.randrange(P) for _ in range(12)] for _ in range(60)]
    out = gl.to_u64(poseidon2_permute_jit(gl.from_u64(states)))
    for i, s in enumerate(states):
        assert list(out[i]) == ref_perm(s), f"state {i} mismatch"


def test_multi_dim_batch():
    rng = random.Random(43)
    states = [[[rng.randrange(P) for _ in range(12)] for _ in range(4)]
              for _ in range(3)]
    out = gl.to_u64(poseidon2_permute_jit(gl.from_u64(states)))
    for i in range(3):
        for j in range(4):
            assert list(out[i][j]) == ref_perm(states[i][j])


def test_single_state_no_batch():
    s = list(range(12))
    out = gl.to_u64(poseidon2_permute_jit(gl.from_u64(s)))
    assert list(out) == ref_perm(s)
