"""Pure-Python (arbitrary-precision int) reference implementation.

This subpackage is the executable specification of the protocol: a direct,
dependency-free implementation of Goldilocks / GF(p^2) arithmetic, the
Poseidon2 permutation, the duplex challenger, MMCS Merkle verification and the
full Plonky3 STARK verifier.  It exists to

  1. validate our understanding of the reference algorithms bit-exactly
     against `artifacts/proof_fibonacci.json`, and
  2. serve as the oracle that every JAX/Pallas kernel is tested against.

It is NOT the TPU compute path (that lives in plonky25_tpu.fields / ops /
verifier); keep it simple and obviously-correct.
"""

from .field import Gl, Gl2  # noqa: F401
from .poseidon2 import poseidon2  # noqa: F401
from .challenger import DuplexChallenger  # noqa: F401
