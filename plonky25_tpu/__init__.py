"""plonky2.5-tpu: a TPU-native Plonky3-STARK-verification framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
QEDProtocol/plonky2.5 (a Rust circuit library that verifies Plonky3 STARK
proofs): Goldilocks and GF(p^2) field arithmetic, Poseidon2 hashing, the
duplex Fiat-Shamir challenger, MMCS Merkle batch openings, two-adic domains,
FRI fold/query verification and AIR constraint folding - designed TPU-first
(batched kernels over query grids, shardable over device meshes) rather than
as constraint emission.
"""

__version__ = "0.1.0"

from .proof import (  # noqa: F401
    FriConfig,
    P3Config,
    Proof,
    load_proof,
    proof_from_json,
    proof_to_json,
    save_proof,
    derive_config,
)
from .air import Air, VerifierConstraintFolder, FilteredAirBuilder  # noqa: F401
from .errors import (  # noqa: F401
    P25Error,
    FriError,
    InvalidProofShape,
    InvalidPowWitness,
    check_proof_shape,
)
