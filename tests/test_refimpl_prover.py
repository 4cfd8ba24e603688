"""Reference prover: proofs must be BIT-IDENTICAL to the Rust-produced
golden artifact (proving is fully deterministic: transcript, LDE ordering,
Merkle layout and sequential PoW grind all pinned)."""

import dataclasses

import pytest

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.refimpl.prover import prove
from plonky25_tpu.refimpl.verifier import verify

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def _deep_eq(a, b, path=""):
    if dataclasses.is_dataclass(a):
        for f in dataclasses.fields(a):
            _deep_eq(getattr(a, f.name), getattr(b, f.name), path + "." + f.name)
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), (path, len(a), len(b))
        for i, (x, y) in enumerate(zip(a, b)):
            _deep_eq(x, y, f"{path}[{i}]")
    else:
        assert a == b, (path, a, b)


@pytest.fixture(scope="module")
def fib_proof():
    return prove(FibonacciAir(), fibonacci_trace(64), FC)


def test_prover_reproduces_golden_artifact(fib_proof, golden_proof):
    _deep_eq(fib_proof, golden_proof)


def test_generated_proof_verifies(fib_proof):
    assert verify(fib_proof, FibonacciAir(), FC).ok


def test_generated_proof_verifies_on_jax_path(fib_proof):
    import numpy as np

    from plonky25_tpu.verifier import verify_proof

    r = verify_proof(fib_proof, FibonacciAir(), FC)
    assert bool(np.asarray(r.ok))


def test_other_height_roundtrip():
    """Prove/verify at a different trace height (32) - new proof shape."""
    proof = prove(FibonacciAir(), fibonacci_trace(32),
                  FriConfig(log_blowup=1, num_queries=30, proof_of_work_bits=8))
    assert proof.degree_bits == 5
    tr = verify(proof, FibonacciAir(),
                FriConfig(log_blowup=1, num_queries=30, proof_of_work_bits=8))
    assert tr.ok


def test_invalid_trace_proof_rejected():
    """A trace violating the AIR still yields a well-formed proof (the
    64-point 'quotient' interpolates to SOME low-degree poly), but the
    verifier's quotient identity at zeta must reject it
    (verifier.rs:236-239)."""
    bad = fibonacci_trace(32)
    bad[7][2] = (bad[7][2] + 1) % P
    fc = FriConfig(log_blowup=1, num_queries=10, proof_of_work_bits=4)
    proof = prove(FibonacciAir(), bad, fc)
    tr = verify(proof, FibonacciAir(), fc)
    assert not tr.ok
    assert not tr.quotient_ok
