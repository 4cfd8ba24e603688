"""Batch prover: B same-shape traces through one vmapped pipeline, each
proof identical to the sequential prover's output."""

import dataclasses

import numpy as np
import pytest

# The B-way vmapped prover pipeline is minutes of XLA CPU compile on this
# 1-CPU box even warm-cached; slow tier (VERDICT r1 weak #6).
pytestmark = pytest.mark.slow

from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.prover import prove_batch_on_device

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def _deep_eq(a, b):
    if dataclasses.is_dataclass(a):
        return all(_deep_eq(getattr(a, f.name), getattr(b, f.name))
                   for f in dataclasses.fields(a))
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    return a == b


def test_batch_matches_golden(golden_proof):
    proofs = prove_batch_on_device(FibonacciAir(), [fibonacci_trace(64)] * 2, FC)
    assert all(_deep_eq(p, golden_proof) for p in proofs)


def test_batch_proofs_independent(golden_proof):
    """A batch of [valid, invalid] traces: the valid lane still produces
    the golden proof bit-exactly; the invalid lane's proof is rejected by
    the verifier (quotient identity) without affecting its neighbor."""
    from plonky25_tpu.verifier import verify_proof

    bad = fibonacci_trace(64)
    bad[10] = list(bad[10])
    bad[10][2] = (bad[10][2] + 1) % ((1 << 64) - (1 << 32) + 1)
    proofs = prove_batch_on_device(
        FibonacciAir(), [fibonacci_trace(64), bad], FC)
    assert _deep_eq(proofs[0], golden_proof)
    assert not _deep_eq(proofs[1], golden_proof)
    assert bool(np.asarray(verify_proof(proofs[0], FibonacciAir(), FC).ok))
    assert not bool(np.asarray(verify_proof(proofs[1], FibonacciAir(), FC).ok))


def test_batch_proving_sharded_over_mesh(golden_proof):
    """Data-parallel proving: proof axis sharded over the virtual 8-device
    mesh; every lane's proof still bit-equals the sequential output."""
    from plonky25_tpu.parallel import make_mesh
    from plonky25_tpu.prover.batch_prove import BatchProver

    mesh = make_mesh(8)
    bp = BatchProver(FibonacciAir(), 6, FC)
    proofs = bp.prove([fibonacci_trace(64)] * 8, mesh=mesh)
    assert all(_deep_eq(p, golden_proof) for p in proofs)
