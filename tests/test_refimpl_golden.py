"""Golden end-to-end test of the plain-int oracle (SURVEY.md §4 layer 5)."""

import copy

import pytest

from plonky25_tpu.proof import FriConfig
from plonky25_tpu.models.fibonacci import FibonacciAir
from plonky25_tpu.refimpl.verifier import verify

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


@pytest.fixture(scope="module")
def result(golden_proof):
    return verify(golden_proof, FibonacciAir(), FC)


def test_golden_accepts(result):
    assert result.shape_ok and result.pow_ok and result.merkle_ok
    assert result.fold_ok and result.quotient_ok and result.ok


def test_transcript_values(result):
    # pinned transcript head (stability canary for challenger semantics)
    assert result.alpha == (13582184458757534322, 779051096322246971)
    assert result.zeta == (13621774550431608608, 12205987210698460116)
    assert result.query_indices[:8] == [15, 50, 46, 46, 16, 106, 40, 26]


def test_tampered_pow_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    p.opening_proof.fri_proof.pow_witness += 1
    assert not verify(p, FibonacciAir(), FC).ok


def test_tampered_sibling_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    p.opening_proof.query_openings[3][1].opening_proof[2][0] ^= 1
    assert not verify(p, FibonacciAir(), FC).ok


def test_tampered_opened_value_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    v = p.opened_values.trace_next[1]
    p.opened_values.trace_next[1] = ((v[0] + 1) % (2**64 - 2**32 + 1), v[1])
    assert not verify(p, FibonacciAir(), FC).ok


def test_tampered_final_poly_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    fp = p.opening_proof.fri_proof.final_poly
    p.opening_proof.fri_proof.final_poly = (fp[0] ^ 2, fp[1])
    assert not verify(p, FibonacciAir(), FC).ok


def test_proof_serialization_byte_exact(golden_proof):
    """proof_to_json of the loaded golden artifact reproduces the file
    byte-for-byte (serde parity: src/p3/serde/proof.rs round-trip)."""
    import json
    from plonky25_tpu.proof import proof_to_json, proof_from_json

    s = json.dumps(proof_to_json(golden_proof), separators=(",", ":"))
    with open("/root/reference/artifacts/proof_fibonacci.json") as f:
        assert s == f.read().strip()
    assert proof_from_json(json.loads(s)) == golden_proof
