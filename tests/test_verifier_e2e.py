"""Golden end-to-end test of the JAX/TPU verifier (BASELINE config 1).

The full pipeline - one-scan transcript, batched Merkle openings, reduced
openings, FRI fold, AIR finale - must accept artifacts/proof_fibonacci.json
bit-exactly and reject tampered variants.  Transcript challenges are
cross-checked against the plain-int oracle."""

import copy

import numpy as np
import pytest

from plonky25_tpu.fields import gl
from plonky25_tpu.models.fibonacci import FibonacciAir
from plonky25_tpu.proof import FriConfig
from plonky25_tpu.refimpl.verifier import verify as ref_verify
from plonky25_tpu.verifier import verify_proof

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


@pytest.fixture(scope="module")
def result(golden_proof):
    return verify_proof(golden_proof, FibonacciAir(), FC)


def test_golden_accepts(result):
    assert bool(np.asarray(result.pow_ok))
    assert bool(np.asarray(result.merkle_ok))
    assert bool(np.asarray(result.fold_ok))
    assert bool(np.asarray(result.quotient_ok))
    assert bool(np.asarray(result.ok))


def test_transcript_matches_oracle(result, golden_proof):
    ref = ref_verify(golden_proof, FibonacciAir(), FC)
    assert int(gl.to_u64(result.alpha.c0)) == ref.alpha[0]
    assert int(gl.to_u64(result.alpha.c1)) == ref.alpha[1]
    assert int(gl.to_u64(result.zeta.c0)) == ref.zeta[0]
    assert int(gl.to_u64(result.zeta.c1)) == ref.zeta[1]
    assert list(np.asarray(result.query_indices)) == ref.query_indices


def test_tampered_pow_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    p.opening_proof.fri_proof.pow_witness += 1
    r = verify_proof(p, FibonacciAir(), FC)
    assert not bool(np.asarray(r.ok))
    assert not bool(np.asarray(r.pow_ok))


def test_tampered_sibling_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    p.opening_proof.query_openings[17][0].opening_proof[3][2] ^= 1
    r = verify_proof(p, FibonacciAir(), FC)
    assert not bool(np.asarray(r.ok))
    assert not bool(np.asarray(r.merkle_ok))


def test_tampered_fold_sibling_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    s = p.opening_proof.fri_proof.query_proofs[5].commit_phase_openings[1]
    s.sibling_value = (s.sibling_value[0] ^ 1, s.sibling_value[1])
    r = verify_proof(p, FibonacciAir(), FC)
    assert not bool(np.asarray(r.ok))


def test_tampered_final_poly_rejected(golden_proof):
    p = copy.deepcopy(golden_proof)
    fp = p.opening_proof.fri_proof.final_poly
    p.opening_proof.fri_proof.final_poly = (fp[0] + 1, fp[1])
    r = verify_proof(p, FibonacciAir(), FC)
    assert not bool(np.asarray(r.ok))
    assert not bool(np.asarray(r.fold_ok))


def test_wrong_query_count_shape_rejected(golden_proof):
    r = verify_proof(golden_proof, FibonacciAir(),
                     FriConfig(log_blowup=1, num_queries=99, proof_of_work_bits=16))
    assert not r.shape_ok
    assert not bool(np.asarray(r.ok))


def test_fri_challenges_match_oracle(golden_proof):
    """FriChallenges parity (serde/fri.rs:10-13): the JAX transcript's betas
    and query indices equal the int oracle's."""
    from plonky25_tpu import FriConfig, derive_config
    from plonky25_tpu.models import FibonacciAir
    from plonky25_tpu.refimpl.verifier import verify
    from plonky25_tpu.verifier import get_verifier

    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    v = get_verifier(FibonacciAir(), derive_config(golden_proof, fc))
    chal = v.fri_challenges(golden_proof)
    r = verify(golden_proof, FibonacciAir(), fc)
    assert chal.query_indices == r.query_indices
    assert chal.betas == r.betas
