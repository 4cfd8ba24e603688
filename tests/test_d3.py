"""Degree-3 extension proof family (GF(p^3) = GF(p)[X]/(X^3-7)): the
refimpl prove -> verify roundtrip at ext_degree=3, config-carried degree
(P3Config.ext_degree), generic serde, and the honest device-path guards.

The reference carries both formula sets selected by EXT_DEGREE
(/root/reference/src/p3/extension.rs:330-390, 473-532); its own proof
family — and this framework's DEVICE pipeline — is D=2.  The D=3 family
proves and verifies end-to-end on the refimpl (executable-spec) path;
the device verifier and the attestation machinery reject it explicitly
rather than silently mis-verifying.
"""

import copy
import json
import random

import pytest

from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import (
    FriConfig,
    derive_config,
    proof_from_json,
    proof_to_json,
)
from plonky25_tpu.refimpl.field import Gl2, Gl3, ext_ops
from plonky25_tpu.refimpl.prover import prove
from plonky25_tpu.refimpl.verifier import verify

FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)


@pytest.fixture(scope="module")
def d3_proof():
    return prove(FibonacciAir(), fibonacci_trace(8), FC, ext_degree=3)


def test_gl3_int_field():
    rng = random.Random(11)

    def school(a, b):
        c = [0] * 5
        for i in range(3):
            for j in range(3):
                c[i + j] = (c[i + j] + a[i] * b[j]) % P
        return ((c[0] + 7 * c[3]) % P, (c[1] + 7 * c[4]) % P, c[2] % P)

    for _ in range(100):
        a = tuple(rng.randrange(P) for _ in range(3))
        b = tuple(rng.randrange(P) for _ in range(3))
        assert Gl3.mul(a, b) == school(a, b)
        assert Gl3.mul(Gl3.inv(a), a) == Gl3.ONE
    assert ext_ops(2) is Gl2 and ext_ops(3) is Gl3
    with pytest.raises(ValueError):
        ext_ops(4)


def test_d3_roundtrip(d3_proof):
    assert len(d3_proof.opened_values.trace_local[0]) == 3
    assert len(d3_proof.opening_proof.fri_proof.final_poly) == 3
    tr = verify(d3_proof, FibonacciAir(), FC)
    assert tr.ok and tr.pow_ok and tr.merkle_ok and tr.fold_ok \
        and tr.quotient_ok
    # the transcript sampled triples
    assert len(tr.alpha) == 3 and len(tr.zeta) == 3


def test_d3_config_and_shape(d3_proof):
    from plonky25_tpu.errors import check_proof_shape

    cfg = derive_config(d3_proof, FC)
    assert cfg.ext_degree == 3
    check_proof_shape(d3_proof, cfg)     # no raise


def test_d3_tampers_rejected(d3_proof):
    air = FibonacciAir()
    bad = copy.deepcopy(d3_proof)
    tl = bad.opened_values.trace_local
    tl[0] = ((tl[0][0] + 1) % P,) + tuple(tl[0][1:])
    assert not verify(bad, air, FC).ok
    bad = copy.deepcopy(d3_proof)
    bad.opening_proof.fri_proof.pow_witness += 1
    assert not verify(bad, air, FC).ok
    bad = copy.deepcopy(d3_proof)
    sib = bad.opening_proof.fri_proof.query_proofs[0] \
        .commit_phase_openings[0].sibling_value
    bad.opening_proof.fri_proof.query_proofs[0] \
        .commit_phase_openings[0].sibling_value = \
        ((sib[0] + 1) % P,) + tuple(sib[1:])
    assert not verify(bad, air, FC).ok
    bad = copy.deepcopy(d3_proof)
    fp = bad.opening_proof.fri_proof
    fp.final_poly = ((fp.final_poly[0] + 1) % P,) + tuple(fp.final_poly[1:])
    assert not verify(bad, air, FC).ok


def test_d3_json_roundtrip(d3_proof):
    again = proof_from_json(json.loads(json.dumps(proof_to_json(d3_proof))))
    assert again.opened_values.trace_local == d3_proof.opened_values.trace_local
    assert verify(again, FibonacciAir(), FC).ok


def test_d3_device_and_attest_guards(d3_proof):
    from plonky25_tpu.attest import CannotAttest, attest
    from plonky25_tpu.verifier import verify_proof

    with pytest.raises(NotImplementedError):
        verify_proof(d3_proof, FibonacciAir(), FC)
    with pytest.raises(CannotAttest):
        attest(d3_proof, FibonacciAir(), FC, use_device_prover=False)


def test_d2_unchanged(d3_proof):
    """The D=2 path is untouched by the parameterization: same default,
    bit-exact transcripts (the golden artifact suites cover the full
    equality; this is the quick same-file guard)."""
    p2 = prove(FibonacciAir(), fibonacci_trace(8), FC)
    assert derive_config(p2, FC).ext_degree == 2
    assert len(p2.opened_values.trace_local[0]) == 2
    assert verify(p2, FibonacciAir(), FC).ok
