"""Attestation of multi-stage target proofs (stage-2 commitment +
transcript challenges): the verification schedule carries the stage-2
observation/challenge transcript steps, the third Merkle batch, the
stage-2 reduced-opening terms, and challenge-dependent AIR folding
(refimpl/verifier.py transcript head; src/p3/verifier.rs:100-240 extended
by the framework's multi-stage mechanism)."""

import copy
import random

import pytest

import plonky25_tpu.attest as A
import plonky25_tpu.attest_program as ap
from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.models.rlc_air import RlcAir
from plonky25_tpu.proof import FriConfig, derive_config
from plonky25_tpu.refimpl.prover import prove as refimpl_prove
from plonky25_tpu.refimpl.verifier import verify as refimpl_verify

FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
ATT_FC = FriConfig(log_blowup=1, num_queries=10, proof_of_work_bits=4)


@pytest.fixture(scope="module")
def rlc_proof():
    rng = random.Random(11)
    trace = [[rng.randrange(1 << 63), rng.randrange(1 << 63)]
             for _ in range(16)]
    return refimpl_prove(RlcAir(), trace, FC)


@pytest.fixture(scope="module")
def rlc_bundle(rlc_proof):
    return A.attest(rlc_proof, RlcAir(), FC, att_fri_config=ATT_FC,
                    use_device_prover=False)


def test_schedule_sample_layout(rlc_proof):
    """Sample count includes the stage-2 challenges, and the rebuilt
    schedule executes (every in-program assert passes)."""
    ch = A._RecordingChallenger()
    tr = refimpl_verify(rlc_proof, RlcAir(), FC, challenger=ch)
    assert tr.ok
    config = derive_config(rlc_proof, FC)
    n_ch = RlcAir().num_challenges()
    assert len(ch.samples) == ap.expected_sample_count(config, n_ch)
    assert ap.n_presamples(config, n_ch) == ap.n_presamples(config) + 2

    rows = ap.build_verification_schedule(rlc_proof, config, RlcAir(),
                                          ch.samples)
    ap.execute_program(rows)   # raises on any in-program assert failure
    # the schedule contains a third Merkle batch per query: at least
    # 3 leaf-start ('l') rows per query beyond the transcript start
    n_leaf = sum(1 for r in rows if r.sel == "l")
    assert n_leaf >= 1 + 3 * FC.num_queries


def test_attest_and_check_multistage(rlc_proof, rlc_bundle):
    assert A.check_attestation(rlc_bundle, rlc_proof, RlcAir(), FC,
                               use_device_verifier=False,
                               att_fri_config=ATT_FC)


def test_challenge_sample_tamper_rejected(rlc_proof, rlc_bundle):
    """Flipping a recorded stage-2 challenge sample breaks the binding
    accumulator (the transcript chain re-derives the real one)."""
    bad = copy.deepcopy(rlc_bundle)
    bad.samples[0] = (bad.samples[0] + 1) % P
    assert not A.check_attestation(bad, rlc_proof, RlcAir(), FC,
                                   use_device_verifier=False,
                                   att_fri_config=ATT_FC)


def test_stage2_opened_tamper_rejected(rlc_proof, rlc_bundle):
    """A tampered stage-2 opened value changes the canonical schedule,
    so the bundle's accumulator no longer matches."""
    bad_proof = copy.deepcopy(rlc_proof)
    c0, c1 = bad_proof.opened_values.stage2_local[0]
    bad_proof.opened_values.stage2_local[0] = ((c0 + 1) % P, c1)
    assert not A.check_attestation(rlc_bundle, bad_proof, RlcAir(), FC,
                                   use_device_verifier=False,
                                   att_fri_config=ATT_FC)


def test_device_instrumented_verify_multistage(rlc_proof):
    """The jitted device verifier's recorded samples (the TPU attest
    path's input) match the oracle challenger on a multi-stage proof —
    challenges included."""
    ok, samples = A._device_instrumented_verify(rlc_proof, RlcAir(), FC)
    assert ok
    ch = A._RecordingChallenger()
    assert refimpl_verify(rlc_proof, RlcAir(), FC, challenger=ch).ok
    assert samples == ch.samples


def test_attest_refuses_invalid_multistage(rlc_proof):
    bad = copy.deepcopy(rlc_proof)
    bad.opening_proof.fri_proof.pow_witness += 1
    with pytest.raises(A.CannotAttest):
        A.attest(bad, RlcAir(), FC, att_fri_config=ATT_FC,
                 use_device_prover=False)


def test_wrong_air_stage_shape_rejected(rlc_proof, rlc_bundle):
    """Checking a multi-stage bundle against a single-stage air (or vice
    versa) fails closed in the structural gate."""
    from plonky25_tpu.models.fibonacci import FibonacciAir

    assert not A.check_attestation(rlc_bundle, rlc_proof, FibonacciAir(),
                                   FC, use_device_verifier=False,
                                   att_fri_config=ATT_FC)


def test_batched_sample_recording_multistage(rlc_proof):
    """attest_many's batched recorder (ONE vmapped dispatch) matches the
    single-proof instrumented verify on multi-stage proofs."""
    batched = A._record_verifications_device(
        [rlc_proof, rlc_proof], RlcAir(), FC)
    _, single = A._device_instrumented_verify(rlc_proof, RlcAir(), FC)
    assert batched[0] == batched[1] == single


@pytest.mark.slow
def test_attest_many_multistage(rlc_proof):
    """One STARK attests a batch of multi-stage verifications."""
    proofs = [rlc_proof, rlc_proof]
    mb = A.attest_many(proofs, RlcAir(), FC, att_fri_config=ATT_FC,
                       use_device_prover=False)
    assert A.check_attestations(mb, proofs, RlcAir(), FC,
                                use_device_verifier=False,
                                att_fri_config=ATT_FC)
    bad = copy.deepcopy(mb)
    bad.samples[1][0] = (bad.samples[1][0] + 1) % P
    assert not A.check_attestations(bad, proofs, RlcAir(), FC,
                                    use_device_verifier=False,
                                    att_fri_config=ATT_FC)


# ---- vector-op AIRs through the attestation assembler ------------------

class VecSumAir:
    """Minimal AIR exercising the VECTOR ops surface (stack/take/concat/
    const_base + elementwise arithmetic) that wide AIRs (KeccakAir,
    VerifierAir itself) fold with — the attestation assembler lowers
    these to scalar FMA rows at assert time."""

    def name(self):
        return "VecSum"

    def width(self):
        return 4

    def stage2_width(self):
        return 0

    def num_challenges(self):
        return 0

    def public_values(self):
        return {}

    def quotient_degree(self):
        return 2

    def eval(self, folder):
        ops = folder.ops
        L = ops.stack(folder.main.trace_local)
        N = ops.stack(folder.main.trace_next)
        w = ops.const_base([1, 2, 3, 4])
        s = ops.mul(L, w)
        tot = None
        for j in range(4):
            tj = ops.take(s, [j])
            tot = tj if tot is None else ops.add(tot, tj)
        folder.when_transition().assert_zero(ops.sub(ops.take(N, [0]), tot))
        # concat over same-kind trace segments, as VerifierAir does
        pair = ops.concat([ops.take(L, [0]), ops.take(L, [0])])
        folder.when_first_row().assert_zero(
            ops.sub(pair, ops.const_base([7, 7])))


def _vecsum_trace(h):
    rng = random.Random(3)
    rows = [[7, rng.randrange(P), rng.randrange(P), rng.randrange(P)]]
    for _ in range(h - 1):
        prev = rows[-1]
        nxt0 = (prev[0] + 2 * prev[1] + 3 * prev[2] + 4 * prev[3]) % P
        rows.append([nxt0, rng.randrange(P), rng.randrange(P),
                     rng.randrange(P)])
    return rows


@pytest.fixture(scope="module")
def vec_proof():
    return refimpl_prove(VecSumAir(), _vecsum_trace(16), FC)


@pytest.mark.slow
def test_vector_air_attest_roundtrip(vec_proof):
    assert refimpl_verify(vec_proof, VecSumAir(), FC).ok
    b = A.attest(vec_proof, VecSumAir(), FC, att_fri_config=ATT_FC,
                 use_device_prover=False)
    assert A.check_attestation(b, vec_proof, VecSumAir(), FC,
                               use_device_verifier=False,
                               att_fri_config=ATT_FC)
    bad = copy.deepcopy(vec_proof)
    bad.opened_values.trace_local[2] = (
        (bad.opened_values.trace_local[2][0] + 1) % P,
        bad.opened_values.trace_local[2][1])
    assert not A.check_attestation(b, bad, VecSumAir(), FC,
                                   use_device_verifier=False,
                                   att_fri_config=ATT_FC)


# ---- recursive composition: the attestation STARK is itself attestable -

def test_recursive_composition_schedule(rlc_proof):
    """attest_attestation's schedule: the verification of a VerifierAir
    STARK (522-wide trace, vector-op constraint fold) compiles into a
    canonical row schedule whose program executes (all in-program asserts
    pass) and whose binding accumulator derives — the full outer STARK
    prove runs on TPU (scripts/tpu_round3_validate.py recurse stage)."""
    from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace

    small_att_fc = FriConfig(log_blowup=1, num_queries=2,
                             proof_of_work_bits=1)
    proof = refimpl_prove(FibonacciAir(), fibonacci_trace(8), FC)
    inner = A.attest(proof, FibonacciAir(), FC,
                     att_fri_config=small_att_fc, use_device_prover=False)

    v_air = A._verifier_air_of(inner)
    assert refimpl_verify(inner.stark, v_air, small_att_fc).ok

    samples = A._record_verification(inner.stark, v_air, small_att_fc,
                                     use_device=False)
    cfg = derive_config(inner.stark, small_att_fc)
    rows = ap.build_verification_schedule(inner.stark, cfg, v_air, samples)
    ap.execute_program(rows)   # raises on any in-program assert failure
    gamma = ap.derive_gammas(rows)
    acc = ap.fold_accumulator(rows, gamma)
    assert gamma != (0, 0) and acc != (0, 0)

    # inner-binding arm of check_attested_attestation: a tampered inner
    # bundle fails closed before any outer STARK work
    fake_outer = inner  # config-acceptable placeholder; never reached
    bad_inner = copy.deepcopy(inner)
    bad_inner.acc = ((bad_inner.acc[0] + 1) % P, bad_inner.acc[1])
    assert not A.check_attested_attestation(
        fake_outer, bad_inner, proof, FibonacciAir(), FC,
        use_device_verifier=False)
