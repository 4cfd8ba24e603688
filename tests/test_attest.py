"""Recursive attestation (plonky25_tpu.attest): the TPU-native analogue of
the reference's verify-inside-a-proof (src/p3/mod.rs:66-94, 261)."""

import copy

import numpy as np
import pytest

import plonky25_tpu.attest as A
from plonky25_tpu.air import VerifierConstraintFolder
from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.models.poseidon2_air import (
    CORE_WIDTH,
    NUM_HASH_COLS,
    OUT_OFF,
    HashChainAir,
    poseidon2_core_rows,
)
from plonky25_tpu.proof import FriConfig, derive_config
from plonky25_tpu.refimpl.field import Gl2
from plonky25_tpu.refimpl.poseidon2 import poseidon2
from plonky25_tpu.refimpl.prover import prove as refimpl_prove
from plonky25_tpu.refimpl.verifier import IntExtOps, verify as refimpl_verify

FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
ATT_FC = FriConfig(log_blowup=1, num_queries=10, proof_of_work_bits=4)


@pytest.fixture(scope="module")
def small_proof():
    return refimpl_prove(FibonacciAir(), fibonacci_trace(8), FC)


@pytest.fixture(scope="module")
def attestation_parts(small_proof):
    ch = A._RecordingChallenger()
    tr = refimpl_verify(small_proof, FibonacciAir(), FC, challenger=ch)
    assert tr.ok
    config = derive_config(small_proof, FC)
    rows = A.build_row_schedule(small_proof, config, ch.samples,
                                tr.fold_leaves)
    gamma = A.derive_gammas(rows)
    acc, acco = A.fold_accumulators(rows, gamma)
    trace = A.build_attestation_trace(rows, gamma)
    return ch, tr, rows, gamma, acc, acco, trace


def test_core_rows_match_permutation_oracle(rng):
    from plonky25_tpu.fields import gl

    P = (1 << 64) - (1 << 32) + 1
    states = [[rng.randrange(P) for _ in range(12)] for _ in range(4)]
    core = gl.to_u64(poseidon2_core_rows(
        gl.from_u64(np.asarray(states, object))))
    for i, s in enumerate(states):
        assert [int(v) for v in core[i][OUT_OFF:OUT_OFF + 12]] == poseidon2(s)


class _Main:
    pass


def _eval_rows(air, trace):
    """Direct constraint satisfaction on concrete rows (int backend)."""
    h = len(trace)
    ops = IntExtOps()
    bad = []
    for r in range(h):
        m = _Main()
        m.local_vec = ops.stack([Gl2.from_base(int(v)) for v in trace[r]])
        m.next_vec = ops.stack(
            [Gl2.from_base(int(v)) for v in trace[(r + 1) % h]])
        folder = VerifierConstraintFolder(
            ops=ops, main=m,
            is_first_row=Gl2.from_base(1 if r == 0 else 0),
            is_last_row=Gl2.from_base(1 if r == h - 1 else 0),
            is_transition=Gl2.from_base(1 if r < h - 1 else 0),
            alpha=Gl2.from_base(0))
        air.eval(folder)
        for ci, c in enumerate(folder._constraints):
            a0 = np.atleast_1d(np.asarray(c[0], object)).reshape(-1)
            a1 = np.atleast_1d(np.asarray(c[1], object)).reshape(-1)
            if not (all(v == 0 for v in a0) and all(v == 0 for v in a1)):
                bad.append((r, ci))
    return bad


def test_attestation_trace_satisfies_constraints(attestation_parts):
    _, _, rows, gamma, acc, acco, trace = attestation_parts
    air = HashChainAir({"gamma": gamma, "acc": acc, "acc_out": acco})
    assert _eval_rows(air, trace) == []


def test_tampered_trace_violates_constraints(attestation_parts):
    """Flipping a hashed value or a mask breaks a constraint or the
    accumulator binding."""
    _, _, rows, gamma, acc, acco, trace = attestation_parts
    air = HashChainAir({"gamma": gamma, "acc": acc, "acc_out": acco})
    # tamper an input lane of an active row: breaks the permutation or
    # the chain constraint
    t = [list(r) for r in trace]
    t[3][2] = (t[3][2] + 1) % ((1 << 64) - (1 << 32) + 1)
    assert _eval_rows(air, t) != []
    # tamper the final accumulator: breaks the last-row public binding
    t = [list(r) for r in trace]
    t[-1][NUM_HASH_COLS - 4] ^= 1
    assert _eval_rows(air, t) != []


def test_prefix_constraint_blocks_interior_padding(attestation_parts):
    """Advisor r2 finding: without the once-inactive-always-inactive
    transition constraint, an interior padding row's unconstrained lanes
    let a prover restart a chain from perm^-1 of a chosen state.  An
    (inactive, active) row pair whose accumulators are made transition-
    consistent must still violate a transition constraint."""
    from plonky25_tpu.constants import GOLDILOCKS_P as P, WIDTH
    from plonky25_tpu.models.poseidon2_air import (
        ACC_OFF, ACCO_OFF, M_OFF, MO_OFF, OUT_OFF,
    )

    _, _, rows, gamma, acc, acco, trace = attestation_parts
    air = HashChainAir({"gamma": gamma, "acc": acc, "acc_out": acco})
    pad = [int(v) for v in trace[-1]]      # inactive (padding) row
    act = [int(v) for v in trace[0]]       # active leaf-start row

    # patch act's accumulators so the acc/acco transition from pad holds
    for k in range(2):
        g = gamma[k]
        g12 = pow(g, WIDTH, P)
        c = sum(act[M_OFF + j] * act[j] * pow(g, j, P)
                for j in range(WIDTH)) % P
        act[ACC_OFF + k] = (pad[ACC_OFF + k] * g12 + c) % P
        co = sum(act[MO_OFF + j] * act[OUT_OFF + j] * pow(g, j, P)
                 for j in range(WIDTH)) % P
        act[ACCO_OFF + k] = (pad[ACCO_OFF + k] * g12 + co) % P

    ops = IntExtOps()

    def transition_violations(local, nxt):
        m = _Main()
        m.local_vec = ops.stack([Gl2.from_base(int(v)) for v in local])
        m.next_vec = ops.stack([Gl2.from_base(int(v)) for v in nxt])
        folder = VerifierConstraintFolder(
            ops=ops, main=m,
            is_first_row=Gl2.from_base(0), is_last_row=Gl2.from_base(0),
            is_transition=Gl2.from_base(1), alpha=Gl2.from_base(0))
        air.eval(folder)
        bad = set()
        for ci, c in enumerate(folder._constraints):
            a0 = np.atleast_1d(np.asarray(c[0], object)).reshape(-1)
            a1 = np.atleast_1d(np.asarray(c[1], object)).reshape(-1)
            if not (all(v == 0 for v in a0) and all(v == 0 for v in a1)):
                bad.add(ci)
        return bad

    # pure padding continuation is fine; padding -> active is not
    assert transition_violations(pad, pad) == set()
    assert transition_violations(pad, act) != set()


def test_check_attestation_fail_closed(small_proof):
    """A structurally malformed proof or a weak bundle config yields
    False, never an exception (advisor r2 medium + high findings).  Uses a
    dummy bundle: both rejections fire before any STARK work."""
    dummy = A.AttestationBundle(
        stark=small_proof, samples=[0] * 4, gamma=(1, 1), acc=(0, 0),
        acc_out=(0, 0), att_fri_config=A.DEFAULT_ATT_FRI_CONFIG, n_rows=4)
    # weak att config short-circuits
    weak = copy.deepcopy(dummy)
    weak.att_fri_config = FriConfig(log_blowup=1, num_queries=0,
                                    proof_of_work_bits=0)
    assert not A.check_attestation(weak, small_proof, FibonacciAir(), FC,
                                   use_device_verifier=False)
    # malformed proofs: structural damage returns False (no crash)
    mangled = copy.deepcopy(small_proof)
    mangled.opening_proof.fri_proof.query_proofs = []
    assert not A.check_attestation(dummy, mangled, FibonacciAir(), FC,
                                   use_device_verifier=False)
    mangled = copy.deepcopy(small_proof)
    mangled.opened_values.trace_local = mangled.opened_values.trace_local[:1]
    assert not A.check_attestation(dummy, mangled, FibonacciAir(), FC,
                                   use_device_verifier=False)
    # multi-proof variant shares the guards
    mb = A.MultiAttestationBundle(
        stark=small_proof, samples=[[0] * 4], gamma=(1, 1), acc=(0, 0),
        acc_out=(0, 0), att_fri_config=A.DEFAULT_ATT_FRI_CONFIG, n_rows=4)
    assert not A.check_attestations(mb, [mangled], FibonacciAir(), FC,
                                    use_device_verifier=False)


def test_canonical_accs_match_trace(attestation_parts):
    """fold_accumulators (checker-side, no states) agrees with the trace's
    running accumulator columns (builder-side, from actual lane values)."""
    from plonky25_tpu.models.poseidon2_air import ACC_OFF, ACCO_OFF

    _, _, rows, gamma, acc, acco, trace = attestation_parts
    assert (int(trace[-1][ACC_OFF]), int(trace[-1][ACC_OFF + 1])) == acc
    assert (int(trace[-1][ACCO_OFF]), int(trace[-1][ACCO_OFF + 1])) == acco


@pytest.mark.slow
def test_attest_roundtrip_and_tamper(small_proof):
    """Int-oracle prover/verifier variant: exercises the full protocol
    without the XLA:CPU pathological compile of the 522-wide module (the
    device path is exercised on TPU, scripts/attest_bench.py)."""
    bundle = A.attest(small_proof, FibonacciAir(), FC, att_fri_config=ATT_FC,
                      use_device_prover=False)
    chk = lambda b, p, fc: A.check_attestation(
        b, p, FibonacciAir(), fc, use_device_verifier=False,
        att_fri_config=ATT_FC)
    assert chk(bundle, small_proof, FC)

    # the checker pins the attestation security level: a bundle claiming a
    # weaker att config than the checker demands is rejected outright
    # (advisor finding r2: attacker-supplied att_fri_config made the STARK
    # check vacuous)
    weak = copy.deepcopy(bundle)
    weak.att_fri_config = FriConfig(log_blowup=1, num_queries=0,
                                    proof_of_work_bits=0)
    assert not chk(weak, small_proof, FC)

    # trailing extra samples are rejected (exact consumption; advisor r2)
    extra = copy.deepcopy(bundle)
    extra.samples.append(12345)
    assert not chk(extra, small_proof, FC)

    # a failed verification cannot be attested
    bad = copy.deepcopy(small_proof)
    bad.opening_proof.fri_proof.pow_witness += 1
    with pytest.raises(A.CannotAttest):
        A.attest(bad, FibonacciAir(), FC, att_fri_config=ATT_FC,
                 use_device_prover=False)

    # tampered bundles are rejected
    b = copy.deepcopy(bundle)
    b.acc = (b.acc[0] ^ 1, b.acc[1])
    assert not chk(b, small_proof, FC)
    b = copy.deepcopy(bundle)
    b.samples[0] += 1
    assert not chk(b, small_proof, FC)

    # a bundle for proof X does not attest proof Y
    other = refimpl_prove(FibonacciAir(), fibonacci_trace(8),
                          FriConfig(log_blowup=1, num_queries=3,
                                    proof_of_work_bits=1))
    assert not chk(bundle, other,
                   FriConfig(log_blowup=1, num_queries=3,
                             proof_of_work_bits=1))


@pytest.mark.slow
def test_attest_many_aggregates(small_proof):
    """One STARK attesting a batch of verifications (aggregation — the
    amortized form of the reference's recursion)."""
    other = refimpl_prove(FibonacciAir(), fibonacci_trace(16), FC)
    proofs = [small_proof, other]
    bundle = A.attest_many(proofs, FibonacciAir(), FC,
                           att_fri_config=ATT_FC, use_device_prover=False)
    chk = lambda b, ps: A.check_attestations(
        b, ps, FibonacciAir(), FC, use_device_verifier=False,
        att_fri_config=ATT_FC)
    assert chk(bundle, proofs)
    # order matters; wrong batch rejected
    assert not chk(bundle, [other, small_proof])
    assert not chk(bundle, [small_proof])
    # tampering one proof's samples kills the whole bundle
    b = copy.deepcopy(bundle)
    b.samples[1][0] += 1
    assert not chk(b, proofs)
    # a batch containing a bad proof cannot be attested
    bad = copy.deepcopy(other)
    bad.opening_proof.fri_proof.pow_witness += 1
    with pytest.raises(A.CannotAttest):
        A.attest_many([small_proof, bad], FibonacciAir(), FC,
                      att_fri_config=ATT_FC, use_device_prover=False)


def test_level_sync_builder_matches_host_oracle(attestation_parts):
    from plonky25_tpu.fields.goldilocks import to_u64_np

    _, _, rows, gamma, acc, acco, trace = attestation_parts
    core_h, sel_h, b_h, m_h, mo_h, h_h = A._rows_to_trace_host(rows)
    core_d, sel_f, b_f, m_f, mo_f, h_f = A._rows_to_trace(rows)
    assert h_h == h_f
    assert np.array_equal(np.asarray(core_h, dtype=np.uint64),
                          to_u64_np(core_d))
    assert np.array_equal(sel_h, sel_f) and np.array_equal(b_h, b_f)
    assert np.array_equal(m_h, m_f) and np.array_equal(mo_h, mo_f)
    # the device-column form matches the host row-major trace
    cols = A.build_attestation_trace_cols(rows, gamma)
    host = A.build_attestation_trace(rows, gamma)
    assert np.array_equal(to_u64_np(cols).T, host)


def test_device_instrumented_verify_matches_oracle(small_proof):
    """The device-side instrumented verification (samples + fold leaves)
    agrees with the python oracle bit-for-bit."""
    ok, samples, leaves = A._device_instrumented_verify(
        small_proof, FibonacciAir(), FC)
    ch = A._RecordingChallenger()
    tr = refimpl_verify(small_proof, FibonacciAir(), FC, challenger=ch)
    assert ok and tr.ok
    assert samples == ch.samples
    assert leaves == tr.fold_leaves


@pytest.mark.slow
def test_bundle_serialization_roundtrip(small_proof):
    """JSON save/load of attestation bundles (reference precedent: the
    output proof persisted at src/p3/mod.rs:261): a re-loaded bundle
    checks out-of-process, byte-identically."""
    import json
    import subprocess
    import sys
    import tempfile

    bundle = A.attest(small_proof, FibonacciAir(), FC, att_fri_config=ATT_FC,
                      use_device_prover=False)
    blob = json.dumps(A.bundle_to_json(bundle))
    again = A.bundle_from_json(json.loads(blob))
    assert A.bundle_to_json(again) == A.bundle_to_json(bundle)
    assert A.check_attestation(again, small_proof, FibonacciAir(), FC,
                               use_device_verifier=False,
                               att_fri_config=ATT_FC)
    # multi-bundle form round-trips through the same entry points
    mb = A.attest_many([small_proof], FibonacciAir(), FC,
                       att_fri_config=ATT_FC, use_device_prover=False)
    again_mb = A.bundle_from_json(json.loads(json.dumps(A.bundle_to_json(mb))))
    assert isinstance(again_mb, A.MultiAttestationBundle)
    assert A.check_attestations(again_mb, [small_proof], FibonacciAir(), FC,
                                use_device_verifier=False,
                                att_fri_config=ATT_FC)
    # cross-process: save to disk, re-check from a fresh interpreter
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        path = f.name
    A.save_bundle(bundle, path)
    import os
    proof_path = path + ".proof"
    from plonky25_tpu.proof import proof_to_json
    with open(proof_path, "w") as f:
        json.dump(proof_to_json(small_proof), f)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import json\n"
        "from plonky25_tpu import attest as A, load_proof\n"
        "from plonky25_tpu.proof import FriConfig\n"
        "from plonky25_tpu.models.fibonacci import FibonacciAir\n"
        f"b = A.load_bundle({path!r})\n"
        f"p = load_proof({proof_path!r})\n"
        "fc = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)\n"
        "att = FriConfig(log_blowup=1, num_queries=10, proof_of_work_bits=4)\n"
        "ok = A.check_attestation(b, p, FibonacciAir(), fc,\n"
        "                         use_device_verifier=False,\n"
        "                         att_fri_config=att)\n"
        "print('CROSSPROC', ok)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=600)
    assert "CROSSPROC True" in out.stdout, out.stderr[-2000:]
    os.unlink(path)
    os.unlink(proof_path)
