"""In-trace recursion compression (r5): 'w' rows, the chain-digest gamma
protocol (v3), the zero-proof slot template, and the composed-attestation
checker — the framework's analogue of the reference folding the inner
verification into the outer circuit (src/p3/verifier.rs:100-240), where
checking a composed proof never re-marshals the inner schedule.

The full depth-2 prove->check roundtrip runs on TPU
(scripts/composed_bench.py; the outer VerifierAir STARK is too wide for
the XLA:CPU tier) — this file covers every binding the roundtrip relies
on at the canonical/trace level, including the depth-2 tamper battery.
"""

import copy

import numpy as np
import pytest

import plonky25_tpu.attest as A
import plonky25_tpu.attest_program as ap
from plonky25_tpu.air import VerifierConstraintFolder
from plonky25_tpu.constants import GOLDILOCKS_P as P
from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.models.poseidon2_air import OUT_OFF
from plonky25_tpu.models.verifier_air import VerifierAir
from plonky25_tpu.proof import FriConfig, derive_config
from plonky25_tpu.refimpl.field import Gl2
from plonky25_tpu.refimpl.prover import prove as refimpl_prove
from plonky25_tpu.refimpl.verifier import IntExtOps

FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
ATT_FC = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)


@pytest.fixture(scope="module")
def small_proof():
    return refimpl_prove(FibonacciAir(), fibonacci_trace(8), FC)


@pytest.fixture(scope="module")
def inner(small_proof):
    return A.attest(small_proof, FibonacciAir(), FC, att_fri_config=ATT_FC,
                    use_device_prover=False)


@pytest.fixture(scope="module")
def inner_parts(small_proof, inner):
    cfg = derive_config(small_proof, FC)
    rows = ap.build_verification_schedule(small_proof, cfg, FibonacciAir(),
                                          inner.samples)
    return cfg, rows


def test_zero_proof_template_structure(small_proof, inner, inner_parts):
    """The value-free shape template recovers the inner schedule's exact
    slot structure: same row count, same slot-id stream, same control
    bits, same pair exponents — everything the compressed checker needs,
    with the target proof's bytes never read."""
    cfg, rows = inner_parts
    zp = ap.make_zero_proof(cfg)
    from plonky25_tpu.errors import check_proof_shape

    check_proof_shape(zp, cfg)           # shape-true by construction
    trows = ap.build_verification_schedule(zp, cfg, FibonacciAir(),
                                           inner.samples)
    assert len(trows) == len(rows) == inner.n_rows
    assert ([s for r in trows for s, _ in ap.canonical_slots(r)]
            == [s for r in rows for s, _ in ap.canonical_slots(r)])
    assert ([ap._control_bits(r) for r in trows]
            == [ap._control_bits(r) for r in rows])
    assert ap.pair_exponents(trows) == ap.pair_exponents(rows)


def test_chain_gamma_matches_in_trace_digest(inner, inner_parts):
    """derive_gammas (protocol v3 sponge chain) equals the digest the 'w'
    rows recompute: build the compression rows, resolve their hash
    chains, and read the exposed lanes."""
    cfg, rows = inner_parts
    pairs = ap.sequence_pairs(rows)
    crows = ap.build_compression_rows(len(rows), pairs,
                                      ap.pair_exponents(rows),
                                      inner.gamma, inner.acc)
    ap.execute_program(crows)            # terminal ACC assert passes
    g_out = ap.derive_gammas(crows)
    trace = ap.build_trace_rowmajor(crows, g_out)
    g_row = next(i for i, r in enumerate(crows) if r.sel == "g")
    assert (int(trace[g_row][OUT_OFF]),
            int(trace[g_row][OUT_OFF + 1])) == tuple(inner.gamma)


def test_compression_rows_reject_tampered_inputs(inner, inner_parts):
    """Executing the compression program against a corrupted inner
    sequence or accumulator raises at the terminal ACC assert."""
    cfg, rows = inner_parts
    pairs = ap.sequence_pairs(rows)
    exps = ap.pair_exponents(rows)

    bad_pairs = list(pairs)
    s, v = bad_pairs[7]
    bad_pairs[7] = (s, (v + 1) % P)
    with pytest.raises(AssertionError):
        ap.execute_program(ap.build_compression_rows(
            len(rows), bad_pairs, exps, inner.gamma, inner.acc))

    bad_acc = ((inner.acc[0] + 1) % P, inner.acc[1])
    with pytest.raises(AssertionError):
        ap.execute_program(ap.build_compression_rows(
            len(rows), pairs, exps, inner.gamma, bad_acc))


def test_tampered_w_trace_violates_constraints(inner, inner_parts):
    """Depth-2 tamper battery, trace level: corrupting a witnessed inner
    pair value inside the outer trace breaks a constraint (the sel_w
    ua-tie / FMA / chain-carry conjunction), and corrupting the exposed
    digest breaks the accumulator binding."""
    cfg, rows = inner_parts
    pairs = ap.sequence_pairs(rows)
    crows = ap.build_compression_rows(len(rows), pairs,
                                      ap.pair_exponents(rows),
                                      inner.gamma, inner.acc)
    g_out = ap.derive_gammas(crows)
    acc_out = ap.fold_accumulator(crows, g_out)
    trace = ap.build_trace_rowmajor(crows, g_out)
    air = VerifierAir({"gamma": g_out, "acc": acc_out})

    class _M:
        pass

    def eval_rows(tr, idxs):
        h = len(tr)
        ops = IntExtOps()
        bad = []
        for r in idxs:
            m = _M()
            m.local_vec = ops.stack([Gl2.from_base(int(v)) for v in tr[r]])
            m.next_vec = ops.stack(
                [Gl2.from_base(int(v)) for v in tr[(r + 1) % h]])
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
                if not (all(x == 0 for x in a0) and all(x == 0 for x in a1)):
                    bad.append((r, ci))
        return bad

    w_row = next(i for i, r in enumerate(crows) if r.sel == "w")
    cap_row = next(i for i, r in enumerate(crows) if r.cap)
    g_row = next(i for i, r in enumerate(crows) if r.sel == "g")
    # the valid trace satisfies the sampled rows (incl. captures/combine)
    ok_idx = [0, w_row, w_row + 1, cap_row - 1, cap_row, cap_row + 1,
              g_row - 1, g_row, g_row + 1, len(crows) - 1,
              len(trace) - 1]
    assert eval_rows(trace, ok_idx) == []

    def tampered(r, c):
        t = [list(x) for x in trace]
        t[r][c] = (t[r][c] + 1) % P
        return t

    # witnessed pair VALUE lane (in_1): ua-tie or FMA breaks
    assert eval_rows(tampered(w_row, 1), [w_row - 1, w_row]) != []
    # witnessed pair SLOT lane (in_0): the permutation core witness breaks
    assert eval_rows(tampered(w_row, 0), [w_row - 1, w_row]) != []
    # exposed digest lane on the combine row: accumulator binding
    assert eval_rows(tampered(g_row, OUT_OFF), [g_row]) != []
    # a captured digest register: the cap tie or the 'g' lane binding
    from plonky25_tpu.models.verifier_air import R_OFF

    assert eval_rows(tampered(cap_row, R_OFF),
                     [cap_row - 1, cap_row, cap_row + 1]) != []
    # a 'g' input lane: breaks the register-lane equality
    assert eval_rows(tampered(g_row, 0), [g_row - 1, g_row]) != []


def test_check_composed_rejects_tampered_bindings(small_proof, inner,
                                                  inner_parts):
    """Depth-2 tamper battery, checker level: a composed bundle whose
    inner gamma, inner acc, inner samples, row count, shape, or statement
    is corrupted fails closed BEFORE any outer-STARK verification (the
    canonical outer schedule the checker rebuilds no longer matches the
    bundle's binding values)."""
    cfg, rows = inner_parts
    # an outer bundle with the TRUE canonical binding values (the stark
    # inside is never reached on the tamper paths)
    v_air = A._verifier_air_of(inner)
    outer_samples = A._record_verification(inner.stark, v_air, ATT_FC,
                                           use_device=False)
    comp = ap.build_compression_rows(
        len(rows), ap.sequence_pairs(rows), ap.pair_exponents(rows),
        inner.gamma, inner.acc)
    outer_cfg = derive_config(inner.stark, ATT_FC)
    outer_rows = ap.build_verification_schedule(
        inner.stark, outer_cfg, v_air, outer_samples) + comp
    gamma_o = ap.derive_gammas(outer_rows)
    acc_o = ap.fold_accumulator(outer_rows, gamma_o)
    outer = A.AttestationBundle(
        stark=inner.stark,     # placeholder: tamper paths stop before it
        samples=list(outer_samples), gamma=gamma_o, acc=acc_o,
        att_fri_config=ATT_FC, n_rows=len(outer_rows))
    c = A.ComposedAttestation(
        outer=outer, inner_stark=inner.stark,
        inner_gamma=tuple(inner.gamma), inner_acc=tuple(inner.acc),
        inner_samples=list(inner.samples), inner_n_rows=inner.n_rows,
        target_shape=A._target_shape_of(cfg))
    c.statement = A.composed_statement_digest(c)

    def chk(cc):
        return A.check_composed(cc, FibonacciAir(), FC,
                                use_device_verifier=False,
                                att_fri_config=ATT_FC)

    def mutate(**kw):
        cc = copy.deepcopy(c)
        for k, v in kw.items():
            setattr(cc, k, v)
        cc.statement = A.composed_statement_digest(cc)
        return cc

    # corrupt inner gamma -> the checker's compression weights change ->
    # canonical outer gamma mismatch
    assert not chk(mutate(inner_gamma=((c.inner_gamma[0] + 1) % P,
                                       c.inner_gamma[1])))
    # corrupt inner acc -> the terminal assert row's canonical value
    # changes -> canonical outer gamma mismatch
    assert not chk(mutate(inner_acc=((c.inner_acc[0] + 1) % P,
                                     c.inner_acc[1])))
    # corrupt an inner sample (a beta) -> template structure/values shift
    bad_samples = list(c.inner_samples)
    bad_samples[2] = (bad_samples[2] + 1) % P
    assert not chk(mutate(inner_samples=bad_samples))
    # corrupt the inner row count
    assert not chk(mutate(inner_n_rows=c.inner_n_rows + 1))
    # corrupt the target shape
    bad_shape = dict(c.target_shape)
    bad_shape["trace_width"] = 99
    assert not chk(mutate(target_shape=bad_shape))
    # stale statement
    cc = copy.deepcopy(c)
    cc.inner_gamma = ((c.inner_gamma[0] + 1) % P, c.inner_gamma[1])
    assert not chk(cc)                   # statement no longer matches
    # pow gate on the inner samples
    bad_samples = list(c.inner_samples)
    pow_i = ap.n_presamples(cfg, 0) - 1
    bad_samples[pow_i] |= 1
    assert not chk(mutate(inner_samples=bad_samples))


def test_composed_json_roundtrip(small_proof, inner, inner_parts):
    cfg, rows = inner_parts
    outer = A.AttestationBundle(
        stark=inner.stark, samples=[1, 2], gamma=(3, 4), acc=(5, 6),
        att_fri_config=ATT_FC, n_rows=7)
    c = A.ComposedAttestation(
        outer=outer, inner_stark=inner.stark,
        inner_gamma=tuple(inner.gamma), inner_acc=tuple(inner.acc),
        inner_samples=list(inner.samples), inner_n_rows=inner.n_rows,
        target_shape=A._target_shape_of(cfg))
    c.statement = A.composed_statement_digest(c)
    import json

    again = A.composed_from_json(json.loads(json.dumps(
        A.composed_to_json(c))))
    assert again.inner_gamma == c.inner_gamma
    assert again.target_shape == c.target_shape
    assert again.statement == c.statement
    assert A.composed_statement_digest(again) == c.statement


def test_checker_outer_schedule_equals_prover_outer_schedule(
        small_proof, inner, inner_parts):
    """The compressed checker's canonical outer schedule (zero-proof
    template compression + inner-stark verification schedule) is
    canonically IDENTICAL to the prover's (real-values) one: same slot
    stream, same control bits — so the gammas/accs derived on both sides
    agree and the outer STARK proves/checks against the same binding."""
    cfg, rows = inner_parts
    v_air = A._verifier_air_of(inner)
    outer_samples = A._record_verification(inner.stark, v_air, ATT_FC,
                                           use_device=False)
    outer_cfg = derive_config(inner.stark, ATT_FC)
    base = ap.build_verification_schedule(inner.stark, outer_cfg, v_air,
                                          outer_samples)
    prover_rows = base + ap.build_compression_rows(
        len(rows), ap.sequence_pairs(rows), ap.pair_exponents(rows),
        inner.gamma, inner.acc)
    template = ap.build_verification_schedule(
        ap.make_zero_proof(cfg), cfg, FibonacciAir(), inner.samples)
    checker_rows = base + ap.build_compression_rows(
        len(template), ap.sequence_pairs(template),
        ap.pair_exponents(template), inner.gamma, inner.acc)
    assert len(prover_rows) == len(checker_rows)
    assert ([ap.canonical_slots(r) for r in prover_rows]
            == [ap.canonical_slots(r) for r in checker_rows])
    assert (ap.derive_gammas(prover_rows)
            == ap.derive_gammas(checker_rows))
