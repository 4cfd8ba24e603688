"""Multi-stage STARK core: stage-2 commitment after transcript challenges.

Validates the framework's multi-stage mechanism (air.py stage2_width /
num_challenges / build_stage2) on the minimal RlcAir — prove/verify
round-trips on both backends, JSON round-trip of stage-2 proofs, and a
tamper battery over the new proof fields.
"""

import copy
import random

import pytest

from plonky25_tpu.models.rlc_air import RlcAir
from plonky25_tpu.proof import (
    FriConfig,
    derive_config,
    proof_from_json,
    proof_to_json,
)
from plonky25_tpu.refimpl.prover import prove
from plonky25_tpu.refimpl.verifier import verify

FC = FriConfig(log_blowup=1, num_queries=8, proof_of_work_bits=4)


@pytest.fixture(scope="module")
def rlc_proof():
    rng = random.Random(7)
    trace = [[rng.randrange(1 << 63), rng.randrange(1 << 63)]
             for _ in range(16)]
    return prove(RlcAir(), trace, FC), trace


def test_refimpl_roundtrip(rlc_proof):
    proof, _ = rlc_proof
    assert proof.commitments.stage2 is not None
    assert len(proof.opened_values.stage2_local) == 2
    assert len(proof.opening_proof.query_openings[0]) == 3
    tr = verify(proof, RlcAir(), FC)
    assert tr.ok, (tr.pow_ok, tr.merkle_ok, tr.fold_ok, tr.quotient_ok)


def test_json_roundtrip(rlc_proof):
    import json

    proof, _ = rlc_proof
    blob = json.dumps(proof_to_json(proof))
    again = proof_from_json(json.loads(blob))
    assert proof_to_json(again) == proof_to_json(proof)
    cfg = derive_config(again, FC)
    assert cfg.stage2_width == 2
    assert verify(again, RlcAir(), FC).ok


def test_tamper_stage2_opened(rlc_proof):
    proof, _ = rlc_proof
    bad = copy.deepcopy(proof)
    c0, c1 = bad.opened_values.stage2_local[0]
    bad.opened_values.stage2_local[0] = ((c0 + 1) % ((1 << 64) - (1 << 32) + 1), c1)
    assert not verify(bad, RlcAir(), FC).ok


def test_tamper_stage2_commitment(rlc_proof):
    proof, _ = rlc_proof
    bad = copy.deepcopy(proof)
    bad.commitments.stage2.value = list(bad.commitments.stage2.value)
    bad.commitments.stage2.value[0] ^= 1
    assert not verify(bad, RlcAir(), FC).ok


def test_tamper_stage2_leaf(rlc_proof):
    proof, _ = rlc_proof
    bad = copy.deepcopy(proof)
    row = bad.opening_proof.query_openings[0][1].opened_values[0]
    row[0] = (row[0] + 1) % ((1 << 64) - (1 << 32) + 1)
    tr = verify(bad, RlcAir(), FC)
    assert not tr.ok and not tr.merkle_ok


def test_stage2_required(rlc_proof):
    proof, _ = rlc_proof
    bad = copy.deepcopy(proof)
    bad.commitments.stage2 = None
    assert not verify(bad, RlcAir(), FC).ok


def test_device_verifier_multistage(rlc_proof):
    """TpuVerifier handles the 3-batch multi-stage layout: transcript
    challenges, stage-2 commitment observe, stage-2 reduced-opening terms,
    and folder.challenges in the constraint finale."""
    from plonky25_tpu.verifier import verify_proof

    proof, _ = rlc_proof
    res = verify_proof(proof, RlcAir(), FC)
    assert res.shape_ok
    assert bool(res.ok), (
        bool(res.pow_ok), bool(res.merkle_ok),
        bool(res.fold_ok), bool(res.quotient_ok),
    )

    bad = copy.deepcopy(proof)
    c0, c1 = bad.opened_values.stage2_local[0]
    bad.opened_values.stage2_local[0] = (
        (c0 + 1) % ((1 << 64) - (1 << 32) + 1), c1)
    assert not bool(verify_proof(bad, RlcAir(), FC).ok)

    bad2 = copy.deepcopy(proof)
    bad2.commitments.stage2.value = list(bad2.commitments.stage2.value)
    bad2.commitments.stage2.value[0] ^= 1
    assert not bool(verify_proof(bad2, RlcAir(), FC).ok)


def test_stage2_wrong_gamma_binding(rlc_proof):
    """A stage-2 matrix built against the WRONG challenge must fail: swap
    the stage-2 columns of two otherwise-identical proofs with different
    main traces (so their sampled gammas differ)."""
    proof, trace = rlc_proof
    other_trace = [[(a + 1) % 97, b] for a, b in trace]
    other = prove(RlcAir(), other_trace, FC)
    bad = copy.deepcopy(proof)
    bad.opened_values.stage2_local = other.opened_values.stage2_local
    bad.opened_values.stage2_next = other.opened_values.stage2_next
    assert not verify(bad, RlcAir(), FC).ok


# ---- multi-stage proofs through the parallel verification paths --------

def test_batch_verifier_multistage(rlc_proof):
    """BatchVerifier routes the third Merkle batch, stage-2 reduced
    openings, and transcript challenges across the proof axis."""
    import numpy as np

    from plonky25_tpu.parallel.batch import BatchVerifier

    proof, _ = rlc_proof
    bv = BatchVerifier(RlcAir(), derive_config(proof, FC))
    oks = bv.verify([proof, proof])
    assert np.asarray(oks).tolist() == [True, True]

    bad = copy.deepcopy(proof)
    c0, c1 = bad.opened_values.stage2_local[0]
    bad.opened_values.stage2_local[0] = ((c0 + 1) % ((1 << 64) - (1 << 32) + 1), c1)
    oks = bv.verify([proof, bad])
    assert np.asarray(oks).tolist() == [True, False]


def test_sharded_verifier_multistage(rlc_proof):
    import jax
    import numpy as np

    from plonky25_tpu.parallel import ShardedVerifier, make_mesh

    proof, _ = rlc_proof
    sv = ShardedVerifier(RlcAir(), derive_config(proof, FC), make_mesh(8))
    assert bool(np.asarray(sv.verify(proof).ok))


def test_multihost_verifier_multistage(rlc_proof):
    import jax
    import numpy as np

    from plonky25_tpu.parallel import MultiHostBatchVerifier, make_host_mesh

    proof, _ = rlc_proof
    m2 = make_host_mesh(n_query=4, devices=jax.devices()[:8])
    mv = MultiHostBatchVerifier(RlcAir(), derive_config(proof, FC), m2)
    ok_b, all_ok = mv.verify([proof, proof])
    assert np.asarray(ok_b).tolist() == [True, True]
    assert bool(np.asarray(all_ok))


def test_device_prover_multistage(rlc_proof):
    """TpuProver's stage-2 commit path (device-resident build via
    RlcAir.build_stage2_device) produces bytes identical to the refimpl
    oracle's (refimpl/prover.py:127-140)."""
    from plonky25_tpu.prover.prove import prove_on_device

    oracle_proof, trace = rlc_proof
    dev = prove_on_device(RlcAir(), trace, FC)
    assert proof_to_json(dev) == proof_to_json(oracle_proof)
    assert verify(dev, RlcAir(), FC).ok


@pytest.mark.slow
def test_device_prover_multistage_host_fallback(rlc_proof):
    """Without build_stage2_device the prover syncs the challenges to host
    and runs Air.build_stage2 — same bytes."""
    from plonky25_tpu.prover.prove import TpuProver

    class _HostRlc(RlcAir):
        build_stage2_device = None

    oracle_proof, trace = rlc_proof
    dev = TpuProver(_HostRlc(), 4, FC).prove(trace)
    assert proof_to_json(dev) == proof_to_json(oracle_proof)


@pytest.mark.slow
def test_batch_prover_multistage(rlc_proof):
    """BatchProver threads the stage-2 commit through the vmapped
    pipeline: every batch lane byte-equal to the sequential prover."""
    from plonky25_tpu.prover.batch_prove import prove_batch_on_device

    oracle_proof, trace = rlc_proof
    rng = random.Random(23)
    trace_b = [[rng.randrange(1 << 63), rng.randrange(1 << 63)]
               for _ in range(16)]
    oracle_b = prove(RlcAir(), trace_b, FC)
    got = prove_batch_on_device(RlcAir(), [trace, trace_b], FC)
    assert proof_to_json(got[0]) == proof_to_json(oracle_proof)
    assert proof_to_json(got[1]) == proof_to_json(oracle_b)


class _FlexAir(RlcAir):
    """Same name + dims in single- and multi-stage form (cache-key probe)."""

    def __init__(self, two_stage: bool):
        self.two_stage = two_stage

    def name(self) -> str:
        return "FlexRlc"

    def stage2_width(self) -> int:
        return 2 if self.two_stage else 0

    def num_challenges(self) -> int:
        return 1 if self.two_stage else 0

    def eval(self, folder):
        if self.two_stage:
            return RlcAir.eval(self, folder)
        ops = folder.ops
        a, _ = folder.main.trace_local
        an, _ = folder.main.trace_next
        folder.when_transition().assert_eq(an, a)  # constant column a


def test_verifier_cache_mixed_stage_order():
    """A single-stage and a multi-stage proof agreeing on every other
    config field must not share a cached verifier: warming the cache with
    the single-stage shape first used to falsely reject the multi-stage
    proof (get_verifier key omitted stage2_width; VERDICT r3 weak #6)."""
    from plonky25_tpu.verifier import verify_proof

    rng = random.Random(11)
    trace1 = [[5, rng.randrange(1 << 63)] for _ in range(16)]
    p1 = prove(_FlexAir(False), trace1, FC)
    assert p1.commitments.stage2 is None

    trace2 = [[rng.randrange(1 << 63), rng.randrange(1 << 63)]
              for _ in range(16)]
    p2 = prove(_FlexAir(True), trace2, FC)
    cfg1, cfg2 = derive_config(p1, FC), derive_config(p2, FC)
    assert (cfg1.log_trace_height, cfg1.trace_width,
            cfg1.degree_bits) == (cfg2.log_trace_height, cfg2.trace_width,
                                  cfg2.degree_bits)

    # single-stage first warms the cache, then the multi-stage proof (and
    # the single-stage again, in case the multi-stage entry overwrote it)
    assert bool(verify_proof(p1, _FlexAir(False), FC).ok)
    r2 = verify_proof(p2, _FlexAir(True), FC)
    assert r2.shape_ok and bool(r2.ok)
    assert bool(verify_proof(p1, _FlexAir(False), FC).ok)


def _mutation_sites(node, path=()):
    """All (path, kind) mutation sites in a JSON tree (mirrors
    test_errors_profiling's single-stage fuzz)."""
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _mutation_sites(v, path + (k,))
    elif isinstance(node, list):
        if node:
            yield (path, "del")
        for i, v in enumerate(node):
            yield from _mutation_sites(v, path + (i,))
    elif isinstance(node, int):
        yield (path, "bump")


def _apply_mut(obj, path, kind):
    node = obj
    for key in path[:-1]:
        node = node[key]
    if kind == "del":
        node[path[-1]] = node[path[-1]][:-1]
    else:
        node[path[-1]] = node[path[-1]] + 1


def test_multistage_structural_fuzz(rlc_proof):
    """Every sampled single-field mutation of a multi-stage proof's JSON
    either fails shape validation or verifies False on the device
    verifier — never an uncaught exception (extends the single-stage
    fuzz of test_errors_profiling to the stage-2 fields)."""
    import json

    import jax.numpy as jnp

    from plonky25_tpu.verifier import verify_proof

    proof, _ = rlc_proof
    base = proof_to_json(proof)
    sites = list(_mutation_sites(base))
    # bias toward stage-2 structure: every site whose path mentions the
    # stage-2 fields, plus a stride sample of the rest
    s2 = [s for s in sites if any("stage2" in str(k) for k in s[0])]
    rest = [s for s in sites if s not in s2]
    stride = max(1, len(rest) // 40)
    sample = s2[:40] + rest[::stride]

    air = RlcAir()
    n_shape = n_value = 0
    for path, kind in sample:
        mutant = copy.deepcopy(base)
        _apply_mut(mutant, path, kind)
        try:
            p = proof_from_json(mutant)
        except Exception:
            n_shape += 1
            continue
        r = verify_proof(p, air, FC)
        if not r.shape_ok:
            n_shape += 1
        else:
            assert not bool(jnp.asarray(r.ok)), (
                f"multistage mutant {kind} at {path} verified OK")
            n_value += 1
    assert n_shape > 0 and n_value > 0


def test_challenges_without_stage2_rejected():
    """An AIR declaring transcript challenges but no stage-2 matrix is a
    construction-time error everywhere (device verifier, both provers):
    the refimpl samples num_challenges() unconditionally while the device
    verifier gates on stage2_width, so such an AIR would silently get a
    divergent Fiat-Shamir transcript (r4 advisor finding)."""
    from plonky25_tpu.air import Air, check_multistage_consistency
    from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace

    class BadAir(FibonacciAir):
        def num_challenges(self):
            return 1

    with pytest.raises(ValueError):
        check_multistage_consistency(BadAir())
    with pytest.raises(ValueError):
        prove(BadAir(), fibonacci_trace(8), FC)
    from plonky25_tpu.prover.prove import TpuProver
    with pytest.raises(ValueError):
        TpuProver(BadAir(), 3, FC)
    # sanity: the consistent base AIR passes
    check_multistage_consistency(FibonacciAir())
    check_multistage_consistency(RlcAir())
