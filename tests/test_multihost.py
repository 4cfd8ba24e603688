"""Multi-host proof-batch aggregation on a virtual (b=2, q=4) CPU mesh
(SURVEY.md §2.3 deliverable 5; the multi-node substitute per §4 is
xla_force_host_platform_device_count)."""

import copy

import jax
import numpy as np
import pytest

from plonky25_tpu.models.fibonacci import FibonacciAir
from plonky25_tpu.parallel import MultiHostBatchVerifier, make_host_mesh
from plonky25_tpu.parallel.multihost import init_distributed
from plonky25_tpu.proof import FriConfig, derive_config

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_host_mesh(n_query=4, devices=jax.devices()[:8])  # (b=2, q=4)


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_distributed() is False


def test_multihost_batch_accepts_and_rejects(golden_proof, mesh):
    bad = copy.deepcopy(golden_proof)
    bad.opening_proof.query_openings[7][0].opening_proof[2][1] ^= 1

    config = derive_config(golden_proof, FC)
    mv = MultiHostBatchVerifier(FibonacciAir(), config, mesh)
    assert mv.n_batch == 2 and mv.n_query == 4 and mv.Q_pad == 100

    ok, all_ok = mv.verify([golden_proof, bad, golden_proof, golden_proof])
    ok = np.asarray(ok)
    assert ok.tolist() == [True, False, True, True]
    assert not bool(np.asarray(all_ok))


def test_multihost_matches_single_device_batch(golden_proof, mesh):
    from plonky25_tpu.parallel import BatchVerifier

    config = derive_config(golden_proof, FC)
    proofs = [golden_proof] * 2
    ok_mh, all_mh = MultiHostBatchVerifier(
        FibonacciAir(), config, mesh).verify(proofs)
    ok_sd = BatchVerifier(FibonacciAir(), config).verify(proofs)
    assert np.asarray(ok_mh).tolist() == np.asarray(ok_sd).tolist() == [True, True]
    assert bool(np.asarray(all_mh))


def test_batch_verifier_flattened_stage_verdict_mapping(golden_proof):
    """The natively batched hash stages flatten (B, Q) into one lane axis
    (verifier._batched_batch_fn/_batched_fold_fn, so the fused Pallas
    kernel can serve the whole batch); per-proof verdicts must map back
    correctly, including fold-stage-only tampers."""
    from plonky25_tpu.parallel import BatchVerifier

    P = (1 << 64) - (1 << 32) + 1
    bad_merkle = copy.deepcopy(golden_proof)
    bad_merkle.opening_proof.query_openings[3][0].opening_proof[1][2] ^= 3
    bad_fold = copy.deepcopy(golden_proof)
    qp = bad_fold.opening_proof.fri_proof.query_proofs[5]
    s = list(qp.commit_phase_openings[2].sibling_value)
    s[0] = (s[0] + 1) % P
    qp.commit_phase_openings[2].sibling_value = tuple(s)

    bv = BatchVerifier(FibonacciAir(), derive_config(golden_proof, FC))
    oks = np.asarray(bv.verify(
        [golden_proof, bad_merkle, golden_proof, bad_fold]))
    assert oks.tolist() == [True, False, True, False]
