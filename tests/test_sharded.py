"""Sharded verification on a virtual 8-device CPU mesh (SURVEY.md §4:
the multi-node substitute is xla_force_host_platform_device_count)."""

import jax
import numpy as np
import pytest

from plonky25_tpu.models.fibonacci import FibonacciAir
from plonky25_tpu.parallel import ShardedVerifier, make_mesh
from plonky25_tpu.proof import FriConfig, derive_config

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_golden_accepts(golden_proof, mesh):
    config = derive_config(golden_proof, FC)
    sv = ShardedVerifier(FibonacciAir(), config, mesh)
    assert sv.Q_pad == 104  # 100 padded to 8-multiple
    r = sv.verify(golden_proof)
    assert bool(np.asarray(r.ok))


def test_sharded_rejects_tamper(golden_proof, mesh):
    import copy

    p = copy.deepcopy(golden_proof)
    p.opening_proof.query_openings[99][1].opening_proof[0][0] ^= 4
    config = derive_config(p, FC)
    sv = ShardedVerifier(FibonacciAir(), config, mesh)
    r = sv.verify(p)
    assert not bool(np.asarray(r.ok))


def test_sharded_matches_unsharded(golden_proof, mesh):
    from plonky25_tpu.verifier import verify_proof

    r1 = verify_proof(golden_proof, FibonacciAir(), FC)
    config = derive_config(golden_proof, FC)
    r2 = ShardedVerifier(FibonacciAir(), config, mesh).verify(golden_proof)
    assert bool(np.asarray(r1.ok)) == bool(np.asarray(r2.ok)) == True  # noqa: E712
    assert list(np.asarray(r2.query_indices))[:100] == list(np.asarray(r1.query_indices))
