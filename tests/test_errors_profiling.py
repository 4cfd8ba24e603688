"""Typed error surface + profiling utilities (SURVEY.md §5 subsystems)."""

import copy

import numpy as np
import pytest

from plonky25_tpu import FriConfig, InvalidProofShape, check_proof_shape, derive_config
from plonky25_tpu.models import FibonacciAir
from plonky25_tpu.utils import StageTimer, measure_throughput

FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def test_check_proof_shape_accepts_golden(golden_proof):
    check_proof_shape(golden_proof, derive_config(golden_proof, FC))


def test_wrong_query_count_raises(golden_proof):
    bad_fc = FriConfig(log_blowup=1, num_queries=50, proof_of_work_bits=16)
    cfg = derive_config(golden_proof, bad_fc)
    with pytest.raises(InvalidProofShape, match="query proofs"):
        check_proof_shape(golden_proof, cfg)


def test_wrong_trace_width_is_shape_fail(golden_proof):
    from plonky25_tpu.verifier import get_verifier

    p = copy.deepcopy(golden_proof)
    p.opened_values.trace_local = p.opened_values.trace_local[:2]
    v = get_verifier(FibonacciAir(), derive_config(golden_proof, FC))
    assert not v.check_shape(p)
    r = v.verify(p)
    assert not bool(np.asarray(r.ok)) and not r.shape_ok


def test_stage_timer_and_throughput():
    t = StageTimer()
    import jax.numpy as jnp

    x = jnp.arange(8)
    with t.stage("double") as h:
        h["result"] = x * 2
    s = t.summary()
    assert s["double"]["n"] == 1 and s["double"]["total_s"] >= 0

    m = measure_throughput(lambda a: a + 1, (x,), n_items=8, iters=3)
    assert m["items_per_sec"] > 0
