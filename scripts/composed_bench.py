"""Depth-2 composed attestation on TPU: prove + check + cost table.

The r5 headline deliverable: attest the golden fib proof (depth 1), then
produce the COMPOSED attestation whose outer VerifierAir trace verifies
the inner STARK and re-derives the inner binding in-trace ('w' rows) —
and check it WITHOUT the target proof's bytes (plonky25_tpu.attest.
check_composed: zero-proof slot template + one outer schedule marshal +
one STARK verification).

Prints a cost table (rows, prove time, check time) for depth-1 vs
depth-2, the numbers BASELINE.md records.  Run stages separately to
bound wall-clock: `python scripts/composed_bench.py inner|outer|check`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plonky25_tpu import FriConfig, load_proof                 # noqa: E402
from plonky25_tpu.models.fibonacci import FibonacciAir          # noqa: E402
import plonky25_tpu.attest as A                                 # noqa: E402

ARTIFACT = "/root/reference/artifacts/proof_fibonacci.json"
INNER_PATH = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                          "attestation_fibonacci.json")
COMPOSED_PATH = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                             "composed_fibonacci.json")
FC = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)


def stage_inner():
    """Depth-1: attest the golden proof; persists the (protocol 3)
    golden attestation artifact."""
    proof = load_proof(ARTIFACT)
    air = FibonacciAir()
    t0 = time.time()
    inner = A.attest(proof, air, FC)
    t_att = time.time() - t0
    t0 = time.time()
    ok = A.check_attestation(inner, proof, air, FC)
    t_chk = time.time() - t0
    assert ok
    A.save_bundle(inner, INNER_PATH)
    print(json.dumps({"stage": "inner", "n_rows": inner.n_rows,
                      "attest_s": round(t_att, 1),
                      "check_s": round(t_chk, 2)}), flush=True)


def stage_outer():
    """Depth-2: the composed attestation (outer prove)."""
    proof = load_proof(ARTIFACT)
    air = FibonacciAir()
    inner = A.load_bundle(INNER_PATH)
    t0 = time.time()
    c = A.attest_composed(proof, air, FC, inner=inner)
    t_att = time.time() - t0
    with open(COMPOSED_PATH, "w") as f:
        json.dump(A.composed_to_json(c), f)
    print(json.dumps({"stage": "outer", "outer_n_rows": c.outer.n_rows,
                      "outer_degree_bits": c.outer.stark.degree_bits,
                      "attest_s": round(t_att, 1)}), flush=True)


def stage_check():
    """Depth-2 check: NO target-proof bytes touched."""
    air = FibonacciAir()
    with open(COMPOSED_PATH) as f:
        c = A.composed_from_json(json.load(f))
    t0 = time.time()
    ok = A.check_composed(c, air, FC)
    t_chk = time.time() - t0
    assert ok
    # warm re-check (compiled modules cached)
    t0 = time.time()
    ok = A.check_composed(c, air, FC)
    t_warm = time.time() - t0
    assert ok
    # tamper: corrupted inner binding rejected
    c2 = A.composed_from_json(json.load(open(COMPOSED_PATH)))
    c2.inner_acc = ((c2.inner_acc[0] + 1) % ((1 << 64) - (1 << 32) + 1),
                    c2.inner_acc[1])
    c2.statement = A.composed_statement_digest(c2)
    t0 = time.time()
    assert not A.check_composed(c2, air, FC)
    t_rej = time.time() - t0
    # strict mode: also pin the target bytes (one depth-1 marshal)
    proof = load_proof(ARTIFACT)
    assert A.check_composed(c, air, FC, target_proof=proof)
    print(json.dumps({"stage": "check", "check_cold_s": round(t_chk, 1),
                      "check_warm_s": round(t_warm, 2),
                      "tamper_reject_s": round(t_rej, 2)}), flush=True)


STAGES = {"inner": stage_inner, "outer": stage_outer,
          "check": stage_check}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for n in names:
        STAGES[n]()
    print("composed_bench: ALL OK")
