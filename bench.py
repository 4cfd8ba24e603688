"""Benchmark harness: FRI query verifications per second per chip.

Workload: BASELINE config 1 - full verification of the golden fib(64)
Plonky3 proof (artifacts/proof_fibonacci.json): transcript, 2 Merkle batch
openings + reduced openings + 6-level FRI fold over 100 queries, AIR
finale.  The metric counts verified FRI queries per second on one chip
(north star: >= 10k/s aggregate on a v5e-16 => 625/s/chip baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Note: on the axon TPU platform jax.block_until_ready does not reliably
synchronize; every timed iteration forces a device->host transfer of the
verdict instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

ARTIFACT = "/root/reference/artifacts/proof_fibonacci.json"
BASELINE_QPS_PER_CHIP = 10_000.0 / 16.0  # north-star 10k/s on v5e-16


def main():
    from plonky25_tpu.models.fibonacci import FibonacciAir
    from plonky25_tpu.parallel import BatchVerifier, tile_witness
    from plonky25_tpu.proof import FriConfig, load_proof, derive_config
    from plonky25_tpu.verifier import get_verifier
    from plonky25_tpu.witness import pack_witness

    proof = load_proof(ARTIFACT)
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    config = derive_config(proof, fc)
    v = get_verifier(FibonacciAir(), config)
    w = pack_witness(proof, config)
    w = jax.device_put(w)

    # single-proof path must accept (correctness gate for the bench)
    r = v.verify_witness(w)
    ok = bool(np.asarray(r.ok))
    assert ok, "golden proof must verify"

    # throughput: B proofs per dispatch (amortizes stage-dispatch latency,
    # which dominates for one tiny proof over the TPU tunnel)
    # throughput saturates at B=2048 on v5e-1 (385k q/s/chip; B=32 gave
    # 74k — small batches are dispatch-bound over the TPU tunnel)
    B = int(os.environ.get("BENCH_BATCH", "2048"))
    bv = BatchVerifier(FibonacciAir(), config)
    ws = jax.device_put(tile_witness(w, B))
    oks = bv.verify_witnesses(ws)           # warmup / compile
    assert bool(np.asarray(oks).all())

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.time()
    for _ in range(iters):
        oks = bv.verify_witnesses(ws)
        ok &= bool(np.asarray(oks).all())
    dt = time.time() - t0
    assert ok

    queries_per_sec = fc.num_queries * B * iters / dt
    result = {
        "metric": "fri_query_verifications_per_sec_per_chip",
        "value": round(queries_per_sec, 1),
        "unit": "queries/s/chip",
        "vs_baseline": round(queries_per_sec / BASELINE_QPS_PER_CHIP, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
