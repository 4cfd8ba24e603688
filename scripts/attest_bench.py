"""Attest the golden artifact on device (the flagship recursion flow).

    python scripts/attest_bench.py [--small]

Builds the verification hash-trace of artifacts/proof_fibonacci.json
(hash rows + algebra FMA rows -> VerifierAir trace, NUM_COLS wide), proves it
with the TpuProver, and checks the bundle with the device verifier.
`--small` runs a reduced fib(8)/2-query workload first (quick smoke).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky25_tpu.attest import attest, check_attestation
from plonky25_tpu.models.verifier_air import NUM_COLS
from plonky25_tpu.models.fibonacci import FibonacciAir, fibonacci_trace
from plonky25_tpu.proof import FriConfig, load_proof

ARTIFACT = "/root/reference/artifacts/proof_fibonacci.json"


def run(proof, fc, att_fc, label):
    t0 = time.time()
    bundle = attest(proof, FibonacciAir(), fc, att_fri_config=att_fc)
    t_att = time.time() - t0
    print(f"{label}: attest {t_att:.1f}s "
          f"(stark 2^{bundle.stark.degree_bits} x {NUM_COLS}, "
          f"{bundle.n_rows} active rows)", flush=True)
    t0 = time.time()
    ok = check_attestation(bundle, proof, FibonacciAir(), fc)
    print(f"{label}: check {time.time() - t0:.1f}s -> {ok}", flush=True)
    assert ok
    # warm re-attest (modules cached)
    t0 = time.time()
    bundle = attest(proof, FibonacciAir(), fc, att_fri_config=att_fc)
    print(f"{label}: re-attest (warm) {time.time() - t0:.1f}s", flush=True)


def run_many(n: int):
    """Aggregate n golden-size verifications into ONE attestation STARK."""
    from plonky25_tpu.attest import attest_many, check_attestations

    proof = load_proof(ARTIFACT)
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    att_fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    proofs = [proof] * n
    t0 = time.time()
    bundle = attest_many(proofs, FibonacciAir(), fc, att_fri_config=att_fc)
    t_att = time.time() - t0
    print(f"many({n}): attest {t_att:.1f}s "
          f"(stark 2^{bundle.stark.degree_bits} x {NUM_COLS}, "
          f"{bundle.n_rows} rows, {n / t_att:.2f} verifications "
          "attested/s)", flush=True)
    t0 = time.time()
    ok = check_attestations(bundle, proofs, FibonacciAir(), fc)
    print(f"many({n}): check {time.time() - t0:.1f}s -> {ok}", flush=True)
    assert ok
    t0 = time.time()
    bundle = attest_many(proofs, FibonacciAir(), fc, att_fri_config=att_fc)
    t_att = time.time() - t0
    print(f"many({n}): re-attest (warm) {t_att:.1f}s = "
          f"{n / t_att:.2f} verifications attested/s", flush=True)


def main():
    if "--many" in sys.argv:
        i = sys.argv.index("--many")
        run_many(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 4)
        return
    if "--small" in sys.argv:
        from plonky25_tpu.refimpl.prover import prove

        fc = FriConfig(log_blowup=1, num_queries=2, proof_of_work_bits=1)
        proof = prove(FibonacciAir(), fibonacci_trace(8), fc)
        run(proof, fc, FriConfig(log_blowup=1, num_queries=10,
                                 proof_of_work_bits=4), "small")
        return
    proof = load_proof(ARTIFACT)
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    att_fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    run(proof, fc, att_fc, "golden")


if __name__ == "__main__":
    main()
