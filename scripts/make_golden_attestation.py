"""Generate the golden attestation artifact: attest the golden fib(64)
proof on the TPU and persist the bundle (artifacts/attestation_fibonacci
.json).  Run on real TPU (no env overrides); tests load the committed
artifact and re-check it cold (tests/test_attest_serialization.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky25_tpu import FriConfig, load_proof  # noqa: E402
from plonky25_tpu.attest import attest, check_attestation, save_bundle  # noqa: E402
from plonky25_tpu.models import FibonacciAir  # noqa: E402

GOLDEN = "/root/reference/artifacts/proof_fibonacci.json"
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "attestation_fibonacci.json")


def main():
    proof = load_proof(GOLDEN)
    fc = FriConfig(log_blowup=1, num_queries=100, proof_of_work_bits=16)
    t0 = time.time()
    bundle = attest(proof, FibonacciAir(), fc)
    print(f"attest: {time.time() - t0:.1f}s")
    t0 = time.time()
    assert check_attestation(bundle, proof, FibonacciAir(), fc)
    print(f"check: {time.time() - t0:.1f}s")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    save_bundle(bundle, OUT)
    print(f"saved {OUT}")


if __name__ == "__main__":
    main()
